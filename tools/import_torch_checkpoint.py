#!/usr/bin/env python
"""Import a reference-repo run (torch model.pt) into this framework.

Forward interop for switching users: point this at a reference experiment
directory (`cfg.json` + `checkpoints/model.pt`, the layout the reference's
CheckpointIO writes — src/utils/checkpoint.py:36-48 there) and it produces a
run directory OURS can consume: the cfg.json is copied verbatim (our
`__target__` registry resolves the reference's `src.*` dotted paths,
utils/config.py) and the checkpoint becomes a flat-npz pytree with our
layouts. After that:

    python scripts/test.py -p <out_dir> [-ema 0.99] [-depth 16]

renders the reference-trained model through our renderer.

Layout/key conventions inverted here mirror tools/export_torch_checkpoint.py
(the reverse tool): torch (out,in) linears -> our (in,out); OIHW convs ->
HWIO; `ema@{beta}` blobs -> our ema trees; the `it` buffer -> our it scalar.
Camera intrinsics and ADA filter buffers are NOT copied — both are
deterministic functions of the config and are rebuilt at load.

Optimizer moments ARE translated when the .pt carries ``opt_{player}``
entries (torch Adam exp_avg/exp_avg_sq -> optax mu/nu, RMSprop square_avg
-> nu, moments de-indexed from the reference's module.parameters() order and
re-laid-out with their weights); a checkpoint without them resumes with
freshly initialized optimizers (logged by the trainer).

Usage: python tools/import_torch_checkpoint.py -p <reference_exp_dir> -o <out_dir>
"""
import argparse
import json
import os
import re
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _np(t):
    return np.ascontiguousarray(t.detach().cpu().numpy().astype(np.float32))


def _linear(sd, prefix):
    out = {"w": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _film(sd, prefix):
    out = _linear(sd, prefix)
    out["gamma"] = _linear(sd, f"{prefix}.gamma")
    out["beta"] = _linear(sd, f"{prefix}.beta")
    return out


def _conv(sd, prefix):
    out = {"w": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}  # OIHW -> HWIO
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _indices(sd, pattern):
    idx = {int(m.group(1)) for k in sd if (m := re.match(pattern, k))}
    assert idx == set(range(len(idx))), f"non-contiguous indices for {pattern}: {idx}"
    return len(idx)


def import_generator(sd):
    g = {
        "light": {k.split(".", 1)[1]: _np(v) for k, v in sd.items()
                  if k.startswith("light.")},
        "sdf_network": {
            "style": [_linear(sd, f"sdf_network.style.{i}")
                      for i in range(_indices(sd, r"sdf_network\.style\.(\d+)\.weight$"))],
            "pts_linears": [_film(sd, f"sdf_network.pts_linears.{i}")
                            for i in range(_indices(sd, r"sdf_network\.pts_linears\.(\d+)\.weight$"))],
            "sigma_linear": _linear(sd, "sdf_network.sigma_linear"),
        },
        "color_network": {
            "views_linears": _film(sd, "color_network.views_linears"),
            "rgb_linear": _linear(sd, "color_network.rgb_linear"),
        },
        "deviation_network": {"variance": _np(sd["deviation_network.variance"])},
    }
    return g


def import_discriminator(sd):
    n = _indices(sd, r"blocks\.(\d+)\.weight$")
    return {"blocks": [_conv(sd, f"blocks.{i}") for i in range(n)],
            "conv_out": _conv(sd, "conv_out")}


def _inverse_entries(player, params):
    """reference_param_entries with the INVERSE layout transforms: a list of
    (set_leaf_fn, torch->ours transform) aligned with torch's param index."""
    from tools.export_torch_checkpoint import reference_param_entries, _LIN, _CONV, _ID

    inv = {_LIN: lambda a: np.ascontiguousarray(np.asarray(a).T),
           _CONV: lambda a: np.ascontiguousarray(np.asarray(a).transpose(2, 3, 1, 0)),
           _ID: np.asarray}
    return [(leaf, inv[fn]) for _, leaf, fn in reference_param_entries(player, params)]


def _moments_to_tree(player, params, torch_state, field):
    """Collect torch per-param moment ``field`` into a params-shaped tree."""
    import jax

    # build an index: which leaf object each torch param index maps to
    entries = _inverse_entries(player, params)
    assert set(torch_state.keys()) == set(range(len(entries))), (
        f"torch state indices {sorted(torch_state)} vs {len(entries)} params")
    by_id = {id(leaf): inv(torch_state[i][field].cpu().numpy())
             for i, (leaf, inv) in enumerate(entries)}
    return jax.tree.map(lambda l: by_id[id(l)], params)


def import_optimizer(player, torch_sd, params, has_schedule=True,
                     sched_count_hint=None):
    """torch.optim state_dict -> our optax chain state (per-leaf layout,
    plain lists — exactly what load_pytree yields for a native checkpoint;
    the trainer's restore_like/coerce_leaf_stream maps it onto its
    template, flat or per-leaf).

    ``has_schedule``: whether the target optimizer is driven by an LR
    schedule (cfg has sch_{player}) — scale_by_learning_rate then carries a
    count leaf; with a plain float lr its state is empty.
    ``sched_count_hint``: the schedule position (the torch StepLR's
    last_epoch, i.e. updates taken) — preferred over the per-param 'step'
    entries because SGD state has no step at all."""
    state = {int(k): v for k, v in torch_sd["state"].items()}
    if not state:
        return None
    sample = next(iter(state.values()))
    sched = int(sched_count_hint) if sched_count_hint is not None else int(
        float(sample.get("step", 0)))
    if "exp_avg" in sample:  # Adam
        count = np.asarray(int(float(sample["step"])), dtype=np.int32)
        mu = _moments_to_tree(player, params, state, "exp_avg")
        nu = _moments_to_tree(player, params, state, "exp_avg_sq")
        inner = [count, mu, nu]
    elif "square_avg" in sample:  # RMSprop
        nu = _moments_to_tree(player, params, state, "square_avg")
        inner = [nu]
    elif "momentum_buffer" in sample:  # SGD
        buf = _moments_to_tree(player, params, state, "momentum_buffer")
        inner = [buf]
    else:
        return None
    return [inner, [np.asarray(sched, dtype=np.int32)] if has_schedule else []]


def import_checkpoint(pt_path, out_dir, cfg_path=None):
    import torch

    import object_intrinsics_tpu  # noqa: F401 - registry
    from object_intrinsics_tpu.utils.checkpoint import save_pytree

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    it = int(ckpt["it"])
    epoch = int(ckpt.get("epoch", -1))

    state = {
        "params": {"generator": import_generator(ckpt["generator"])},
        "ema": {},
        "it": np.asarray(it, dtype=np.int32),
    }
    for name in ("discriminator", "mask_discriminator"):
        if name in ckpt:
            state["params"][name] = import_discriminator(ckpt[name])
    training = {}
    if cfg_path and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            training = json.load(f).get("training", {})
    opt = {}
    for player in state["params"]:
        if f"opt_{player}" in ckpt:
            # scheduler presence decides whether the optax lr state carries a
            # count leaf: the cfg is authoritative when we have it; a bare
            # .pt is judged by its own sch_{player} entry (the reference —
            # and our exporter — always write one per optimizer)
            if training:
                has_schedule = training.get(f"sch_{player}") is not None
            else:
                has_schedule = f"sch_{player}" in ckpt
            sch = ckpt.get(f"sch_{player}", {})
            translated = import_optimizer(
                player, ckpt[f"opt_{player}"], state["params"][player],
                has_schedule=has_schedule,
                sched_count_hint=sch.get("last_epoch"),
            )
            if translated is not None:
                opt[player] = translated
    if set(opt) == set(state["params"]):
        state["opt"] = opt
    elif opt:
        print(f"note: partial optimizer states ({sorted(opt)}) — dropping "
              "all; the trainer will reinitialize optimizers")

    for k, v in ckpt.items():
        if k.startswith("ema@"):
            state["ema"][k] = import_generator(v["state_dict"])
    if not state["ema"]:
        # checkpoint without EMA blobs: start EMAs at the current params
        # (the trainer's state template always carries both betas)
        print("note: no ema@{beta} entries in the checkpoint; EMAs start at "
              "the imported params")
        for beta in ("0.99", "0.9"):
            state["ema"][f"ema@{beta}"] = import_generator(ckpt["generator"])

    os.makedirs(os.path.join(out_dir, "checkpoints"), exist_ok=True)
    if cfg_path and os.path.exists(cfg_path):
        shutil.copy(cfg_path, os.path.join(out_dir, "cfg.json"))
    out_path = os.path.join(out_dir, "checkpoints", "model.npz")
    save_pytree(out_path, state,
                meta={"it": it, "epoch": epoch,
                      "imported_from": os.path.abspath(pt_path)})
    import jax

    n = sum(int(np.asarray(x).size) for x in jax.tree.leaves(state))
    print(f"wrote {out_path} (it={it}, {n} scalars)")
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", required=True,
                    help="reference exp dir (cfg.json + checkpoints/model.pt) or a .pt file")
    ap.add_argument("-o", "--out", required=True, help="output run dir")
    args = ap.parse_args()
    if os.path.isdir(args.path):
        pt = os.path.join(args.path, "checkpoints", "model.pt")
        cfg = os.path.join(args.path, "cfg.json")
    else:
        pt, cfg = args.path, None
    import_checkpoint(pt, args.out, cfg)


if __name__ == "__main__":
    main()
