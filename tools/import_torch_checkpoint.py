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

Optimizer moments are NOT translated (torch.optim -> optax state is out of
scope): the output checkpoint is complete for inference; resuming TRAINING
from it restarts the optimizers fresh (the trainer's cross-layout coercion
tolerates the missing `opt` entry by reinitializing).

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
    n = sum(x.size for x in _leaves(state))
    print(f"wrote {out_path} (it={it}, {n} scalars)")
    return out_path


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, list):
        for v in tree:
            yield from _leaves(v)
    else:
        yield np.asarray(tree)


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
