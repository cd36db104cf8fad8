#!/usr/bin/env python
"""Export one of our runs as a reference-format torch checkpoint (model.pt).

Interop in the reverse direction of tools/convert_sphere_init.py: a user can
take a model trained here and render/inspect it with the REFERENCE repo's
tooling (`python scripts/test.py -p <exp_dir>` there) — their
``inference_setup`` (src/utils/test.py:88-126) needs ``cfg.json`` plus a
``checkpoints/model.pt`` containing ``generator`` / ``it`` / ``epoch`` /
``ema@{beta}`` entries, loaded with strict=False.

Key/layout conventions reproduced (all cited into /root/reference):
  * module attribute names:  src/models/generator.py:34-47 (it buffer,
    camera.*, light.param_*, {sdf,color,deviation}_network)
  * LinearLayer/FiLMSiren/MappingLinear store ``weight`` as (out, in)
    (src/third_party/stylesdf/volume_renderer.py:12-61, model.py:32-41);
    ours are (in, out) — transposed on export.
  * Conv2d weights are OIHW (torch default); ours are HWIO — transposed.
  * discriminators: blocks.{i}.weight / conv_out.weight (+bias if
    last_bias), src/models/discriminator.py:49-72; ADA buffers aug.p /
    aug.Hz_geom / aug.Hz_fbank (src/third_party/ada/augment.py:126,167,179).
  * EMA entries are {'state_dict': ..., 'beta': beta}
    (src/utils/ema.py:33-37), named ``ema@{beta}``.

Optimizer/scheduler states ARE translated when the run's cfg.json carries a
``training`` section: optax Adam/RMSprop moments become torch
``opt_{player}`` state_dicts (moments keyed by the reference's
module.parameters() index order, layouts transformed with their weights)
plus StepLR ``sch_{player}`` dicts — the full set the reference's strict
resume path (src/utils/checkpoint.py:109-134) expects.

Usage: python tools/export_torch_checkpoint.py -p logs/<run> [-o out.pt]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _t(x):
    import torch

    return torch.tensor(np.ascontiguousarray(np.asarray(x)))


def _linear(dst, prefix, node):
    dst[f"{prefix}.weight"] = _t(np.asarray(node["w"]).T)
    if "b" in node:
        dst[f"{prefix}.bias"] = _t(node["b"])


def _film(dst, prefix, node):
    _linear(dst, prefix, node)
    _linear(dst, f"{prefix}.gamma", node["gamma"])
    _linear(dst, f"{prefix}.beta", node["beta"])


def _conv(dst, prefix, node):
    # ours HWIO -> torch OIHW
    dst[f"{prefix}.weight"] = _t(np.asarray(node["w"]).transpose(3, 2, 0, 1))
    if "b" in node:
        dst[f"{prefix}.bias"] = _t(node["b"])


def generator_state_dict(gen_params, camera, it):
    """Reference Generator.state_dict() layout from our generator param tree
    plus the (recomputed, deterministic) camera buffers and the it buffer."""
    import torch

    sd = {}
    sd["it"] = torch.tensor(int(it), dtype=torch.long)
    for k in ("intrinsics", "intrinsics_inv", "c2w", "w2c"):
        sd[f"camera.{k}"] = _t(getattr(camera, k))
    for k, v in gen_params["light"].items():
        sd[f"light.{k}"] = _t(v)
    sdf = gen_params["sdf_network"]
    for i, layer in enumerate(sdf["style"]):
        _linear(sd, f"sdf_network.style.{i}", layer)
    for i, layer in enumerate(sdf["pts_linears"]):
        _film(sd, f"sdf_network.pts_linears.{i}", layer)
    _linear(sd, "sdf_network.sigma_linear", sdf["sigma_linear"])
    col = gen_params["color_network"]
    _film(sd, "color_network.views_linears", col["views_linears"])
    _linear(sd, "color_network.rgb_linear", col["rgb_linear"])
    sd["deviation_network.variance"] = _t(gen_params["deviation_network"]["variance"])
    known = {"light", "sdf_network", "color_network", "deviation_network"}
    extra = sorted(set(gen_params) - known)
    if extra:
        # e.g. a background NeRF (n_outside>0): no reference key convention
        # exists (their Generator always passes nerf=None) — skipped.
        print(f"warning: generator children without a reference mapping, "
              f"not exported: {extra}")
    return sd


def discriminator_state_dict(d_params, aug_pipe, aug_p):
    sd = {}
    for i, blk in enumerate(d_params["blocks"]):
        _conv(sd, f"blocks.{i}", blk)
    _conv(sd, "conv_out", d_params["conv_out"])
    sd["aug.p"] = _t(np.float32(aug_p))
    sd["aug.Hz_geom"] = _t(aug_pipe.Hz_geom)
    sd["aug.Hz_fbank"] = _t(aug_pipe.Hz_fbank)
    return sd


# ---------------------------------------------------------------------------
# Optimizer-state translation. torch optimizer state_dicts key moments by the
# INDEX of each parameter in module.parameters() order — i.e. nn.Module
# attribute-registration order, depth-first. The tables below reproduce the
# reference's registration order exactly:
#   Generator: light (lighting.py:17-21) -> color_network (generator.py:45;
#   FiLMSiren registers weight, bias, gamma, beta - volume_renderer.py:39-48)
#   -> sdf_network (:46; style 0-2, pts_linears 0-(D-1), sigma_linear -
#   fields.py:21-23) -> deviation_network (:47).
#   DCDiscriminator: blocks 0..n-1, conv_out (discriminator.py:63-72).
# Each entry carries the layout transform its moments share with the weight.
# ---------------------------------------------------------------------------

_ID = lambda a: a  # noqa: E731
_LIN = lambda a: np.asarray(a).T  # noqa: E731 - (in,out) -> (out,in)
_CONV = lambda a: np.asarray(a).transpose(3, 2, 0, 1)  # noqa: E731 - HWIO -> OIHW


def _film_entries(prefix, node):
    return [
        (f"{prefix}.weight", node["w"], _LIN),
        (f"{prefix}.bias", node["b"], _ID),
        (f"{prefix}.gamma.weight", node["gamma"]["w"], _LIN),
        (f"{prefix}.gamma.bias", node["gamma"]["b"], _ID),
        (f"{prefix}.beta.weight", node["beta"]["w"], _LIN),
        (f"{prefix}.beta.bias", node["beta"]["b"], _ID),
    ]


def _lin_entries(prefix, node):
    out = [(f"{prefix}.weight", node["w"], _LIN)]
    if "b" in node:
        out.append((f"{prefix}.bias", node["b"], _ID))
    return out


def reference_param_entries(player: str, params):
    """[(torch_key, our_leaf, torch_layout_fn)] in the reference's
    module.parameters() order for this player's param tree."""
    e = []
    if player == "generator":
        for k in ("param_ambient", "param_direction", "param_shininess", "param_specular"):
            e.append((f"light.{k}", params["light"][k], _ID))
        col = params["color_network"]
        e += _film_entries("color_network.views_linears", col["views_linears"])
        e += _lin_entries("color_network.rgb_linear", col["rgb_linear"])
        sdf = params["sdf_network"]
        for i, layer in enumerate(sdf["style"]):
            e += _lin_entries(f"sdf_network.style.{i}", layer)
        for i, layer in enumerate(sdf["pts_linears"]):
            e += _film_entries(f"sdf_network.pts_linears.{i}", layer)
        e += _lin_entries("sdf_network.sigma_linear", sdf["sigma_linear"])
        e.append(("deviation_network.variance", params["deviation_network"]["variance"], _ID))
    else:
        for i, blk in enumerate(params["blocks"]):
            e.append((f"blocks.{i}.weight", blk["w"], _CONV))
        e += [(f"conv_out.{n}", params["conv_out"][k], t)
              for n, k, t in (("weight", "w", _CONV), ("bias", "b", _ID))
              if k in params["conv_out"]]
    return e


def _moment_tree(moment, params):
    """A moment tree shaped like ``params``. Flat-optim checkpoints store one
    raveled vector per moment; unravel it along jax.tree.leaves order (the
    ravel_pytree order used at save time)."""
    if not isinstance(moment, np.ndarray):
        return moment
    import jax

    leaves, treedef = jax.tree.flatten(params)
    parts, off = [], 0
    for l in leaves:
        n = int(np.asarray(l).size)
        parts.append(np.asarray(moment[off:off + n]).reshape(np.asarray(l).shape))
        off += n
    assert off == moment.size, (off, moment.size)
    return jax.tree.unflatten(treedef, parts)


def export_optimizer(player, opt_state, params, opt_cfg):
    """Our optax chain state -> a torch.optim state_dict.

    Chain layout (trainers/optim.py): [inner, scale_by_learning_rate(sched)]
    with inner = [count, mu, nu] (Adam) / [nu] (RMSprop) / [trace] or []
    (SGD). Moments inherit their parameter's torch layout transform."""
    import jax
    import torch

    kind = opt_cfg["__target__"].rsplit(".", 1)[-1]
    kw = dict(opt_cfg.get("kwargs", {}))
    # chain layouts vary by optimizer (trainers/optim.py): Adam/RMSprop are
    # [inner, lr]; SGD is [weight_decay?][trace?][lr] — so the lr/schedule
    # state is always LAST, and SGD's momentum trace is second-to-last.
    # scale_by_learning_rate keeps a count only when driven by a schedule;
    # with a float lr its state is empty (torch RMSprop's step is cosmetic —
    # no bias correction — so 0 is safe there; Adam's count lives in inner)
    inner = opt_state[0]
    sched_count = (int(np.asarray(opt_state[-1][0]).reshape(-1)[0])
                   if len(opt_state[-1]) else 0)
    entries = reference_param_entries(player, params)

    def moment_leaves(tree):
        t = _moment_tree(tree, params)
        ents = reference_param_entries(player, t)
        return [fn(leaf) for _, leaf, fn in ents]

    state = {}
    groups = {"params": list(range(len(entries))), "lr": kw.get("lr", 1e-3),
              "maximize": False, "differentiable": False, "foreach": None}
    if kind == "Adam":
        count = float(np.asarray(inner[0]).reshape(-1)[0])
        mus, nus = moment_leaves(inner[1]), moment_leaves(inner[2])
        for i, (m, n) in enumerate(zip(mus, nus)):
            state[i] = {"step": torch.tensor(count), "exp_avg": _t(m),
                        "exp_avg_sq": _t(n)}
        groups.update(betas=tuple(kw.get("betas", (0.9, 0.999))),
                      eps=kw.get("eps", 1e-8),
                      weight_decay=kw.get("weight_decay", 0.0),
                      amsgrad=False, capturable=False, fused=None,
                      decoupled_weight_decay=False)
    elif kind == "RMSprop":
        nus = moment_leaves(inner[0])
        for i, n in enumerate(nus):
            state[i] = {"step": torch.tensor(float(sched_count)),
                        "square_avg": _t(n)}
        groups.update(alpha=kw.get("alpha", 0.99), eps=kw.get("eps", 1e-8),
                      weight_decay=kw.get("weight_decay", 0.0),
                      momentum=0.0, centered=False, capturable=False)
    elif kind == "SGD":
        momentum = kw.get("momentum", 0.0)
        if momentum:
            # trace state is the element before the lr state; TraceState
            # serializes as a 1-element list [trace_tree]
            bufs = moment_leaves(opt_state[-2][0])
            for i, b in enumerate(bufs):
                state[i] = {"momentum_buffer": _t(b)}
        groups.update(momentum=momentum, dampening=0.0,
                      weight_decay=kw.get("weight_decay", 0.0),
                      nesterov=False, fused=None)
    else:
        raise ValueError(f"no torch translation for optimizer {kind}")
    return {"state": state, "param_groups": [groups]}


def export_scheduler(sch_cfg, opt_cfg, count):
    kw = dict((sch_cfg or {}).get("kwargs", {}))
    return {"step_size": kw.get("step_size", 10**9), "gamma": kw.get("gamma", 1.0),
            "base_lrs": [opt_cfg.get("kwargs", {}).get("lr", 1e-3)],
            "last_epoch": count, "_step_count": count + 1,
            "_get_lr_called_within_step": False,
            "_last_lr": [opt_cfg.get("kwargs", {}).get("lr", 1e-3)]}


def export(run_dir: str, out_path=None):
    import torch

    import object_intrinsics_tpu  # noqa: F401 - registry
    from object_intrinsics_tpu.utils.checkpoint import CheckpointIO, resolve_checkpoint
    from object_intrinsics_tpu.utils.config import build_from_config

    with open(os.path.join(run_dir, "cfg.json")) as f:
        cfg = json.load(f)
    ckpt_path = resolve_checkpoint(os.path.join(run_dir, "checkpoints", "model"))
    state, meta = CheckpointIO(None).load(ckpt_path)
    meta = meta or {}
    it = int(meta.get("it", np.asarray(state["it"]).item()))
    epoch = int(meta.get("epoch", -1))

    camera = build_from_config(cfg["model"]["generator"]["kwargs"]["camera"])

    out = {
        "generator": generator_state_dict(state["params"]["generator"], camera, it),
        "it": it,
        "epoch": epoch,
        "loss": 0.0,
    }
    for name in ("discriminator", "mask_discriminator"):
        dcfg = cfg["model"][name]["kwargs"]
        aug_pipe = build_from_config(dcfg["aug"])
        out[name] = discriminator_state_dict(
            state["params"][name], aug_pipe, dcfg.get("aug_p", 1.0)
        )
    for ema_name, ema_params in state.get("ema", {}).items():
        beta = float(ema_name.split("@")[1])
        out[ema_name] = {
            "state_dict": generator_state_dict(ema_params, camera, it),
            "beta": beta,
        }

    training = cfg.get("training", {})
    if "opt" in state and training:
        for player in ("generator", "discriminator", "mask_discriminator"):
            opt_cfg = training.get(f"opt_{player}")
            if opt_cfg is None:
                continue
            out[f"opt_{player}"] = export_optimizer(
                player, state["opt"][player], state["params"][player], opt_cfg
            )
            sched_state = state["opt"][player][1]
            count = (int(np.asarray(sched_state[0]).reshape(-1)[0])
                     if len(sched_state) else it)
            out[f"sch_{player}"] = export_scheduler(
                training.get(f"sch_{player}"), opt_cfg, count
            )
    else:
        print("note: optimizer states not exported "
              f"(opt in state: {'opt' in state}, cfg has training: {bool(training)})")

    if out_path is None:
        out_path = os.path.join(run_dir, "checkpoints", "model.pt")
    tmp = out_path + ".tmp"
    torch.save(out, tmp)
    os.replace(tmp, out_path)
    import torch as _torch

    def _count_tensors(obj):
        if isinstance(obj, _torch.Tensor):
            return 1
        if isinstance(obj, dict):
            return sum(_count_tensors(v) for v in obj.values())
        return 0

    n = _count_tensors(out)
    print(f"wrote {out_path} (it={it}, {n} tensors)")
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", required=True, help="run dir with cfg.json + checkpoints/")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    export(args.path, args.out)


if __name__ == "__main__":
    main()
