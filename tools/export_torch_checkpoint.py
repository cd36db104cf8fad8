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

NOT exported: optimizer/scheduler states (optax -> torch.optim state-dict
translation is out of scope). The reference's inference path never reads
them; resuming TRAINING over there from this file would hit its strict
module check — export is for rendering/inspection interop.

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

    if out_path is None:
        out_path = os.path.join(run_dir, "checkpoints", "model.pt")
    tmp = out_path + ".tmp"
    torch.save(out, tmp)
    os.replace(tmp, out_path)
    n = sum(len(v) for v in out.values() if isinstance(v, dict))
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
