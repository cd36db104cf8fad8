#!/usr/bin/env python
"""Quantify shape recovery on the synthetic rounded-box dataset.

The synthetic fixture (tools/make_synthetic_dataset.py) is the one dataset
whose ground-truth geometry is known in closed form, so GAN fidelity can be
scored against the actual asset instead of eyeballed: evaluate the learned
SDF's occupancy on a grid and compare it to the analytic rounded-box
occupancy.

Two ambiguities are inherent to the training objective, not defects, and the
score searches over them:
- the Plane pose prior spins 360 deg about the scene up-axis (y), so the
  learned canonical frame is defined only up to a global yaw;
- the latent z models instance variation; with a single-shape dataset any
  z should decode to (near) the same shape, so we score z=0 and a few prior
  draws and report all of them.

Metrics (at the best yaw per latent):
- occupancy IoU between {learned sdf < 0} and {gt sdf < 0} on an N^3 grid
  over [-1,1]^3;
- mean / p90 |gt_sdf| over learned surface voxels — a one-sided chamfer in
  true scene units (the analytic SDF is a metric distance, the learned NeuS
  SDF is not, so only this direction is metrically meaningful).

Writes docs/results/synth_recovery.json next to the repo by default.

Usage:
    python tools/eval_synth_recovery.py -p logs/<synth run> [--ema 0.99]
        [--grid 96] [--yaw-steps 120] [--latents 4] [-o out.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# Ground-truth constants: keep identical to tools/make_synthetic_dataset.box_fns.
GT_HALF = np.asarray([0.45, 0.3, 0.2])
GT_BUMP_C = np.asarray([0.38, 0.26, 0.18])
GT_BUMP_R = 0.16
GT_ROUND_R = 0.05


def gt_sdf_np(pts: np.ndarray) -> np.ndarray:
    """Analytic rounded-box + corner-bump SDF (numpy; exact distance)."""
    q = np.abs(pts) - GT_HALF
    outside = np.sqrt(np.sum(np.maximum(q, 0.0) ** 2, axis=-1))
    box = outside + np.minimum(np.max(q, axis=-1), 0.0) - GT_ROUND_R
    bump = np.linalg.norm(pts - GT_BUMP_C, axis=-1) - GT_BUMP_R
    return np.minimum(box, bump)


def yaw_rot(theta: float, axis: str = "y") -> np.ndarray:
    """Rotation about the pose prior's free (gauge) axis: y for Plane (the
    scene up-axis), z for Hemisphere (its azimuth spins about world z, see
    pose_sampler.Hemisphere / reference src/utils/pose_sampler.py:93-115)."""
    c, s = np.cos(theta), np.sin(theta)
    if axis == "z":
        return np.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return np.asarray([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def surface_voxels(occ: np.ndarray) -> np.ndarray:
    """Boolean mask of voxels on the learned boundary (6-neighbor change)."""
    surf = np.zeros_like(occ, dtype=bool)
    for ax in range(3):
        d = np.diff(occ, axis=ax) != 0
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(0, -1)
        hi[ax] = slice(1, None)
        surf[tuple(lo)] |= d
        surf[tuple(hi)] |= d
    return surf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", required=True, help="synth training run dir")
    ap.add_argument("--ema", type=float, default=None)
    ap.add_argument("--grid", type=int, default=96)
    ap.add_argument("--yaw-steps", type=int, default=120)
    ap.add_argument("--yaw-axis", choices=["y", "z"], default="y",
                    help="gauge axis of the pose prior: y for Plane, z for Hemisphere")
    ap.add_argument("--latents", type=int, default=4,
                    help="prior z draws scored in addition to z=0")
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("-o", "--out", default=None,
                    help="output JSON (default docs/results/synth_recovery.json)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import object_intrinsics_tpu  # noqa: F401
    from object_intrinsics_tpu.utils.platform import honor_jax_platforms

    honor_jax_platforms()
    from object_intrinsics_tpu.models import fields
    from object_intrinsics_tpu.utils.test import inference_setup

    cfg, model, info = inference_setup(args.path, ema=args.ema)
    if model is None:
        raise SystemExit(f"no usable checkpoint under {args.path}")
    params = model["params"]
    sdf_p = params["sdf_network"]

    n = args.grid
    axis = np.linspace(-1.0, 1.0, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    @jax.jit
    def sdf_chunk(p, w):
        return fields.shape_sdf(sdf_p, p[None], w)[0, :, 0]

    def learned_occ(w):
        vals = []
        for i in range(0, pts.shape[0], args.chunk):
            chunk = pts[i:i + args.chunk]
            pad = args.chunk - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
            v = np.asarray(sdf_chunk(jnp.asarray(chunk), w))
            vals.append(v[: args.chunk - pad] if pad else v)
        return (np.concatenate(vals) < 0.0).reshape(n, n, n)

    # GT occupancy at each yaw: occ_gt(theta)[i] = gt_sdf(R(theta) @ pts[i]) < 0
    # (rotating the GT instead of the learned field needs one cheap numpy
    # pass per yaw rather than N^3 MLP evals per yaw).
    thetas = np.linspace(0.0, 2 * np.pi, args.yaw_steps, endpoint=False)

    # z_dim from the first mapping layer's weight (in, out)
    z_dim = int(np.asarray(sdf_p["style"][0]["w"]).shape[0])
    key = jax.random.PRNGKey(0)
    draws = jax.random.normal(key, (args.latents, z_dim))
    zs = [("z=0", np.zeros((1, z_dim), np.float32))] + [
        (f"z~N(0,1)#{i}", np.asarray(draws[i:i + 1])) for i in range(args.latents)
    ]

    voxel = 2.0 / (n - 1)
    results = []
    for name, z in zs:
        w = fields.shape_style(sdf_p, jnp.asarray(z))
        occ = learned_occ(w)
        best = {"iou": -1.0}
        for theta in thetas:
            rp = pts @ yaw_rot(theta, args.yaw_axis).T.astype(np.float32)
            occ_gt = (gt_sdf_np(rp) < 0.0).reshape(n, n, n)
            inter = np.logical_and(occ, occ_gt).sum()
            union = np.logical_or(occ, occ_gt).sum()
            iou = float(inter) / max(float(union), 1.0)
            if iou > best["iou"]:
                best = {"iou": iou, "theta_deg": float(np.degrees(theta))}
        # surface error at best yaw: |gt distance| on learned surface voxels
        rp = pts @ yaw_rot(np.radians(best["theta_deg"]), args.yaw_axis).T.astype(np.float32)
        d_gt = np.abs(gt_sdf_np(rp)).reshape(n, n, n)
        surf = surface_voxels(occ)
        if surf.any():
            dist = d_gt[surf]
            best["surface_err_mean"] = float(dist.mean())
            best["surface_err_p90"] = float(np.percentile(dist, 90))
        best["latent"] = name
        best["occ_frac"] = float(occ.mean())
        results.append(best)
        print(f"{name:>12}: IoU={best['iou']:.4f} @ yaw {best['theta_deg']:.0f} deg, "
              f"surface err mean={best.get('surface_err_mean', float('nan')):.4f} "
              f"p90={best.get('surface_err_p90', float('nan')):.4f} "
              f"(voxel={voxel:.4f})")

    gt_occ_frac = float((gt_sdf_np(pts) < 0).mean())
    summary = {
        "run": os.path.abspath(args.path),
        "it": info["it"],
        "ema": args.ema,
        "grid": n,
        "voxel_size": voxel,
        "yaw_steps": args.yaw_steps,
        "yaw_axis": args.yaw_axis,
        "gt_occ_frac": gt_occ_frac,
        "best_iou": max(r["iou"] for r in results),
        "mean_iou": float(np.mean([r["iou"] for r in results])),
        "per_latent": results,
    }
    out = args.out or os.path.join(os.path.dirname(__file__), "..",
                                   "docs", "results", "synth_recovery.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"best IoU {summary['best_iou']:.4f} / mean {summary['mean_iou']:.4f} "
          f"(gt fill {gt_occ_frac:.4f}) -> {out}")


if __name__ == "__main__":
    main()
