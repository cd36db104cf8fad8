#!/usr/bin/env python
"""Matched-pose silhouette comparison on the synthetic dataset.

The synthetic crops' ground-truth poses are reproducible (Plane prior at a
known seed, translation zeroed — tools/make_synthetic_dataset.py), so unlike
the real datasets we can render the trained generator AT the data poses and
score silhouette IoU crop-by-crop. The learned canonical frame is free up to
a global yaw (the prior's 360-degree axis), so the score is maximized over a
yaw sweep: coarse sweep on a few probe poses, then all crops at the best
candidates.

Outputs docs/results/synth_pose_compare.{json,png} (JSON metrics + a
GT-vs-render grid).

Usage:
    python tools/synth_pose_compare.py -p logs/<synth run> [--ema 0.99]
        [-d data/synth_box] [-n 28] [--seed 0]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def yaw_rot4(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = [[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", required=True)
    ap.add_argument("-d", "--data", default="data/synth_box")
    ap.add_argument("-n", "--num", type=int, default=28,
                    help="must match the fixture's -n")
    ap.add_argument("--seed", type=int, default=0, help="fixture --seed")
    ap.add_argument("--ema", type=float, default=None)
    ap.add_argument("--bs", type=int, default=7, help="render batch size")
    ap.add_argument("--coarse", type=int, default=72, help="coarse yaw steps")
    ap.add_argument("--probes", type=int, default=4, help="poses in the coarse sweep")
    ap.add_argument("--z-seed", type=int, default=None,
                    help="render at z~N(0,1) from this seed instead of z=0 "
                         "(z=0 can drift off the prior's typical set late in "
                         "training — compare eval_synth_recovery per-latent)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import object_intrinsics_tpu  # noqa: F401
    from object_intrinsics_tpu.utils.platform import honor_jax_platforms

    honor_jax_platforms()
    from object_intrinsics_tpu.data.dataset import Dataset
    from object_intrinsics_tpu.utils.test import inference_setup

    cfg, model, info = inference_setup(args.path, ema=args.ema)
    if model is None:
        raise SystemExit(f"no usable checkpoint under {args.path}")
    gen, params = model["generator"], model["params"]
    res = cfg["data"]["kwargs"]["resolution"]

    ds = Dataset(resolution=res, dataset_folder=args.data)
    gt_mask = ds.alpha[..., 0]  # (n, h, w)
    gt_rgb = ds.rgb

    # GT poses: same draw as tools/make_synthetic_dataset.py
    from object_intrinsics_tpu.utils.config import build_from_config

    prior = build_from_config(cfg["model"]["generator"]["kwargs"]["pose_prior"])
    b2ws = np.array(prior(jax.random.PRNGKey(args.seed), args.num))
    b2ws[:, :3, 3] = 0.0

    z_dim = cfg["model"]["generator"]["kwargs"]["z_dim"]
    if args.z_seed is None:
        z_row = np.zeros((1, z_dim), np.float32)
    else:
        z_row = np.asarray(jax.random.normal(jax.random.PRNGKey(args.z_seed),
                                             (1, z_dim)), np.float32)

    bs = args.bs
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def render_masks(b2w):
        data = {
            "b2w": b2w,
            "z": jnp.asarray(np.repeat(z_row, bs, axis=0)),
            "bg_color": jnp.ones((bs, 3), jnp.float32),
        }
        out = gen.forward(params, jax.random.PRNGKey(0), bs=bs, it=info["it"],
                          data=data, train=False)
        ro = out["box"]["render_out"]
        return ro["mask"][..., 0], ro["image"]

    def masks_at(poses):
        """poses (m,4,4) -> masks (m,h,w), images (m,h,w,3); pads to bs."""
        m = poses.shape[0]
        pad = (-m) % bs
        if pad:
            poses = np.concatenate([poses, np.tile(np.eye(4, dtype=np.float32),
                                                   (pad, 1, 1))])
        masks, imgs = [], []
        for i in range(0, poses.shape[0], bs):
            mk, im = render_masks(jnp.asarray(poses[i:i + bs], jnp.float32))
            masks.append(np.asarray(mk))
            imgs.append(np.asarray(im))
        return np.concatenate(masks)[:m], np.concatenate(imgs)[:m]

    def iou(a, b):
        inter = np.logical_and(a > 0.5, b > 0.5).sum((-2, -1))
        union = np.logical_or(a > 0.5, b > 0.5).sum((-2, -1))
        return inter / np.maximum(union, 1)

    # coarse sweep: probe poses x yaw grid
    probe_ids = np.linspace(0, args.num - 1, args.probes).astype(int)
    thetas = np.linspace(0, 2 * np.pi, args.coarse, endpoint=False)
    coarse_scores = []
    for th in thetas:
        poses = np.stack([b2ws[i] @ yaw_rot4(th) for i in probe_ids])
        mk, _ = masks_at(poses)
        coarse_scores.append(iou(mk, gt_mask[probe_ids]).mean())
    coarse_scores = np.asarray(coarse_scores)
    order = np.argsort(coarse_scores)[::-1]

    # refine the top-2 coarse candidates +/- one half-step over all crops
    step = thetas[1] - thetas[0]
    cands = []
    for j in order[:2]:
        cands += [thetas[j] - step / 2, thetas[j], thetas[j] + step / 2]
    best = {"mean_iou": -1.0}
    for th in cands:
        poses = np.stack([b2w @ yaw_rot4(th) for b2w in b2ws])
        mk, imgs = masks_at(poses)
        ious = iou(mk, gt_mask)
        if ious.mean() > best["mean_iou"]:
            masked_l1 = float(np.abs((imgs - gt_rgb) * (gt_mask[..., None] > 0.5)).sum()
                              / np.maximum((gt_mask > 0.5).sum() * 3, 1))
            best = {
                "mean_iou": float(ious.mean()),
                "median_iou": float(np.median(ious)),
                "min_iou": float(ious.min()),
                "yaw_deg": float(np.degrees(th) % 360),
                "masked_rgb_l1": masked_l1,
                "per_crop_iou": [float(x) for x in ious],
                "_imgs": imgs, "_masks": mk,
            }

    imgs, mk = best.pop("_imgs"), best.pop("_masks")
    summary = {
        "run": os.path.abspath(args.path), "it": info["it"], "ema": args.ema,
        "z_seed": args.z_seed,
        "num_crops": args.num, "resolution": int(res),
        "coarse_best": float(coarse_scores.max()),
        **best,
    }
    outdir = os.path.join(os.path.dirname(__file__), "..", "docs", "results")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "synth_pose_compare.json"), "w") as f:
        json.dump(summary, f, indent=2)

    # side-by-side grid: rows = (GT over white, render), first 8 crops
    from PIL import Image

    k = min(8, args.num)
    gt_vis = gt_rgb[:k] * ds.alpha[:k] + (1 - ds.alpha[:k])
    row_gt = np.concatenate(list(gt_vis), axis=1)
    row_rd = np.concatenate(list(np.clip(imgs[:k], 0, 1)), axis=1)
    grid = np.concatenate([row_gt, row_rd], axis=0)
    Image.fromarray((grid * 255).astype(np.uint8)).save(
        os.path.join(outdir, "synth_pose_compare.png"))

    print(json.dumps({k: v for k, v in summary.items() if k != "per_crop_iou"},
                     indent=2))


if __name__ == "__main__":
    main()
