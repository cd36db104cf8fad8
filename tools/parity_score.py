#!/usr/bin/env python
"""Quantitative fidelity metrics for a trained run.

Turns the "matched render fidelity" claim (BASELINE.md north star; the
reference's implied target is its shipped galleries,
/root/reference/README.md:49-58) into numbers regenerable from a checkpoint:

  * silhouette parity — N prior-sampled renders, each silhouette matched
    against the training crops' masks: best-IoU distribution + fill-fraction
    distributions of renders vs crops. A model that learned the object's
    shape distribution produces silhouettes that (at some training-like
    pose) overlap the real ones.
  * renderer equilibrium — weight_sum / weight_max / s_val / eikonal over
    the same renders (the scalars the reference logs as box_stats during
    training, src/trainers/gan_pose_trainer.py:103-152).
  * discriminator equilibrium — mean real/fake logits and their gap on the
    training crops vs fresh fakes (a converged GAN sits near logit parity;
    reference logs the same pair, gan_pose_trainer.py:154-202).

Usage:
    python tools/parity_score.py -p logs/<run> [-n 64] [--ema 0.99] \
        [-o docs/results/parity_metrics.json]

Writes the JSON and prints it. Run on the flagship checkpoint by
tools/make_results.py's RESULTS.md workflow.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import object_intrinsics_tpu  # noqa: F401 (registry)


def _get_dotted(d, path):
    for k in path.split("."):
        d = d[k]
    return d


def check_thresholds(metrics: dict, thresholds: dict):
    """Compare metrics against a {dotted.path: {min/max}} threshold spec.

    Returns a list of violation strings (empty = gate passes). This is the
    regression gate the r4 verdict asked for (weak #1): the thresholds are
    derived from the committed release metrics and live next to the release
    weights, so any code change that breaks the render trips CI
    (tests/test_release_weights.py) instead of silently shifting numbers."""
    violations = []
    for path, spec in thresholds.items():
        if path.startswith("_"):  # comment / provenance keys
            continue
        try:
            v = float(_get_dotted(metrics, path))
        except KeyError:
            violations.append(f"{path}: metric missing")
            continue
        if "min" in spec and v < spec["min"]:
            violations.append(f"{path}: {v:.4f} < min {spec['min']}")
        if "max" in spec and v > spec["max"]:
            violations.append(f"{path}: {v:.4f} > max {spec['max']}")
    return violations


def _dist(x):
    x = np.asarray(x, dtype=np.float64)
    return {
        "mean": float(x.mean()),
        "std": float(x.std()),
        "p10": float(np.percentile(x, 10)),
        "median": float(np.percentile(x, 50)),
        "p90": float(np.percentile(x, 90)),
        "min": float(x.min()),
        "max": float(x.max()),
    }


def compute_metrics(path: str, n_renders: int = 64, bs: int = 8,
                    ema=None, n_disc=None) -> dict:
    """All three metric families for a run/release dir. Library form so the
    release gate test (tests/test_release_weights.py) can run a reduced-N
    pass without shelling out."""
    import jax
    import jax.numpy as jnp

    from object_intrinsics_tpu.utils.platform import honor_jax_platforms

    honor_jax_platforms()

    from object_intrinsics_tpu.utils.checkpoint import load_pytree, restore_like
    from object_intrinsics_tpu.utils.config import build_from_config
    from object_intrinsics_tpu.utils.test import inference_setup

    cfg, model, model_info = inference_setup(path, ema=ema)
    assert model is not None, f"no usable checkpoint under {path}"
    gen, g_params = model["generator"], model["params"]
    it = jnp.asarray(model["it"], dtype=jnp.int32)

    dataset = build_from_config(cfg["data"])
    crop_masks = dataset.alpha[..., 0] > 0.5  # (n_crops, h, w) bool

    # ---------------------------------------------------------- renders
    n_batches = max(1, n_renders // bs)
    fwd = jax.jit(
        lambda p, key: gen.forward(p, key, bs, it, {}, train=False,
                                   return_raw=True, fast=True)["box"]
    )
    masks, stats_acc = [], {"weight_sum": [], "weight_max": [], "s_val": [],
                            "eikonal": []}
    key = jax.random.PRNGKey(20260817)
    for i in range(n_batches):
        out = fwd(g_params, jax.random.fold_in(key, i))
        ro = out["render_out"]
        masks.append(np.asarray(ro["mask"][..., 0]))
        raw = out["raw_render_out"]
        stats_acc["weight_sum"].append(np.asarray(raw["weight_sum"]).mean())
        stats_acc["weight_max"].append(np.asarray(raw["weight_max"]).mean())
        stats_acc["s_val"].append(np.asarray(raw["s_val"]).mean())
        stats_acc["eikonal"].append(float(out["loss"]["eikonal"]))
    masks = np.concatenate(masks, axis=0)  # (N, h, w)
    fake_bin = masks > 0.5

    # --------------------------------------------------- silhouette IoU
    inter = np.einsum("nhw,mhw->nm", fake_bin.astype(np.float32),
                      crop_masks.astype(np.float32))
    areas_f = fake_bin.reshape(len(fake_bin), -1).sum(-1).astype(np.float32)
    areas_r = crop_masks.reshape(len(crop_masks), -1).sum(-1).astype(np.float32)
    union = areas_f[:, None] + areas_r[None, :] - inter
    iou = inter / np.maximum(union, 1.0)
    best_iou = iou.max(axis=1)  # per render, best-matching crop

    px = float(masks.shape[-1] * masks.shape[-2])
    fill_fake = areas_f / px
    fill_real = areas_r / px

    # ------------------------------------------- discriminator logits
    state, _ = load_pytree(model_info["checkpoint_path"])
    disc = build_from_config(cfg["model"]["discriminator"])
    d_template = disc.init(jax.random.PRNGKey(0))
    d_params = restore_like(d_template, state["params"]["discriminator"])

    n_real = len(dataset) if n_disc is None else min(n_disc, len(dataset))
    real = np.stack([dataset.get(j, np.random.RandomState(j))["image"]
                     for j in range(n_real)])
    d_apply = jax.jit(lambda p, x, k: disc.apply(p, x, k)[:, :1])
    k_aug = jax.random.PRNGKey(7)
    real_logits = np.asarray(d_apply(d_params, jnp.asarray(real), k_aug))[:, 0]

    fake_imgs = []
    for i in range(-(-n_real // bs)):  # ceil: cover all n_real, then trim
        out = fwd(g_params, jax.random.fold_in(key, 1000 + i))
        fake_imgs.append(np.asarray(out["render_out"]["image"]))
    fake = np.concatenate(fake_imgs)[:n_real]
    fake_logits = np.asarray(d_apply(d_params, jnp.asarray(fake), k_aug))[:, 0]

    metrics = {
        "provenance": {
            "checkpoint": model_info["checkpoint_path"],
            "it": model_info["it"],
            "weights": f"ema@{ema}" if ema is not None else "raw",
            "n_renders": int(len(masks)),
            "n_crops": int(n_real),
            "resolution": int(gen.resolution),
        },
        "silhouette": {
            "best_iou_vs_crops": _dist(best_iou),
            "fill_fraction_renders": _dist(fill_fake),
            "fill_fraction_crops": _dist(fill_real),
            "fill_fraction_abs_gap": abs(float(fill_fake.mean())
                                         - float(fill_real.mean())),
        },
        "renderer_equilibrium": {k: float(np.mean(v))
                                 for k, v in stats_acc.items()},
        "discriminator_equilibrium": {
            "real_logit_mean": float(real_logits.mean()),
            "fake_logit_mean": float(fake_logits.mean()),
            "logit_gap": float(real_logits.mean() - fake_logits.mean()),
            "real_acc": float((real_logits > 0).mean()),
            "fake_acc": float((fake_logits < 0).mean()),
        },
    }
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", required=True, help="training run dir")
    ap.add_argument("-n", "--n-renders", type=int, default=64)
    ap.add_argument("--ema", type=float, default=None)
    ap.add_argument("--bs", type=int, default=8, help="renders per device call")
    ap.add_argument("-o", "--out", default=None,
                    help="metrics JSON to write (default: "
                         "docs/results/parity_metrics.json in plain scoring "
                         "mode; NO file in --assert-thresholds mode, so a "
                         "gate run never clobbers the committed artifact the "
                         "thresholds were derived from — pass -o to keep it)")
    ap.add_argument("--assert-thresholds", metavar="FILE", default=None,
                    help="threshold spec JSON ({dotted.path: {min/max}}); "
                         "exit 1 if any metric violates it (the release gate)")
    args = ap.parse_args()
    if args.out is None and not args.assert_thresholds:
        args.out = "docs/results/parity_metrics.json"

    metrics = compute_metrics(args.path, n_renders=args.n_renders, bs=args.bs,
                              ema=args.ema)

    print(json.dumps(metrics, indent=2, sort_keys=True))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2, sort_keys=True)
        print(f"\nwrote {args.out}")

    if args.assert_thresholds:
        with open(args.assert_thresholds) as f:
            thresholds = json.load(f)
        violations = check_thresholds(metrics, thresholds)
        if violations:
            print(f"GATE FAILED ({args.assert_thresholds}):")
            for v in violations:
                print(f"  {v}")
            sys.exit(1)
        n = len([k for k in thresholds if not k.startswith('_')])
        print(f"GATE PASSED: {n} thresholds from {args.assert_thresholds}")


if __name__ == "__main__":
    main()
