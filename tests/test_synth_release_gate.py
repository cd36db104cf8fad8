"""Volumetric-recovery gates on the synthetic release weights.

The strongest fidelity check the repo has: release/synth_hemi and
release/synth_sphere were trained on fixtures whose ground-truth geometry
is known in closed form (tools/make_synthetic_dataset.py), so CI can
assert the learned SDF actually recovers the 3D asset — not just that
renders look plausible. Reduced version of tools/eval_synth_recovery.py
(one prior-draw latent, 48³ grid, 24 yaw steps about the prior's free
z axis — azimuth for Hemisphere, roll for Sphere).

Floors leave wide slack below the full 96³ artifact scores
(docs/results/synth_recovery_{hemi,sphere}.json: hemi 100k 0.81-0.82,
sphere 30k see JSON) for latent- and grid-resolution variation — the
latent drawn here (PRNGKey(0)) is not one of the artifact's draws — while
still failing hard on a broken field (a collapsed or sphere-init SDF
scores <0.1). Each gate skips when its release is absent.
"""
import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))


def _release(name):
    return os.path.join(REPO, "release", name)


@pytest.mark.parametrize(
    "name,iou_floor",
    [("synth_hemi", 0.5),    # 100k run; full-grid prior-draw score 0.81+
     ("synth_sphere", 0.4)], # 30k run; shorter training, lower floor
)
def test_release_recovers_gt_volume(name, iou_floor):
    release = _release(name)
    if not os.path.exists(os.path.join(release, "checkpoints", "model.npz")):
        pytest.skip(f"release/{name} weights not present")

    import jax
    import jax.numpy as jnp

    from eval_synth_recovery import gt_sdf_np, yaw_rot

    from object_intrinsics_tpu.models import fields
    from object_intrinsics_tpu.utils.test import inference_setup

    cfg, model, info = inference_setup(release, ema=0.99)
    assert model is not None
    sdf_p = model["params"]["sdf_network"]

    n = 48
    axis = np.linspace(-1.0, 1.0, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    z_dim = int(np.asarray(sdf_p["style"][0]["w"]).shape[0])
    z = jax.random.normal(jax.random.PRNGKey(0), (1, z_dim))
    w = fields.shape_style(sdf_p, z)
    vals = np.asarray(fields.shape_sdf(sdf_p, jnp.asarray(pts)[None], w)[0, :, 0])
    occ = (vals < 0.0).reshape(n, n, n)

    # gauge search over the prior's free rotation about z
    best = 0.0
    for theta in np.linspace(0.0, 2 * np.pi, 24, endpoint=False):
        rp = pts @ yaw_rot(theta, "z").T.astype(np.float32)
        occ_gt = (gt_sdf_np(rp) < 0.0).reshape(n, n, n)
        inter = np.logical_and(occ, occ_gt).sum()
        union = np.logical_or(occ, occ_gt).sum()
        best = max(best, float(inter) / max(float(union), 1.0))

    # sanity on the occupied fraction too: a field that fills (or empties)
    # space can't pass, independent of yaw
    assert 0.01 < occ.mean() < 0.15, f"degenerate occupancy {occ.mean():.4f}"
    assert best > iou_floor, (
        f"{name}: volumetric IoU {best:.3f} < floor {iou_floor}")
