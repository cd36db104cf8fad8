#!/usr/bin/env python
"""Fabricate a synthetic multi-instance RGBA crop dataset.

Only data/example ships with the reference; this proves the pipeline isn't
example-folder-shaped by generating a fresh crops folder + cfg.yaml with the
same schema (/root/reference/data/example/cfg.yaml: b2w_scene_prior / fov /
img_size / img_size_scene) from an analytic SDF — a rounded box with a
corner bump (pose-revealing, unlike a sphere) — rendered through our own
NeuS renderer with Lambertian shading at poses drawn from the same Plane
prior the trainer will fit.

Usage:
    python tools/make_synthetic_dataset.py -o data/synth_box [-n 24]
        [--size 256] [--seed 0] [--prior plane|hemisphere|sphere]

``--prior hemisphere`` draws the crops from the reference's Hemisphere
sampler (src/utils/pose_sampler.py:93-115) instead of Plane. The Plane
prior's free rotation axis coincides with its single view axis, so depth
along the ray is shading-only and volumetric recovery is unidentifiable
(r4 verdict weak #2); the Hemisphere's multi-elevation views make depth
silhouette-constrained, so a trained run CAN be scored for full-3D
recovery (tools/eval_synth_recovery.py --yaw-axis z).

``--prior sphere`` uses the reference's Sphere sampler
(src/utils/pose_sampler.py:28-60): view-cone-filtered uniform rotations
with free roll about canonical z — the third and last pose-prior family.
Its roll gauge matches eval_synth_recovery --yaw-axis z.

Then train on it:
    python scripts/train.py -d data/synth_box -o -t synth [overrides...]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from object_intrinsics_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()  # fixtures can be generated off-chip


def box_fns(inv_s=600.0):
    """Rounded box (0.45, 0.3, 0.2) + a bump sphere on one corner: an
    asymmetric solid whose silhouette identifies the pose."""
    half = jnp.asarray([0.45, 0.3, 0.2])
    bump_c = jnp.asarray([0.38, 0.26, 0.18])
    bump_r = 0.16
    round_r = 0.05

    def sdf_val(pts):
        q = jnp.abs(pts) - half
        # sqrt(sum^2 + eps): linalg.norm has a NaN gradient at the zero
        # vector (every point inside the box)
        outside = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, axis=-1) + 1e-12)
        box = outside + jnp.minimum(jnp.max(q, axis=-1), 0.0) - round_r
        bump = jnp.linalg.norm(pts - bump_c, axis=-1) - bump_r
        return jnp.minimum(box, bump)[..., None]

    def sdf_grad(pts):
        g = jax.grad(lambda p: sdf_val(p).sum())(pts)
        feat = jnp.zeros((*pts.shape[:-1], 8))
        return sdf_val(pts), g, feat

    def color(feat, normals):
        # position-free warm albedo; shading supplies the variation
        return jnp.broadcast_to(jnp.asarray([0.8, 0.55, 0.35]),
                                (*feat.shape[:-1], 3))

    from object_intrinsics_tpu.ops.renderer import FieldFns

    return FieldFns(sdf=sdf_val, sdf_grad=sdf_grad, color=color,
                    inv_s=jnp.asarray(inv_s))


def _render_jit(fns, size):
    """Jitted (rays_o, rays_d, light_b) -> (premultiplied rgb, alpha)."""
    from object_intrinsics_tpu.ops.renderer import RendererConfig, render

    rcfg = RendererConfig(n_samples=48, n_importance=24, up_sample_steps=2,
                          perturb=0)

    @jax.jit
    def go(rays_o, rays_d, light_b):
        mid = -jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
        out = render(rcfg, fns, rays_o, rays_d, mid - 1, mid + 1,
                     cos_anneal_ratio=jnp.asarray(1.0), perturb=False)
        w = out["weights"]
        alpha = out["weight_sum"].reshape(size, size)
        normals = out["gradients"]
        normals = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-9)
        diff = jnp.maximum(jnp.sum(normals * light_b, axis=-1), 0.0)
        shading = 0.33 + 0.66 * diff  # ambient + diffuse
        albedo = jnp.asarray([0.8, 0.55, 0.35])
        rgb = jnp.sum(shading[..., None] * albedo * w[..., None], axis=-2)
        return rgb.reshape(size, size, 3), alpha

    return go


def render_crop(render_fn, b2w, size, fov_deg, light_w):
    """One RGBA crop: rays through a fov window, rotated into the box frame
    (the inverse of the trainer's gen_rays_at crop geometry)."""
    from object_intrinsics_tpu.utils.pose import invert_rot_t

    cam_dist = 1.0 / np.tan(0.5 * np.deg2rad(fov_deg))
    t = np.linspace(-1.0, 1.0, size) * np.tan(0.5 * np.deg2rad(fov_deg))
    px, py = np.meshgrid(t, t, indexing="xy")
    d = np.stack([px, py, np.ones_like(px)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile([0.0, 0.0, -cam_dist], (size, size, 1))

    w2b = np.asarray(invert_rot_t(jnp.asarray(b2w)[None]))[0]
    R, tr = w2b[:3, :3], w2b[:3, 3]
    rays_d = jnp.asarray((d @ R.T).reshape(1, -1, 3), dtype=jnp.float32)
    rays_o = jnp.asarray((o @ R.T + tr).reshape(1, -1, 3), dtype=jnp.float32)
    light_b = jnp.asarray(R @ np.asarray(light_w), dtype=jnp.float32)

    rgb, alpha = render_fn(rays_o, rays_d, light_b)
    rgb, alpha = np.asarray(rgb), np.asarray(alpha)
    rgb = rgb / np.maximum(alpha[..., None], 1e-3)  # un-premultiply
    return np.clip(rgb, 0, 1), np.clip(alpha, 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("-n", "--num", type=int, default=24)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--fov", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prior", choices=["plane", "hemisphere", "sphere"],
                    default="plane")
    args = ap.parse_args()

    import object_intrinsics_tpu  # noqa: F401
    from PIL import Image

    from object_intrinsics_tpu.utils.config import build_from_config

    if args.prior == "hemisphere":
        prior_cfg = {
            "__target__": "object_intrinsics_tpu.utils.pose_sampler.Hemisphere",
            "kwargs": {},
        }
    elif args.prior == "sphere":
        # view-cone-filtered uniform rotations + free roll about canonical z
        # (reference src/utils/pose_sampler.py:28-60) — the third and last
        # prior family; its gauge axis for eval is z, like Hemisphere's
        prior_cfg = {
            "__target__": "object_intrinsics_tpu.utils.pose_sampler.Sphere",
            "kwargs": {},
        }
    else:
        prior_cfg = {
            "__target__": "object_intrinsics_tpu.utils.pose_sampler.Plane",
            "kwargs": dict(cam_loc=[0, -1, 0], rot_degree_range_scale=360,
                           rot_roll_degree_range_scale=20,
                           xy_range_scale=[6, 3.5]),
        }
    prior = build_from_config(prior_cfg)
    # crops are object-centered: zero the scene-plane translation, keep the
    # rotation distribution the trainer will rediscover
    b2ws = np.array(prior(jax.random.PRNGKey(args.seed), args.num))  # writable
    b2ws[:, :3, 3] = 0.0

    fns = box_fns()
    render_fn = _render_jit(fns, args.size)
    light_w = np.asarray([0.3, -0.8, -0.52])
    light_w /= np.linalg.norm(light_w)

    os.makedirs(args.out, exist_ok=True)
    for i in range(args.num):
        rgb, alpha = render_crop(render_fn, b2ws[i], args.size, args.fov, light_w)
        rgba = np.concatenate([rgb, alpha[..., None]], -1)
        Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
            os.path.join(args.out, f"{i:02d}.png"))
        print(f"wrote {i:02d}.png  fill={alpha.mean():.3f}")

    scene = int(round(args.size * 1588 / 256))  # keep the example crop ratio
    if args.prior == "hemisphere":
        prior_yaml = """b2w_scene_prior:
  __target__: src.utils.pose_sampler.Hemisphere
  kwargs: {}
"""
    elif args.prior == "sphere":
        prior_yaml = """b2w_scene_prior:
  __target__: src.utils.pose_sampler.Sphere
  kwargs: {}
"""
    else:
        prior_yaml = """b2w_scene_prior:
  __target__: src.utils.pose_sampler.Plane
  kwargs:
    cam_loc: [0, -1, 0]
    rot_degree_range_scale: 360
    rot_roll_degree_range_scale: 20
    xy_range_scale:
      - 6
      - 3.5
"""
    with open(os.path.join(args.out, "cfg.yaml"), "w") as f:
        f.write(prior_yaml + f"""fov: {args.fov}
img_size: {args.size}
img_size_scene: {scene}
cam_dist: null
scene_fov: null
""")
    print(f"wrote {args.out}/cfg.yaml")


if __name__ == "__main__":
    main()
