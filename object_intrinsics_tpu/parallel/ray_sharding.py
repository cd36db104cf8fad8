"""Ray-sharded evaluation rendering: the structural analog of sequence
parallelism for this workload (SURVEY §2.7).

The reference bounds render memory with a serial host-side chunk loop
(MAX_RAY_BATCH_SIZE, src/models/generator.py:14,286-305; test-time -depth/-res
flags shrink the chunk, scripts/test.py:278-281). Here the ray batch of an
evaluation render shards across the device mesh instead: each chip renders a
contiguous slice of the pixel rays (params replicated, rays split over the
'data' axis), and the composited per-ray maps gather back into full images.
Memory per chip falls linearly with mesh size, so test-time super-resolution
(-res 512 -depth 16) renders in one pass instead of a Python loop.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, shard_map


def sharded_eval_render(gen, params, data: Dict, mesh: Mesh, bs: int = 1,
                        it: int = 0, key=None):
    """Render one evaluation batch with rays sharded over ``mesh``.

    ``data`` must pin the stochastic inputs ('b2w' and 'z' or 'w'; optional
    'bg_color') so every chip agrees on the scene. Returns the generator's
    NHWC map dict (image/mask/normal_map/shading_map/...).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = mesh.size
    res = gen.resolution
    R = res * res
    assert R % n == 0, (R, n)
    shard = R // n
    it_arr = jnp.asarray(it, dtype=jnp.int32)

    def per_chip(params, data):
        prior_info = gen.sample_prior(params, key, bs, data)
        latent_info = gen.sample_latent(params, key, bs, data)
        rays_info = gen.gen_rays_at(data, prior_info)

        idx = jax.lax.axis_index(DATA_AXIS)
        rays_o = jax.lax.dynamic_slice_in_dim(
            rays_info["rays_o"].reshape(bs, R, 3), idx * shard, shard, axis=1
        )
        rays_d = jax.lax.dynamic_slice_in_dim(
            rays_info["rays_d"].reshape(bs, R, 3), idx * shard, shard, axis=1
        )
        # render the ray slice as a (shard, 1) pseudo-image
        shard_rays = {
            "rays_o": rays_o.reshape(bs, shard, 1, 3),
            "rays_d": rays_d.reshape(bs, shard, 1, 3),
        }
        render_out = gen.render(params, None, shard_rays, latent_info, it_arr, train=False)
        render_out.pop("latent_info", None)
        if "bg_color" in data:
            bg = jnp.asarray(data["bg_color"], dtype=jnp.float32)
        else:
            bg = jnp.ones((bs, 3), dtype=jnp.float32)

        maps = _composite_rays(gen, params, bg, render_out, rays_o, prior_info)
        return maps  # dict of (bs, shard, c)

    fn = shard_map(
        per_chip, mesh,
        in_specs=(P(), P()),
        out_specs=P(None, DATA_AXIS),
    )
    flat = jax.jit(fn)(params, data)
    return {k: v.reshape(bs, res, res, v.shape[-1]) for k, v in flat.items()}


def _composite_rays(gen, params, bg_color, render_out, rays_o, prior_info):
    """Per-ray compositing (the per-ray core of Generator.render_maps)."""
    from ..models import lighting

    light_p = params["light"]
    weights = render_out["weights"]  # (bs, R, S)
    weight_sum = render_out["weight_sum"]  # (bs, R, 1)
    normal_pts = render_out["gradients"]
    color_pts = render_out["raw_color"]
    pts = render_out["pts"]

    def pts_sum(x):
        return jnp.sum(x * weights[..., None], axis=-2)

    amb = lighting.ambient_color(light_p)
    light_dir = prior_info["light_dir_b"][:, None, None, :]
    diff_pts = lighting.diffuse(normal_pts, lighting.diffuse_color(light_p), light_dir)
    shading_pts = amb + diff_pts
    specular_pts = lighting.specular(
        points=pts,
        normals=normal_pts,
        light_dir=light_dir,
        color=lighting.specular_color(light_p),
        camera_position=rays_o[:, :, None, :],
        shininess=lighting.shininess(light_p),
    )
    rgb = pts_sum(shading_pts * color_pts) + pts_sum(specular_pts)
    return {
        "image": rgb + bg_color[:, None, :] * (1.0 - weight_sum),
        "mask": jnp.clip(weight_sum, 1e-3, 1.0 - 1e-3),
        "normal_map": pts_sum(normal_pts),
        "shading_map": pts_sum(shading_pts),
        "color_map": pts_sum(color_pts),
    }
