"""Ray-sharded / ray-chunked evaluation rendering: the structural analog of
sequence parallelism for this workload (SURVEY §2.7).

The reference bounds render memory with a serial host-side chunk loop
(MAX_RAY_BATCH_SIZE, src/models/generator.py:14,286-305; test-time -depth/-res
flags shrink the chunk, scripts/test.py:278-281). Two TPU-native equivalents:

  * ``sharded_eval_render`` — the ray batch shards across the device mesh:
    each chip renders a contiguous slice of the pixel rays (params
    replicated, rays split over the 'data' axis) and the composited per-ray
    maps gather back into full images. Memory per chip falls linearly with
    mesh size.
  * ``chunked_eval_render`` — one-chip memory bounding: a serial loop over
    fixed-shape ray tiles (one compiled executable, re-dispatched per tile),
    mirroring the reference's MAX_RAY_BATCH_SIZE semantics so
    ``-res 512 -depth 16`` renders within a single chip's HBM. When several
    devices are visible each tile is additionally sharded over the mesh.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, make_mesh, shard_map


def sharded_point_query(fn, mesh: Mesh, chunk: int = 32768):
    """Wrap a per-point field function for host-driven grid sweeps (mesh
    extraction) with the points SHARDED over ``mesh``: each chip evaluates
    ``chunk`` points per dispatch, so one dispatch covers chunk * mesh.size
    points and wall time falls linearly with mesh size.

    ``fn``: (m, 3) jnp points -> (m,) values, closing over its params
    (replicated). Returns a numpy (n, 3) -> (n,) callable that pads to the
    fixed dispatch shape (one executable serves every call) — a drop-in
    ``query_fn`` for :func:`ops.marching_cubes.extract_geometry`."""
    import numpy as np

    nd = mesh.size
    per = shard_map(
        lambda p: fn(p), mesh, in_specs=(P(DATA_AXIS),), out_specs=P(DATA_AXIS)
    )
    jitted = jax.jit(per)
    step = chunk * nd

    def query(pts_np):
        pts_np = np.asarray(pts_np, dtype=np.float32)
        out = np.empty(len(pts_np), dtype=np.float32)
        for i in range(0, len(pts_np), step):
            blk = pts_np[i : i + step]
            pad = step - len(blk)
            v = np.asarray(jitted(jnp.asarray(np.pad(blk, ((0, pad), (0, 0))))))
            out[i : i + step] = v[: len(blk)]
        return out

    return query


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
        if "bg_color" in data:
            bg = jnp.asarray(data["bg_color"], dtype=jnp.float32)
        else:
            bg = jnp.ones((bs, 3), dtype=jnp.float32)
        return _render_ray_slice(
            gen, params, rays_o, rays_d, latent_info, prior_info, bg, it_arr
        )  # dict of (bs, shard, c)

    fn = shard_map(
        per_chip, mesh,
        in_specs=(P(), P()),
        out_specs=P(None, DATA_AXIS),
    )
    flat = jax.jit(fn)(params, data)
    return {k: v.reshape(bs, res, res, v.shape[-1]) for k, v in flat.items()}


def _render_ray_slice(gen, params, rays_o, rays_d, latent_info, prior_info, bg, it_arr):
    """Render a flat (bs, n, 3) ray slice as a (n, 1) pseudo-image and
    composite to per-ray maps (the per-ray core of Generator.render_maps)."""
    bs, n, _ = rays_o.shape
    slice_rays = {
        "rays_o": rays_o.reshape(bs, n, 1, 3),
        "rays_d": rays_d.reshape(bs, n, 1, 3),
    }
    render_out = gen.render(params, None, slice_rays, latent_info, it_arr, train=False)
    render_out.pop("latent_info", None)
    return _composite_rays(gen, params, bg, render_out, rays_o, prior_info)


def chunked_eval_render(
    gen,
    params,
    data: Dict,
    *,
    bs: int = 1,
    it: int = 0,
    key=None,
    max_ray_batch: int = 128 * 128,
    mesh: Optional[Mesh] = None,
):
    """Memory-bounded evaluation render: a serial host loop over fixed-shape
    ray tiles of at most ``max_ray_batch`` rays (the reference's
    MAX_RAY_BATCH_SIZE chunking, src/models/generator.py:286-305; test-time
    ``-depth k`` divides the tile size, scripts/test.py:278-281).

    Every tile re-dispatches ONE compiled executable (static shapes), so peak
    HBM is bounded by the tile, not the image. If ``mesh`` is given (or more
    than one device is visible) each tile's rays also shard across the mesh.
    ``data`` must pin 'b2w' and 'z' or 'w' so every tile/chip agrees on the
    scene. Returns full NHWC maps (image/mask/normal_map/shading_map/color_map).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    res = gen.resolution
    R = res * res
    it_arr = jnp.asarray(it, dtype=jnp.int32)

    if mesh is None and jax.device_count() > 1:
        mesh = make_mesh()
    n_dev = mesh.size if mesh is not None else 1

    chunk = int(min(max(max_ray_batch, 1), R))
    # keep tiles mesh-divisible; fall back to single-device tiles otherwise
    if mesh is not None and chunk % n_dev != 0:
        chunk = max(chunk - chunk % n_dev, n_dev) if chunk >= n_dev else chunk
        if chunk % n_dev != 0:
            mesh, n_dev = None, 1
    n_chunks = -(-R // chunk)
    pad = n_chunks * chunk - R

    setup_fn, tile_exec = _chunk_executables(gen, bs, R, pad, chunk, mesh, n_dev)

    rays_o, rays_d, latent_info, prior_info, bg = setup_fn(params, dict(data), key)
    out = []
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        out.append(
            tile_exec(params, rays_o[:, sl], rays_d[:, sl], latent_info, prior_info, bg, it_arr)
        )
    maps = {k: jnp.concatenate([o[k] for o in out], axis=1)[:, :R] for k in out[0]}
    return {k: v.reshape(bs, res, res, v.shape[-1]) for k, v in maps.items()}


def _chunk_executables(gen, bs: int, R: int, pad: int, chunk: int, mesh, n_dev: int):
    # compiled executables cached ON the generator (re-creating the jitted
    # closures per frame would retrace every frame of a walk; a module-level
    # cache would pin generators + executables for the process lifetime)
    cache = gen.__dict__.setdefault("_chunk_exec_cache", {})
    mesh_key = None if mesh is None else (tuple(d.id for d in mesh.devices.flat),)
    key = (bs, R, pad, chunk, mesh_key)
    if key in cache:
        return cache[key]

    def setup(params, data, rng):
        """Scene setup shared by every tile: pose, style, rays (+pad), bg."""
        prior_info = gen.sample_prior(params, rng, bs, data)
        latent_info = gen.sample_latent(params, rng, bs, data)
        if "w" not in latent_info:
            from ..models import fields

            latent_info = dict(latent_info)
            latent_info["w"] = fields.shape_style(params["sdf_network"], latent_info["z"])
        rays_info = gen.gen_rays_at(data, prior_info)
        rays_o = rays_info["rays_o"].reshape(bs, R, 3)
        rays_d = rays_info["rays_d"].reshape(bs, R, 3)
        if pad:
            rays_o = jnp.concatenate([rays_o, rays_o[:, :pad]], axis=1)
            rays_d = jnp.concatenate([rays_d, rays_d[:, :pad]], axis=1)
        if "bg_color" in data:
            bg = jnp.asarray(data["bg_color"], dtype=jnp.float32)
        else:
            bg = jnp.ones((bs, 3), dtype=jnp.float32)
        return rays_o, rays_d, latent_info, prior_info, bg

    def tile_fn(params, ro, rd, latent_info, prior_info, bg, it_arr):
        return _render_ray_slice(gen, params, ro, rd, latent_info, prior_info, bg, it_arr)

    if mesh is not None:
        per_dev = chunk // n_dev

        def tile_sharded(params, ro, rd, latent_info, prior_info, bg, it_arr):
            idx = jax.lax.axis_index(DATA_AXIS)
            ro = jax.lax.dynamic_slice_in_dim(ro, idx * per_dev, per_dev, axis=1)
            rd = jax.lax.dynamic_slice_in_dim(rd, idx * per_dev, per_dev, axis=1)
            return tile_fn(params, ro, rd, latent_info, prior_info, bg, it_arr)

        tile_exec = jax.jit(
            shard_map(
                tile_sharded, mesh,
                in_specs=(P(), P(), P(), P(), P(), P(), P()),
                out_specs=P(None, DATA_AXIS),
            )
        )
    else:
        tile_exec = jax.jit(tile_fn)

    cache[key] = (jax.jit(setup), tile_exec)
    return cache[key]


def _composite_rays(gen, params, bg_color, render_out, rays_o, prior_info):
    """Per-ray compositing (the per-ray core of Generator.render_maps)."""
    from ..models import lighting

    light_p = params["light"]
    weights = render_out["weights"]  # (bs, R, S [+ n_outside])
    weight_sum = render_out["weight_sum"]  # (bs, R, 1)
    # background NeRF (n_outside > 0): per-point arrays below span only the
    # S inside samples — composite with the object-only transmittance, like
    # Generator.render_maps (models/generator.py weights_inside branch).
    if "weights_inside" in render_out:
        weights = render_out["weights_inside"]
        weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
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
        # full-depth blended color, like Generator.render_maps — with a
        # background NeRF this includes the outside samples (equals
        # sum(weights * raw_color) when n_outside == 0)
        "color_map": render_out["color_fine"],
    }
