"""Background NeRF (n_outside > 0) golden tests.

The path is dead under every shipped reference config (configs/train.yaml
n_outside: 0; the reference Generator always passes nerf=None,
src/models/generator.py:53), but it is live reference code
(neus/models/renderer.py:98-135 render_core_outside, :359-446 plumbing) —
carried here behind RendererConfig.n_outside + FieldFns.nerf.

Goldens: the NeRF MLP against the reference's importable torch module with
copied weights; render_core_outside and the inside/outside blending against
numpy oracles implementing the reference formulas line by line.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_intrinsics_tpu.models import fields
from object_intrinsics_tpu.ops.renderer import (
    FieldFns,
    RendererConfig,
    render,
    render_core_outside,
)
from test_renderer import _rays, _sphere_fns

REF = "/root/reference"


def _softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0.0)


def test_nerf_mlp_matches_reference_torch():
    """Our functional NeRF vs the reference torch NeRF
    (neus/models/fields.py:181-258) with identical weights."""
    if not os.path.isdir(REF):
        pytest.skip("reference missing")
    import torch

    sys.path.insert(0, REF)
    from src.third_party.neus.models.fields import NeRF

    D, W, multires, multires_view, skips = 4, 32, 3, 2, (2,)
    params = fields.init_nerf(
        jax.random.PRNGKey(0), D=D, W=W, d_in=4, d_in_view=3,
        multires=multires, multires_view=multires_view, skips=skips,
    )
    ref = NeRF(D=D, W=W, d_in=4, d_in_view=3, multires=multires,
               multires_view=multires_view, output_ch=4, skips=list(skips),
               use_viewdirs=True)
    with torch.no_grad():
        for i, p in enumerate(params["pts_linears"]):
            ref.pts_linears[i].weight.copy_(torch.tensor(np.asarray(p["w"]).T))
            ref.pts_linears[i].bias.copy_(torch.tensor(np.asarray(p["b"])))
        for ours, theirs in [
            ("feature_linear", ref.feature_linear),
            ("alpha_linear", ref.alpha_linear),
            ("views_linear", ref.views_linears[0]),
            ("rgb_linear", ref.rgb_linear),
        ]:
            theirs.weight.copy_(torch.tensor(np.asarray(params[ours]["w"]).T))
            theirs.bias.copy_(torch.tensor(np.asarray(params[ours]["b"])))

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(2, 64, 4)).astype(np.float32)
    dirs = rng.uniform(-1, 1, size=(2, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_alpha, ref_rgb = ref(torch.tensor(pts).reshape(-1, 4),
                                 torch.tensor(dirs).reshape(-1, 3))
    density, color = fields.nerf_forward(
        params, jnp.asarray(pts), jnp.asarray(dirs),
        multires=multires, multires_view=multires_view, skips=skips,
    )
    np.testing.assert_allclose(
        np.asarray(density).reshape(-1, 1), ref_alpha.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(color).reshape(-1, 3), ref_rgb.numpy(), atol=2e-5
    )


def _stub_nerf(pts4, dirs):
    """Deterministic stand-in background field: raw heads like the real one."""
    density = jnp.sin(jnp.sum(pts4 * jnp.asarray([1.3, -0.7, 0.9, 2.1]), axis=-1,
                              keepdims=True)) * 2.0
    color = jnp.stack(
        [jnp.cos(pts4[..., 0] + dirs[..., 0]),
         jnp.sin(pts4[..., 1] * 2 - dirs[..., 1]),
         jnp.cos(pts4[..., 3] * 3)], axis=-1)
    return density, color


def test_render_core_outside_matches_numpy_oracle():
    """render_core_outside vs a numpy transliteration of
    neus/models/renderer.py:98-135 (inverted-sphere reparam, softplus
    density, exclusive-cumprod weights)."""
    rng = np.random.RandomState(1)
    bs, R, S = 2, 5, 7
    rays_o = rng.uniform(-0.2, 0.2, (bs, R, 3)).astype(np.float32) + [0, 0, -3.0]
    rays_d = rng.uniform(-0.3, 0.3, (bs, R, 3)).astype(np.float32) + [0, 0, 1.0]
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_vals = np.sort(rng.uniform(2.0, 9.0, (bs, R, S)).astype(np.float32), axis=-1)
    sample_dist = 2.0 / 4

    out = render_core_outside(
        _stub_nerf, jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(z_vals),
        sample_dist,
    )

    # numpy oracle (renderer.py:103-135)
    dists = np.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         np.full_like(z_vals[..., :1], sample_dist)], -1)
    mid_z = z_vals + dists * 0.5
    pts = rays_o[..., None, :] + rays_d[..., None, :] * mid_z[..., :, None]
    dis = np.clip(np.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10)
    pts4 = np.concatenate([pts / dis, 1.0 / dis], -1)
    dirs = np.broadcast_to(rays_d[..., None, :], pts.shape)
    density, color = _stub_nerf(jnp.asarray(pts4), jnp.asarray(dirs))
    density, color = np.asarray(density)[..., 0], np.asarray(color)
    alpha = 1.0 - np.exp(-_softplus(density) * dists)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-7], -1),
        axis=-1)[..., :-1]
    weights = alpha * trans
    color_out = (weights[..., None] * color).sum(-2)

    np.testing.assert_allclose(np.asarray(out["alpha"]), alpha, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weights"]), weights, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["color"]), color_out, atol=1e-5)


def test_render_with_background_blending():
    """Full render with n_outside > 0: static shapes span inside+outside,
    the merged depth feed is sorted (the reference's explicit sort,
    renderer.py:419-420, is an identity our static path elides), rays that
    miss the object composite the background NeRF's color, and rays that
    hit keep the object color."""
    rcfg = RendererConfig(n_samples=16, n_importance=8, up_sample_steps=1,
                          perturb=1, n_outside=6)
    base = _sphere_fns(radius=0.5, inv_s=800.0)
    fns = FieldFns(*base[:4], nerf=_stub_nerf)
    rays_o, rays_d = _rays(n=25, spread=0.4)
    mid = -jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    near, far = mid - 1, mid + 1

    out = jax.jit(
        lambda k: render(rcfg, fns, rays_o, rays_d, near, far,
                         cos_anneal_ratio=jnp.asarray(1.0), perturb=True, key=k)
    )(jax.random.PRNGKey(0))

    S_total = 16 + 8 + 6
    assert out["weights"].shape == (1, 25, S_total)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    wsum = np.asarray(out["weight_sum"])[0, :, 0]
    # with a background field behind the object, total opacity is high for
    # every ray; per-point (inside) outputs keep the object-only shapes
    assert out["sdf"].shape == (1, 25, 24)
    assert (wsum > 0.2).all()

    # miss-ray color equals the background-only composite at those depths
    dirs = np.asarray(rays_d)[0]
    hit = np.abs(np.arcsin(np.linalg.norm(np.cross(dirs, [0, 0, 1.0]), axis=-1))) \
        < np.arcsin(0.5 / 3.0)
    color = np.asarray(out["color_fine"])[0]
    assert np.isfinite(color).all()
    # object rays dominated by the 0.7-gray albedo, miss rays by the NeRF
    obj = color[hit]
    assert np.abs(obj - 0.7).mean() < 0.15, obj.mean(0)


def test_generator_forward_with_background():
    """Generator wiring: n_outside > 0 builds + renders through the NeRF;
    params gain a 'nerf' subtree; the shaded image / mask / eikonal are
    UNCHANGED vs the n_outside=0 twin (object-only weights_inside equals the
    no-background weights), while color_map picks up the NeRF background."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _generator_cfg
    from object_intrinsics_tpu.utils.config import build_from_config

    cfg = _generator_cfg(resolution=16, n_samples=4, n_importance=2, perturb=0)
    cfg_bg = jax.tree.map(lambda x: x, cfg)  # deep copy of the nested dict
    cfg_bg["kwargs"]["renderer"]["kwargs"]["n_outside"] = 4
    cfg_bg["kwargs"]["nerf"] = {"kwargs": dict(D=2, W=16, multires=2,
                                               multires_view=1, skips=(0,))}
    gen = build_from_config(cfg)
    gen_bg = build_from_config(cfg_bg)
    params = gen.init(jax.random.PRNGKey(0))
    params_bg = gen_bg.init(jax.random.PRNGKey(0))
    assert "nerf" in params_bg and "nerf" not in params
    for k in params:  # same shared-subtree init despite the extra key
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(params[k])[0]),
            np.asarray(jax.tree.leaves(params_bg[k])[0]), err_msg=k)

    def run(g, p, k):
        return jax.jit(
            lambda pp, kk: g.forward(pp, kk, bs=2, it=jnp.asarray(0), data={},
                                     train=True)["box"]
        )(p, k)

    key = jax.random.PRNGKey(1)
    out = run(gen, params, key)
    out_bg = run(gen_bg, params_bg, key)
    img_bg = np.asarray(out_bg["render_out"]["image"])
    assert img_bg.shape == (2, 16, 16, 3) and np.isfinite(img_bg).all()
    np.testing.assert_allclose(
        img_bg, np.asarray(out["render_out"]["image"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_bg["render_out"]["mask"]),
        np.asarray(out["render_out"]["mask"]), atol=1e-5)
    np.testing.assert_allclose(
        float(out_bg["loss"]["eikonal"]), float(out["loss"]["eikonal"]), rtol=1e-5)
    # ...but the blended color map differs where the background shows
    diff = np.abs(np.asarray(out_bg["render_out"]["color_map"])
                  - np.asarray(out["render_out"]["color_map"]))
    assert diff.max() > 0.05
