"""NeuS renderer golden tests with analytic SDFs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_intrinsics_tpu.ops.renderer import (
    FieldFns,
    RendererConfig,
    cat_z_vals,
    render,
    up_sample,
)


def _sphere_fns(radius=0.5, inv_s=200.0):
    def sdf(pts):
        return jnp.linalg.norm(pts, axis=-1, keepdims=True) - radius

    def sdf_grad(pts):
        n = jnp.linalg.norm(pts, axis=-1, keepdims=True)
        grad = pts / jnp.maximum(n, 1e-9)
        feat = jnp.zeros((*pts.shape[:-1], 8))
        return n - radius, grad, feat

    def color(feat, normals):
        return jnp.full((*feat.shape[:-1], 3), 0.7)

    return FieldFns(sdf=sdf, sdf_grad=sdf_grad, color=color, inv_s=jnp.asarray(inv_s))


def _rays(bs=1, n=16, cam_dist=3.0, spread=0.25):
    """Rays from a camera at -z looking at origin; center rays hit the
    sphere, edge rays miss."""
    t = np.linspace(-spread, spread, int(np.sqrt(n)))
    dirs = np.stack(np.meshgrid(t, t, indexing="ij"), -1).reshape(-1, 2)
    d = np.concatenate([dirs, np.ones((dirs.shape[0], 1))], -1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([0, 0, -cam_dist], dtype=np.float32), (d.shape[0], 1))
    return (
        jnp.asarray(o[None].repeat(bs, 0), dtype=jnp.float32),
        jnp.asarray(d[None].repeat(bs, 0), dtype=jnp.float32),
    )


def test_sphere_hit_and_miss():
    rcfg = RendererConfig(n_samples=32, n_importance=16, up_sample_steps=2, perturb=0)
    fns = _sphere_fns()
    rays_o, rays_d = _rays(n=25, spread=0.4)
    mid = -jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    out = render(rcfg, fns, rays_o, rays_d, mid - 1, mid + 1,
                 cos_anneal_ratio=jnp.asarray(1.0), perturb=False)
    wsum = np.asarray(out["weight_sum"])[0, :, 0]
    # center ray hits (sin(angle)*3 < 0.5), corner rays miss
    dirs = np.asarray(rays_d)[0]
    hit = np.abs(np.arcsin(np.linalg.norm(np.cross(dirs, [0, 0, 1.0]), axis=-1))) < np.arcsin(0.5 / 3.0)
    assert (wsum[hit] > 0.9).all(), wsum[hit]
    assert (wsum[~hit] < 0.1).all(), wsum[~hit]


def test_sphere_depth_accuracy():
    rcfg = RendererConfig(n_samples=64, n_importance=32, up_sample_steps=2, perturb=0)
    fns = _sphere_fns(inv_s=800.0)
    # single central ray
    rays_o = jnp.asarray([[[0.0, 0.0, -3.0]]])
    rays_d = jnp.asarray([[[0.0, 0.0, 1.0]]])
    out = render(rcfg, fns, rays_o, rays_d, jnp.asarray([[[2.0]]]), jnp.asarray([[[4.0]]]),
                 cos_anneal_ratio=jnp.asarray(1.0), perturb=False)
    depth = float(jnp.sum(out["mid_z_vals"] * out["weights"]) / jnp.sum(out["weights"]))
    assert abs(depth - 2.5) < 0.02, depth  # sphere front at z = -0.5 -> t = 2.5


def test_eikonal_zero_for_perfect_sdf():
    rcfg = RendererConfig(n_samples=16, n_importance=4, perturb=0)
    fns = _sphere_fns()
    rays_o, rays_d = _rays(n=16)
    mid = -jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    out = render(rcfg, fns, rays_o, rays_d, mid - 1, mid + 1,
                 cos_anneal_ratio=jnp.asarray(1.0), perturb=False)
    assert float(out["gradient_error"]) < 1e-8


def test_importance_samples_concentrate_at_surface():
    fns = _sphere_fns()
    rays_o = jnp.asarray([[[0.0, 0.0, -3.0]]])
    rays_d = jnp.asarray([[[0.0, 0.0, 1.0]]])
    z = jnp.linspace(2.0, 4.0, 16)[None, None, :]
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z[..., None]
    sdf = fns.sdf(pts.reshape(1, 16, 3)).reshape(1, 1, 16)
    new_z = up_sample(rays_o, rays_d, z, sdf, 8, 64.0)
    nz = np.asarray(new_z)[0, 0]
    # all importance samples near the front intersection t = 2.5
    assert (np.abs(nz - 2.5) < 0.35).all(), nz


def test_cat_z_vals_sorts_and_gathers():
    z = jnp.asarray([[[1.0, 3.0, 5.0]]])
    new_z = jnp.asarray([[[2.0, 4.0]]])
    sdf = jnp.asarray([[[10.0, 30.0, 50.0]]])
    new_sdf = jnp.asarray([[[20.0, 40.0]]])
    zs, ss = cat_z_vals(z, new_z, sdf, new_sdf)
    assert np.allclose(np.asarray(zs)[0, 0], [1, 2, 3, 4, 5])
    assert np.allclose(np.asarray(ss)[0, 0], [10, 20, 30, 40, 50])


def test_rank_onehot_matches_stable_argsort_with_ties():
    """The gather-free sort must reproduce a STABLE argsort exactly,
    including duplicate depths (coincident samples tie-break by original
    position, so the carried SDF pairs with the right z)."""
    from object_intrinsics_tpu.ops.renderer import _rank_onehot

    rng = np.random.RandomState(0)
    # quantize to force many exact ties
    v = rng.randint(0, 5, size=(3, 7, 12)).astype(np.float32)
    onehot = np.asarray(_rank_onehot(jnp.asarray(v)))
    sorted_oh = np.einsum("...ik,...i->...k", onehot, v)
    np.testing.assert_array_equal(sorted_oh, np.sort(v, axis=-1, kind="stable"))
    # permutation matrix: payload carried by the same permutation matches
    # take_along_axis with the stable argsort order
    payload = rng.rand(3, 7, 12).astype(np.float32)
    carried = np.einsum("...ik,...i->...k", onehot, payload)
    order = np.argsort(v, axis=-1, kind="stable")
    np.testing.assert_array_equal(carried, np.take_along_axis(payload, order, axis=-1))


def test_render_perturb_reproducible():
    rcfg = RendererConfig(n_samples=16, n_importance=4, perturb=1)
    fns = _sphere_fns()
    rays_o, rays_d = _rays(n=16)
    mid = -jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    k = jax.random.PRNGKey(0)
    o1 = render(rcfg, fns, rays_o, rays_d, mid - 1, mid + 1,
                cos_anneal_ratio=jnp.asarray(0.5), perturb=True, key=k)
    o2 = render(rcfg, fns, rays_o, rays_d, mid - 1, mid + 1,
                cos_anneal_ratio=jnp.asarray(0.5), perturb=True, key=k)
    assert np.allclose(np.asarray(o1["color_fine"]), np.asarray(o2["color_fine"]))
