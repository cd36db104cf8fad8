"""Pallas fused trunk vs the pure-JAX reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_intrinsics_tpu.models import fields
from object_intrinsics_tpu.ops.pallas_film import film_trunk_pallas


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = fields.init_shape_network(key)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    w = fields.shape_style(params, z)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (2, 300, 3), minval=-1, maxval=1)
    return params, w, pts


def test_pallas_trunk_matches_reference(setup):
    params, w, pts = setup
    sdf_ref, feat_ref = fields.shape_forward(params, pts, w)
    sdf, feat, _ = film_trunk_pallas(
        params["pts_linears"], params["sigma_linear"], pts, w,
        with_grad=False, interpret=True,
    )
    # bf16_3x matmuls vs the CPU-exact f32 oracle: ~2^-17 relative error per
    # layer, amplified by gamma ~ 30 through 8 sin layers -> ~1e-3 worst case
    assert np.abs(np.asarray(sdf) - np.asarray(sdf_ref)).max() < 2e-3
    assert np.abs(np.asarray(feat) - np.asarray(feat_ref)).max() < 5e-3


def test_pallas_grad_matches_autodiff(setup):
    params, w, pts = setup
    _, grad_ref, _ = fields.shape_sdf_grad(params, pts, w)
    sdf, feat, grad = film_trunk_pallas(
        params["pts_linears"], params["sigma_linear"], pts, w,
        with_grad=True, interpret=True,
    )
    err = np.abs(np.asarray(grad) - np.asarray(grad_ref)).max()
    assert err < 5e-2, err  # gradients amplify the bf16_3x phase error further
    rel = err / np.abs(np.asarray(grad_ref)).max()
    assert rel < 5e-3, rel


def test_pallas_honors_fast_sin_escape_hatch(setup, monkeypatch):
    """OI_FAST_SIN=0 must cover the Pallas kernel too: with the flag off the
    in-kernel sin/cos are the exact transcendentals, so the trunk matches the
    (also-exact) pure-JAX path to bf16_3x matmul error only."""
    from object_intrinsics_tpu.ops import film_siren as fs

    params, w, pts = setup
    monkeypatch.setattr(fs, "FAST_SIN", False)
    sdf_ref, feat_ref = fields.shape_forward(params, pts, w)  # exact jnp.sin
    sdf, feat, grad = film_trunk_pallas(
        params["pts_linears"], params["sigma_linear"], pts, w,
        with_grad=True, interpret=True,
    )
    assert np.abs(np.asarray(sdf) - np.asarray(sdf_ref)).max() < 2e-3
    _, grad_ref, _ = fields.shape_sdf_grad(params, pts, w)
    assert np.abs(np.asarray(grad) - np.asarray(grad_ref)).max() < 5e-2


def test_pallas_path_via_fields_helper(setup):
    params, w, pts = setup
    sdf, feat, grad = fields.shape_forward_pallas(params, pts, w, with_grad=True, interpret=True)
    sdf_ref = fields.shape_sdf(params, pts, w)
    assert np.abs(np.asarray(sdf) - np.asarray(sdf_ref)).max() < 2e-3
    assert grad.shape == (2, 300, 3)
