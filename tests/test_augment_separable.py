import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_intrinsics_tpu.models.augment import AugmentPipe


def _img(bs=3, res=24, ch=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(bs, res, res, ch).astype(np.float32)


@pytest.mark.parametrize("cfg", [
    dict(scale=1, xint=1),
    dict(xflip=1, scale=1, xint=1, aniso=1, xfrac=1),
    dict(scale=1),
])
def test_separable_warp_matches_general(cfg):
    """The MXU-friendly separable warp must match the gather-based general
    path exactly for diagonal affines (same key => same G_inv)."""
    pipe = AugmentPipe(**cfg, p=1.0)
    assert pipe._warp_is_diagonal
    x = jnp.asarray(_img())
    key = jax.random.PRNGKey(42)
    out_sep = np.asarray(pipe(key, x))
    pipe.force_general_warp = True
    out_gen = np.asarray(pipe(key, x))
    assert np.abs(out_sep - out_gen).max() < 1e-4, np.abs(out_sep - out_gen).max()


def test_rotation_configs_use_general_path():
    pipe = AugmentPipe(rotate=1, scale=1, p=1.0)
    assert not pipe._warp_is_diagonal
    out = np.asarray(pipe(jax.random.PRNGKey(0), jnp.asarray(_img())))
    assert np.isfinite(out).all()


def test_separable_warp_gradients():
    pipe = AugmentPipe(scale=1, xint=1, p=1.0)
    x = jnp.asarray(_img())

    def f(img):
        return jnp.sum(pipe(jax.random.PRNGKey(1), img) ** 2)

    g_sep = np.asarray(jax.grad(f)(x))
    pipe.force_general_warp = True
    g_gen = np.asarray(jax.grad(f)(x))
    assert np.abs(g_sep - g_gen).max() < 1e-3, np.abs(g_sep - g_gen).max()
