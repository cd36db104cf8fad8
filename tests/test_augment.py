import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_intrinsics_tpu.models.augment import AugmentPipe


def _smooth_image(bs=2, res=32, ch=3):
    y, x = np.mgrid[0:res, 0:res] / res
    base = np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / 0.05)
    img = np.stack([base * (i + 1) / ch for i in range(ch)], axis=-1)
    return np.repeat(img[None], bs, 0).astype(np.float32)


def test_geometric_path_identity_when_p_zero():
    """With p=0 every transform gates to identity; the pad/upsample/warp/
    downsample pipeline should reconstruct the image almost exactly."""
    pipe = AugmentPipe(scale=1, xint=1, p=0.0)
    x = _smooth_image()
    out = np.asarray(pipe(jax.random.PRNGKey(0), jnp.asarray(x)))
    assert out.shape == x.shape
    assert np.abs(out - x).max() < 0.02, np.abs(out - x).max()


def test_augment_deterministic_given_key():
    pipe = AugmentPipe(scale=1, xint=1, p=1.0)
    x = jnp.asarray(_smooth_image())
    a = np.asarray(pipe(jax.random.PRNGKey(1), x))
    b = np.asarray(pipe(jax.random.PRNGKey(1), x))
    c = np.asarray(pipe(jax.random.PRNGKey(2), x))
    assert np.allclose(a, b)
    assert not np.allclose(a, c)


def test_augment_single_channel():
    pipe = AugmentPipe(scale=1, xint=1, p=1.0)
    x = jnp.asarray(_smooth_image(ch=1))
    out = np.asarray(pipe(jax.random.PRNGKey(0), x))
    assert out.shape == x.shape


def test_xint_translates_content():
    """xint with p=1 always translates by up to 12.5% of the image."""
    pipe = AugmentPipe(xint=1, p=1.0)
    res = 32
    x = np.zeros((8, res, res, 3), dtype=np.float32)
    x[:, res // 2, res // 2, :] = 1.0  # delta at center
    out = np.asarray(pipe(jax.random.PRNGKey(3), jnp.asarray(x)))
    centers = []
    for i in range(8):
        idx = np.unravel_index(np.argmax(out[i, :, :, 0]), (res, res))
        centers.append(idx)
    centers = np.asarray(centers)
    # at least some samples moved, none farther than xint_max * res (+filter blur)
    assert (np.abs(centers - res // 2) <= res * 0.125 + 2).all()
    assert (centers != res // 2).any()


def test_color_ops_run_and_differ():
    pipe = AugmentPipe(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1, p=1.0)
    x = jnp.asarray(_smooth_image())
    out = np.asarray(pipe(jax.random.PRNGKey(4), x))
    assert out.shape == x.shape
    assert not np.allclose(out, np.asarray(x))


def test_imgfilter_noise_cutout():
    pipe = AugmentPipe(imgfilter=1, noise=1, cutout=1, p=1.0)
    x = jnp.asarray(_smooth_image())
    out = np.asarray(pipe(jax.random.PRNGKey(5), x))
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    # cutout with p=1 zeroes a patch in every sample
    assert (np.abs(out) < 1e-6).mean() > 0.05


def test_gradients_flow_through_pipe():
    pipe = AugmentPipe(scale=1, xint=1, p=1.0)
    x = jnp.asarray(_smooth_image())

    def f(img):
        return jnp.sum(pipe(jax.random.PRNGKey(0), img) ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    # second order (the R1-through-augmentation requirement)
    gg = jax.grad(lambda img: jnp.sum(jax.grad(f)(img) ** 2))(x)
    assert np.isfinite(np.asarray(gg)).all()


def test_full_reference_config_statistics():
    """scale=1,xint=1,p=1 (configs/train.yaml:83-85): output stays in a sane
    range and differs from input for nearly all samples."""
    pipe = AugmentPipe(scale=1, xint=1, p=1.0)
    x = jnp.asarray(_smooth_image(bs=16))
    out = np.asarray(pipe(jax.random.PRNGKey(6), x))
    per_sample_diff = np.abs(out - np.asarray(x)).mean(axis=(1, 2, 3))
    assert (per_sample_diff > 1e-4).mean() > 0.9
    assert out.min() > -0.5 and out.max() < 1.5


def test_inner_gradient_consistent_inside_double_grad():
    """Regression for the axon-TPU grad-of-grad miscompile: the inner
    gradient computed inside an R1-style composed program must equal the
    same gradient computed standalone (this guards the jaxpr structure; the
    TPU backend comparison lives in the bisection scripts)."""
    pipe = AugmentPipe(scale=1, xint=1, p=1.0)
    x = jnp.asarray(_smooth_image(bs=1, res=32))
    key = jax.random.PRNGKey(9)
    w = jnp.asarray(np.random.RandomState(0).randn(32 * 32 * 3).astype(np.float32) * 0.01)

    def head(xi):
        return jnp.sum(pipe(key, xi).reshape(-1) * w)

    gx_direct = jax.jit(jax.grad(head))(x)

    def reg_and_gx(xx):
        gx = jax.grad(head)(xx)
        return jnp.sum(gx**2), gx

    _, gx_composed = jax.jit(reg_and_gx)(x)
    assert np.allclose(np.asarray(gx_direct), np.asarray(gx_composed), atol=1e-6)


def test_static_margin_bounds():
    """The 5-sigma static apron: shipped config gets the measured 92 px;
    amplified-translation configs (xfrac composes inside the scale inverse)
    bound out at the reference's clamp ceiling; overrides behave."""
    from object_intrinsics_tpu.models import augment as aug_mod
    from object_intrinsics_tpu.models.augment import AugmentPipe

    assert AugmentPipe(scale=1, xint=1, p=1)._static_margin(128) == 92
    # xfrac's 5-sigma translate (80 px) alone fits; with scale it is
    # amplified by the extent and must hit the ceiling
    assert AugmentPipe(xfrac=1, p=1)._static_margin(128) == 92
    assert AugmentPipe(scale=1, xfrac=1, p=1)._static_margin(128) == 127
    assert AugmentPipe(scale=1, xint=1, rotate=1, aniso=1, p=1)._static_margin(128) == 127
    # identity pipe still keeps the filter-support apron
    assert AugmentPipe(p=1)._static_margin(128) == 12

    old = aug_mod._AUG_MARGIN
    try:
        aug_mod._AUG_MARGIN = "exact"
        assert AugmentPipe(scale=1, xint=1, p=1)._static_margin(128) == 127
        aug_mod._AUG_MARGIN = "40"
        assert AugmentPipe(scale=1, xint=1, p=1)._static_margin(128) == 40
        # explicit overrides are floored at the filter support (sym6 taps):
        # a 2-px apron would under-pad EVERY sample, not just the 5-sigma tail
        aug_mod._AUG_MARGIN = "2"
        assert AugmentPipe(scale=1, xint=1, p=1)._static_margin(128) == 12
    finally:
        aug_mod._AUG_MARGIN = old


def test_margin_covers_typical_draws_exactly():
    """Content parity: a typical draw warps identically under the 5-sigma
    apron and the exact ceiling (the apron only matters past 5 sigma)."""
    from object_intrinsics_tpu.models import augment as aug_mod
    from object_intrinsics_tpu.models.augment import AugmentPipe

    pipe = AugmentPipe(scale=1, xint=1, p=1)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    old = aug_mod._AUG_MARGIN
    try:
        aug_mod._AUG_MARGIN = ""
        y_bound = pipe(jax.random.PRNGKey(7), x)
        aug_mod._AUG_MARGIN = "exact"
        y_exact = pipe(jax.random.PRNGKey(7), x)
    finally:
        aug_mod._AUG_MARGIN = old
    # the two aprons imply different normalization constants (2/in_w), so
    # agreement is to float32 grid-coordinate rounding (~1e-5), not bitwise
    np.testing.assert_allclose(np.asarray(y_bound), np.asarray(y_exact), atol=1e-4)
