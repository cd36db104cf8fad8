import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_intrinsics_tpu.ops import film_siren as fs
from object_intrinsics_tpu.ops.grid_sample import affine_grid, grid_sample
from object_intrinsics_tpu.ops.sample_pdf import sample_pdf
from object_intrinsics_tpu.ops.upfirdn2d import (
    WAVELETS,
    downsample2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)


# ---------------------------------------------------------------- sample_pdf

def _sample_pdf_numpy(bins, weights, n, det=True):
    """Independent numpy oracle following the NeRF inverse-CDF convention
    (neus/models/renderer.py:44-74)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    assert det
    u = np.linspace(0.5 / n, 1 - 0.5 / n, n)
    u = np.broadcast_to(u, (*cdf.shape[:-1], n)).copy()
    out = np.zeros_like(u)
    for i in np.ndindex(*cdf.shape[:-1]):
        inds = np.searchsorted(cdf[i], u[i], side="right")
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, cdf.shape[-1] - 1)
        cdf_b, cdf_a = cdf[i][below], cdf[i][above]
        bins_b, bins_a = bins[i][below], bins[i][above]
        denom = cdf_a - cdf_b
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[i] - cdf_b) / denom
        out[i] = bins_b + t * (bins_a - bins_b)
    return out


def test_sample_pdf_matches_oracle():
    rng = np.random.RandomState(0)
    bins = np.sort(rng.rand(8, 16).astype(np.float32), axis=-1)
    weights = rng.rand(8, 15).astype(np.float32)
    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 4, det=True))
    ref = _sample_pdf_numpy(bins, weights, 4)
    assert np.allclose(ours, ref, atol=1e-5)


def test_sample_pdf_concentrates_mass():
    bins = jnp.linspace(0, 1, 17)[None].repeat(4, 0)
    weights = jnp.zeros((4, 16)).at[:, 8].set(100.0)
    s = np.asarray(sample_pdf(bins, weights, 8, det=True))
    assert np.all(s > 0.45) and np.all(s < 0.62)


# ---------------------------------------------------------------- upfirdn2d

def _torch_upfirdn2d_ref(x, f, up, down, padding, flip_filter=False, gain=1.0):
    """Oracle via torch ops following the documented upfirdn semantics."""
    import torch
    import torch.nn.functional as F

    x = torch.tensor(np.transpose(x, (0, 3, 1, 2)))  # NHWC -> NCHW
    f = torch.tensor(np.asarray(f, dtype=np.float32))
    bs, c, h, w = x.shape
    upx = upy = up
    padx0, padx1, pady0, pady1 = padding
    x = x.reshape(bs, c, h, 1, w, 1)
    x = F.pad(x, [0, upx - 1, 0, 0, 0, upy - 1])
    x = x.reshape(bs, c, h * upy, w * upx)
    x = F.pad(x, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)])
    x = x[:, :, max(-pady0, 0) : x.shape[2] - max(-pady1, 0), max(-padx0, 0) : x.shape[3] - max(-padx1, 0)]
    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = f.flip(list(range(f.ndim)))
    f = f[None, None].repeat(c, 1, *([1] * f.ndim))
    if f.ndim == 4:
        x = F.conv2d(x, f, groups=c)
    else:
        x = F.conv2d(x, f.unsqueeze(2), groups=c)
        x = F.conv2d(x, f.unsqueeze(3), groups=c)
    x = x[:, :, ::down, ::down]
    return np.transpose(x.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("up,down,pad", [(1, 1, (2, 2, 2, 2)), (2, 1, (3, 3, 3, 3)), (1, 2, (1, 1, 1, 1)), (2, 2, (4, 2, 3, 1)), (1, 1, (-1, 2, 0, -2))])
def test_upfirdn2d_vs_torch(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    f = setup_filter(WAVELETS["sym6"])  # separable 12-tap
    ours = np.asarray(upfirdn2d(jnp.asarray(x), f, up=up, down=down, padding=pad))
    ref = _torch_upfirdn2d_ref(x, f, up, down, pad)
    assert ours.shape == ref.shape
    assert np.allclose(ours, ref, atol=1e-4), np.abs(ours - ref).max()


def test_upsample_downsample_roundtrip_dc():
    # constant image survives up+down through the normalized lowpass
    x = jnp.ones((1, 16, 16, 1))
    f = setup_filter(WAVELETS["sym6"])
    up = upsample2d(x, f, up=2)
    assert up.shape == (1, 32, 32, 1)
    down = downsample2d(up, f, down=2)
    assert down.shape == (1, 16, 16, 1)
    interior = np.asarray(down)[0, 6:-6, 6:-6, 0]
    assert np.allclose(interior, 1.0, atol=1e-3)


# --------------------------------------------------------------- grid_sample

def test_grid_sample_vs_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 11, 3).astype(np.float32)
    theta = np.stack(
        [
            np.array([[0.8, 0.1, 0.05], [-0.1, 1.1, -0.2]], dtype=np.float32),
            np.array([[1.3, 0.0, 0.3], [0.0, 0.7, 0.0]], dtype=np.float32),
        ]
    )
    out_h, out_w = 7, 9
    grid = affine_grid(jnp.asarray(theta), (2, out_h, out_w))
    ours = np.asarray(grid_sample(jnp.asarray(x), grid))

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    grid_t = F.affine_grid(torch.tensor(theta), (2, 3, out_h, out_w), align_corners=False)
    ref = F.grid_sample(xt, grid_t, mode="bilinear", padding_mode="zeros", align_corners=False)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    assert np.allclose(ours, ref, atol=1e-5), np.abs(ours - ref).max()


def test_grid_sample_second_order_differentiable():
    x = jnp.ones((1, 8, 8, 1))
    theta = jnp.asarray([[[1.0, 0.0, 0.1], [0.0, 1.0, 0.0]]])

    def f(img):
        grid = affine_grid(theta, (1, 8, 8))
        return jnp.sum(grid_sample(img, grid) ** 2)

    g = jax.grad(f)(x)
    gg = jax.grad(lambda img: jnp.sum(jax.grad(f)(img) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(gg)).all()


# --------------------------------------------------------------- film siren

def test_film_siren_matches_torch_formula():
    """Oracle: the FiLM-SIREN forward written independently in torch."""
    import torch

    key = jax.random.PRNGKey(0)
    p = fs.init_film_siren(key, 3, 16, 8)
    x = np.random.RandomState(0).randn(2, 5, 3).astype(np.float32)
    s = np.random.RandomState(1).randn(2, 8).astype(np.float32)
    ours = np.asarray(fs.apply_film_siren(p, jnp.asarray(x), jnp.asarray(s)))

    W = torch.tensor(np.asarray(p["w"]))
    b = torch.tensor(np.asarray(p["b"]))
    gw, gb = torch.tensor(np.asarray(p["gamma"]["w"])), torch.tensor(np.asarray(p["gamma"]["b"]))
    bw, bb = torch.tensor(np.asarray(p["beta"]["w"])), torch.tensor(np.asarray(p["beta"]["b"]))
    xt, st = torch.tensor(x), torch.tensor(s)
    gamma = 15.0 * (st @ gw + gb) + 30.0
    beta = 0.25 * (st @ bw + bb)
    ref = torch.sin(gamma[:, None, :] * (xt @ W + b) + beta[:, None, :]).numpy()
    assert np.allclose(ours, ref, atol=1e-5)


def test_sphere_init_checkpoint_semantics():
    """The converted sphere_init weights must evaluate to ~|x| - 0.5."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "sphere_init.npz")
    if not os.path.exists(path):
        pytest.skip("sphere_init.npz not converted")
    from object_intrinsics_tpu.models import fields

    params = fields.init_shape_network(jax.random.PRNGKey(0), checkpoint_path=path)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    w = fields.shape_style(params, z)
    rng = np.random.RandomState(0)
    dirs = rng.randn(32, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rs = rng.uniform(0.1, 1.2, size=(32, 1)).astype(np.float32)
    pts = jnp.asarray((rs * dirs)[None].repeat(2, 0))
    sdf = np.asarray(fields.shape_sdf(params, pts, w))[..., 0]
    expected = rs[:, 0] - 0.5
    assert np.abs(sdf - expected).mean() < 0.08

    # eikonal property: |grad| ~ 1 inside the unit sphere
    _, grads, _ = fields.shape_sdf_grad(params, pts, w)
    gn = np.linalg.norm(np.asarray(grads), axis=-1)
    assert np.abs(gn - 1.0).mean() < 0.2


def test_shape_hessian_matches_finite_differences():
    """shape_sdf_grad_hessian (fwd-over-rev) vs central differences of the
    analytic gradient; laplacian = Hessian diagonal. Reference analog:
    src/models/fields.py:104-146 second_order/laplacian."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_intrinsics_tpu.models import fields

    key = jax.random.PRNGKey(0)
    p = fields.init_shape_network(key, D=3, W=32, style_dim=8)
    pts = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, 3)) * 0.4
    w = jax.random.normal(jax.random.fold_in(key, 2), (2, 8))

    sdf, grads, feat, hess = fields.shape_sdf_grad_hessian(p, pts, w)
    assert hess.shape == (2, 5, 3, 3)
    # Hessian symmetry
    np.testing.assert_allclose(np.asarray(hess), np.asarray(hess).swapaxes(-1, -2),
                               rtol=1e-4, atol=1e-4)
    # central differences of the exact gradient
    eps = 1e-3
    for i in range(3):
        e = jnp.zeros_like(pts).at[..., i].set(eps)
        gp = fields.shape_sdf_grad(p, pts + e, w)[1]
        gm = fields.shape_sdf_grad(p, pts - e, w)[1]
        fd = (np.asarray(gp) - np.asarray(gm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(hess[..., i]), fd, rtol=1e-2, atol=1e-3)
    *_, diag = fields.shape_sdf_grad_hessian(p, pts, w, laplacian=True)
    np.testing.assert_allclose(np.asarray(diag),
                               np.diagonal(np.asarray(hess), axis1=-2, axis2=-1),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# fast_sin: the polynomial sine that replaced jnp.sin in the SIREN trunk
# (ops/film_siren.py). The reference uses exact torch.sin
# (src/third_party/stylesdf/volume_renderer.py:50-61), so these tests pin the
# substitution's accuracy — value, first derivative (eikonal/normals), and
# second derivative (R1/grad-of-grad) — across the full guarded domain.
# ---------------------------------------------------------------------------


def _fast_sin_grid(lo, hi, n):
    u32 = np.linspace(lo, hi, n).astype(np.float32)
    return u32, u32.astype(np.float64)


@pytest.mark.parametrize("lo,hi", [(-200.0, 200.0), (-fs.PHASE_REDUCTION_MAX, fs.PHASE_REDUCTION_MAX)])
def test_fast_sin_value_accuracy(lo, hi):
    u32, u64 = _fast_sin_grid(lo, hi, 400001)
    got = np.asarray(fs.fast_sin(jnp.asarray(u32)))
    assert np.max(np.abs(got - np.sin(u64))) < 8e-7


@pytest.mark.parametrize("lo,hi", [(-200.0, 200.0), (-fs.PHASE_REDUCTION_MAX, fs.PHASE_REDUCTION_MAX)])
def test_fast_sin_derivative_accuracy(lo, hi):
    u32, u64 = _fast_sin_grid(lo, hi, 40001)
    d1 = np.asarray(jax.vmap(jax.grad(fs.fast_sin))(jnp.asarray(u32)))
    assert np.max(np.abs(d1 - np.cos(u64))) < 1e-5


def test_fast_sin_grad_of_grad():
    # R1 and eikonal-through-augment differentiate the trunk twice.
    u32, u64 = _fast_sin_grid(-200.0, 200.0, 20001)
    d2 = np.asarray(jax.vmap(jax.grad(jax.grad(fs.fast_sin)))(jnp.asarray(u32)))
    assert np.max(np.abs(d2 + np.sin(u64))) < 1.5e-4


def test_fast_sin_reduction_holds_past_guard():
    # The Cody-Waite reduction stays exact well past the declared guard
    # (headroom: the guard must trip before accuracy actually degrades).
    u32, u64 = _fast_sin_grid(-2e4, 2e4, 200001)
    got = np.asarray(fs.fast_sin(jnp.asarray(u32)))
    assert np.max(np.abs(got - np.sin(u64))) < 1e-6


def test_fast_sin_phase_guard_trips(monkeypatch):
    # DEBUG-mode guard: phases beyond PHASE_REDUCTION_MAX must fail loudly,
    # in-range phases must pass — including under jax.grad (the callback
    # rides through AD on a stop_gradient'd scalar).
    monkeypatch.setattr(fs, "_PHASE_CHECK", True)
    key = jax.random.PRNGKey(0)
    p = fs.init_film_siren(key, 3, 8, 4)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 5, 3))
    style = jax.random.normal(jax.random.fold_in(key, 2), (1, 4))

    def loss(x):
        return jnp.sum(fs.apply_film_siren(p, x, style))

    jax.grad(loss)(x)  # in-range: must not raise
    with pytest.raises(FloatingPointError, match="reduction range"):
        jax.block_until_ready(fs.apply_film_siren(p, x * 1e6, style))
        # debug.callback exceptions surface asynchronously (a callback
        # thread records them; block_until_ready of the VALUE can win the
        # race under suite load — observed as a DID-NOT-RAISE flake).
        # effects_barrier is the documented sync point for side effects.
        jax.effects_barrier()


def test_resnet_block_matches_reference_torch():
    """ResnetBlock (config-selectable, unused by shipped configs) vs the
    reference torch module (src/models/discriminator.py:8-46) with copied
    weights, plus torch-default init bounds."""
    import os
    import sys

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference missing")
    import torch

    sys.path.insert(0, "/root/reference")
    from src.models.discriminator import ResnetBlock as TorchBlock

    from object_intrinsics_tpu.models.discriminator import ResnetBlock

    blk = ResnetBlock(fin=8, fout=16, is_bias=True)
    p = blk.init(jax.random.PRNGKey(0))
    # torch-default kaiming-uniform bounds: U(+-1/sqrt(fan_in))
    w0 = np.asarray(p["conv_0"]["w"])
    assert np.abs(w0).max() <= 1.0 / np.sqrt(8 * 9) + 1e-6
    assert "conv_s" in p  # learned shortcut when fin != fout

    ref = TorchBlock(8, 16, is_bias=True)
    with torch.no_grad():
        for ours, theirs in [("conv_0", ref.conv_0), ("conv_1", ref.conv_1),
                             ("conv_s", ref.conv_s)]:
            theirs.weight.copy_(
                torch.tensor(np.asarray(p[ours]["w"]).transpose(3, 2, 0, 1)))
            if "b" in p[ours]:
                theirs.bias.copy_(torch.tensor(np.asarray(p[ours]["b"])))

    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 12, 8).astype(np.float32)
    ours_out = np.asarray(blk.apply(p, jnp.asarray(x)))
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        ours_out, ref_out.transpose(0, 2, 3, 1), atol=2e-5)


def test_scanned_trunk_matches_unrolled(monkeypatch):
    """OI_SCAN_TRUNK=1 (lax.scan over the shape-identical trunk layers 1..D-1,
    an executable-size lever for the axon tunnel's load-bound warmup) must be
    a pure re-scheduling: values, parameter grads, and point grads (the
    normals/eikonal path) match the unrolled trunk."""
    key = jax.random.PRNGKey(7)
    layers = fs.init_siren_trunk(key, depth=8, in_dim=3, width=32, style_dim=16)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 64, 3))
    style = jax.random.normal(jax.random.fold_in(key, 2), (2, 16))

    def loss(layers, x, fn):
        return jnp.sum(fn(layers, x, style) ** 2)

    monkeypatch.delenv("OI_SCAN_TRUNK", raising=False)
    ref_out = fs.apply_siren_trunk(layers, x, style)
    ref_gp, ref_gx = jax.grad(loss, argnums=(0, 1))(layers, x, fs.apply_siren_trunk)

    monkeypatch.setenv("OI_SCAN_TRUNK", "1")
    got_out = fs.apply_siren_trunk(layers, x, style)
    got_gp, got_gx = jax.grad(loss, argnums=(0, 1))(layers, x, fs.apply_siren_trunk)

    # not bitwise: the in-loop dot schedules differently from the unrolled
    # one, and the sin chain amplifies the last-ulp difference (~4e-6 on
    # values). Grads use the repo's noise-floor criterion (max abs diff as a
    # fraction of the leaf max) — per-element rtol is meaningless on
    # near-cancellation entries.
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=3e-5)

    def leaf_close(a, b, frac=1e-4):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() <= frac * scale, (
            np.abs(a - b).max(), scale)

    leaf_close(got_gx, ref_gx)
    for a, b in zip(jax.tree.leaves(got_gp), jax.tree.leaves(ref_gp)):
        leaf_close(a, b)
