"""FiLM-SIREN field backbones as pure param-tree functions.

Rebuilds the reference's SIREN stack (src/third_party/stylesdf/volume_renderer.py:12-102
and MappingLinear, src/third_party/stylesdf/model.py:32-61) in functional JAX.
The reference's CUDA ``fused_leaky_relu`` (stylesdf/op/fused_act.py) is a plain
fused expression here — XLA fuses bias+LeakyReLU into the matmul epilogue on
TPU, so no custom kernel is needed for the mapping MLP.

Weight layout: (in_dim, out_dim) so the forward is ``x @ w + b`` (row-major
activations on the MXU). The torch checkpoint converter transposes.

All point MLPs take activations shaped (bs, n_pts, features) with a per-batch
style vector (bs, style_dim); FiLM gamma/beta broadcast over n_pts. This keeps
every matmul a single large (bs*n, 128) x (128, 128) contraction — the MXU-
friendly formulation of the reference's (bs, n, 1, 1, C) reshape dance
(src/models/fields.py:55).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

LRELU_SLOPE = 0.2

# Matmul precision for the field MLPs. TPU 'default' runs fp32 operands as a
# single bf16 MXU pass — fast, but SIREN phases (gamma ~ 30) lose ~0.1 rad of
# accuracy, which visibly degrades the SDF. 'high' (bf16_3x) restores ~fp32
# phase accuracy at ~1/3 MXU rate; 'highest' (bf16_6x) is exact fp32.
# Override with OI_MATMUL_PRECISION=default|high|highest.
MATMUL_PRECISION = __import__("os").environ.get("OI_MATMUL_PRECISION", "high")


def _dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, w, precision=MATMUL_PRECISION)


# --------------------------------------------------------------------------
# Fast sine: XLA's f32 `sin` on TPU costs ~30 ps/element (measured: 9.9 ms
# for the 8-layer trunk volume at 327k points — the single largest cost in a
# train step). A Cody-Waite range reduction + degree-11 odd minimax
# polynomial evaluates the same volume in ~5 ms standalone and fuses into the
# matmul epilogue, making the trunk matmul-bound instead of sin-bound.
#
# Accuracy: |err| < 8e-7 over |u| <= 200 (SIREN phases are |u| ~ gamma*|x|
# ~ 100; the reduction stays exact for |u| < ~1e4). The derivative is the
# AD'd polynomial — |poly'(r) - cos| < 9e-6 — so every autodiff order the
# R1/eikonal objectives need is cheap VPU mul/add instead of a `cos` call.
# Set OI_FAST_SIN=0 to fall back to jnp.sin.
# --------------------------------------------------------------------------

FAST_SIN = __import__("os").environ.get("OI_FAST_SIN", "1") != "0"

# Validity bound of the Cody-Waite reduction: k*CW1 stays exactly
# representable while k < 2^15 (CW1 carries 9 mantissa bits), i.e. |u| up to
# ~2e5; we declare 1e4 — an order of magnitude above any phase a trained
# FiLM gamma (~30-45) times |x|<=sqrt(3) can produce — as the guarded
# domain. tests/test_ops.py pins |err|<8e-7 (value), <9e-6 (grad),
# <1.5e-4 (grad-of-grad) across it.
PHASE_REDUCTION_MAX = 1.0e4
_PHASE_CHECK = __import__("os").environ.get("DEBUG") == "1"


def _phase_range_cb(max_abs) -> None:
    if float(max_abs) > PHASE_REDUCTION_MAX:
        raise FloatingPointError(
            f"FiLM phase magnitude {float(max_abs):.3e} exceeds fast_sin's "
            f"guarded reduction range ({PHASE_REDUCTION_MAX:.0e}). Either the "
            "FiLM gammas blew up (check training health) or set OI_FAST_SIN=0 "
            "to use exact jnp.sin."
        )


def _phase_guard(phase: jnp.ndarray) -> jnp.ndarray:
    """DEBUG-mode range check for the polynomial reduction.

    Host callbacks are unsupported on the axon TPU tunnel (its
    default_backend still reports 'tpu'; detect it via the jax_platforms
    config the environment pins). There the guard NaN-poisons the phases
    instead — DEBUG=1 also enables jax_debug_nans, which converts the
    poison into a loud error at the first out-of-range phase (a NaN source
    traced to fast_sin means: check FiLM gammas, or set OI_FAST_SIN=0)."""
    max_abs = jax.lax.stop_gradient(jnp.max(jnp.abs(phase)))
    if "axon" in (jax.config.jax_platforms or ""):
        return jnp.where(max_abs > PHASE_REDUCTION_MAX, jnp.nan, 1.0) * phase
    jax.debug.callback(_phase_range_cb, max_abs)
    return phase

# minimax-grade fit of sin(r)/r in powers of r^2 on [-pi, pi] (max err 1.9e-7)
_SIN_COEF = (
    0.9999999381599484,
    -0.16666621097161648,
    0.008332791502135892,
    -0.00019817630968735643,
    2.7088311610483324e-06,
    -2.0698134675742316e-08,
)
_INV_2PI = 0.15915494309189535
_CW1 = 6.28125  # 2*pi = CW1 + CW2; CW1 has 9 trailing zero bits so k*CW1 is exact
_CW2 = 0.0019353071795864769


def fast_sin(u: jnp.ndarray) -> jnp.ndarray:
    if not FAST_SIN:
        return jnp.sin(u)
    k = jnp.round(u * _INV_2PI)
    r = (u - k * _CW1) - k * _CW2
    r2 = r * r
    p = jnp.asarray(_SIN_COEF[-1], dtype=u.dtype)
    for c in _SIN_COEF[-2::-1]:
        p = p * r2 + c
    return r * p


def _kaiming_normal(key, in_dim, out_dim, a=LRELU_SLOPE, scale=1.0):
    gain = np.sqrt(2.0 / (1.0 + a * a))
    std = scale * gain / np.sqrt(in_dim)
    return std * jax.random.normal(key, (in_dim, out_dim), dtype=jnp.float32)


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


# --------------------------------------------------------------------------
# LinearLayer (volume_renderer.py:12-30): out = std_init * (x @ w + b) + bias_init
# --------------------------------------------------------------------------

def init_linear(key, in_dim: int, out_dim: int, *, freq_init=False, is_first=False) -> Params:
    kw, kb = jax.random.split(key)
    if is_first:
        w = _uniform(kw, (in_dim, out_dim), 1.0 / in_dim)
    elif freq_init:
        w = _uniform(kw, (in_dim, out_dim), np.sqrt(6.0 / in_dim) / 25.0)
    else:
        w = _kaiming_normal(kw, in_dim, out_dim, scale=0.25)
    b = _uniform(kb, (out_dim,), np.sqrt(1.0 / in_dim))
    return {"w": w, "b": b}


def apply_linear(p: Params, x: jnp.ndarray, std_init: float = 1.0, bias_init: float = 0.0) -> jnp.ndarray:
    """``std_init * (x @ w + b) + bias_init`` — the constants are *not* params
    (the reference stores them as plain attributes, volume_renderer.py:24-28)."""
    out = _dot(x, p["w"]) + p["b"]
    if std_init != 1.0:
        out = std_init * out
    if bias_init != 0.0:
        out = out + bias_init
    return out


# --------------------------------------------------------------------------
# MappingLinear (model.py:32-61): x @ w, then fused lrelu(x + b) * scale(=1)
# --------------------------------------------------------------------------

def init_mapping_mlp(key, dim: int, n_layers: int = 3) -> List[Params]:
    layers = []
    for k in jax.random.split(key, n_layers):
        kw, kb = jax.random.split(k)
        layers.append(
            {
                "w": _kaiming_normal(kw, dim, dim, scale=1.0),
                "b": _uniform(kb, (dim,), np.sqrt(1.0 / dim)),
            }
        )
    return layers


def apply_mapping_mlp(layers: List[Params], z: jnp.ndarray) -> jnp.ndarray:
    """Latent z -> style w. lrelu(z @ w + b) per layer, slope 0.2, scale 1."""
    x = z
    for p in layers:
        x = jax.nn.leaky_relu(_dot(x, p["w"]) + p["b"], LRELU_SLOPE)
    return x


# --------------------------------------------------------------------------
# FiLMSiren (volume_renderer.py:33-61)
# --------------------------------------------------------------------------

def init_film_siren(key, in_dim: int, out_dim: int, style_dim: int, *, is_first=False) -> Params:
    kw, kb, kg, kbe = jax.random.split(key, 4)
    if is_first:
        w = _uniform(kw, (in_dim, out_dim), 1.0 / in_dim)
    else:
        w = _uniform(kw, (in_dim, out_dim), np.sqrt(6.0 / in_dim) / 25.0)
    b = _uniform(kb, (out_dim,), np.sqrt(1.0 / in_dim))
    gamma = init_linear(kg, style_dim, out_dim)
    beta = init_linear(kbe, style_dim, out_dim)
    return {"w": w, "b": b, "gamma": gamma, "beta": beta}


def film_gamma_beta(p: Params, style: jnp.ndarray):
    """Per-batch FiLM modulation: gamma = 15*(s@wg+bg)+30, beta = 0.25*(s@wb+bb)
    (gamma/beta LinearLayer std_init/bias_init, volume_renderer.py:47-48)."""
    gamma = apply_linear(p["gamma"], style, std_init=15.0, bias_init=30.0)
    beta = apply_linear(p["beta"], style, std_init=0.25)
    return gamma, beta


def fold_film(p: Params, style: jnp.ndarray):
    """Fold the FiLM modulation into the affine layer:

        sin(gamma (x W + b) + beta) == sin(x (W diag(gamma)) + (gamma b + beta))

    gamma/beta are per-batch-sample constants over all points, so folding
    removes two VPU ops per activation element from the hot loop (both
    directions of autodiff) at the cost of one tiny (in,out) scale per layer.
    Returns (w_g (bs, in, out), b_g (bs, out)).
    """
    gamma, beta = film_gamma_beta(p, style)
    w_g = p["w"][None, :, :] * gamma[:, None, :]
    b_g = p["b"][None, :] * gamma + beta
    return w_g, b_g


def apply_film_siren(p: Params, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """x: (bs, n, in_dim) or 2D (n, in_dim) with bs=1 style; style:
    (bs, style_dim) -> matching (bs, n, out_dim) / (n, out_dim).

    The 2D form is the bs=1 generator render: plain GEMMs end-to-end —
    batched dots at b=1 make XLA pick batch-major T(1,128) layouts for the
    327k-row activations and pay relayout copies in both autodiff
    directions (profiler, r3)."""
    w_g, b_g = fold_film(p, style)
    if x.ndim == 2:
        phase = jnp.matmul(x, w_g[0], precision=MATMUL_PRECISION) + b_g[0]
        if _PHASE_CHECK and FAST_SIN:
            phase = _phase_guard(phase)
        return fast_sin(phase)
    h = jnp.einsum("bni,bio->bno", x, w_g, precision=MATMUL_PRECISION)
    phase = h + b_g[:, None, :]
    if _PHASE_CHECK and FAST_SIN:
        # DEBUG=1: fail loudly if trained gammas push phases outside the
        # polynomial's guarded reduction range (grad-safe).
        phase = _phase_guard(phase)
    return fast_sin(phase)


# --------------------------------------------------------------------------
# The 8-layer SIREN trunk used by the shape network
# --------------------------------------------------------------------------

def init_siren_trunk(key, depth: int, in_dim: int, width: int, style_dim: int) -> List[Params]:
    keys = jax.random.split(key, depth)
    layers = [init_film_siren(keys[0], in_dim, width, style_dim, is_first=True)]
    for k in keys[1:]:
        layers.append(init_film_siren(k, width, width, style_dim))
    return layers


# (A graded-precision tail — 'default' matmuls for the last k layers — was
# measured in r3 and removed: the trunk is VPU-sin-bound, so it saved ~0 ms
# while corrupting normals by 18-83 deg. tools/bench_trunk.py; DESIGN.md.)


def apply_siren_trunk(layers: List[Params], x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    if _scan_trunk_enabled() and len(layers) >= 3:
        return _apply_siren_trunk_scanned(layers, x, style)
    for p in layers:
        x = apply_film_siren(p, x, style)
    return x


def _scan_trunk_enabled() -> bool:
    """OI_SCAN_TRUNK=1: run trunk layers 1..D-1 as one lax.scan body.

    Layers 1..D-1 are shape-identical (width -> width), so the unrolled
    form emits D-1 copies of the same matmul+sin code into the step program
    — repeated again in every autodiff pass and every render. Scanning
    replaces them with ONE traced body over stacked (D-1, ...) weights,
    shrinking the compiled executable. That matters on the axon tunnel,
    where BENCH warmup is dominated by executable LOAD at ~0.3 MB/s
    (docs/DESIGN.md warmup anatomy) — smaller program, faster start.
    Math is unchanged (same per-layer ops/shapes/precision); default off
    until the runtime cost on real TPU is measured (scan bounds XLA's
    cross-layer scheduling freedom).
    """
    import os

    return os.environ.get("OI_SCAN_TRUNK", "0") == "1"


def _apply_siren_trunk_scanned(layers: List[Params], x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    x = apply_film_siren(layers[0], x, style)  # in_dim differs; stays unrolled
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layers[1:])

    def body(h, p):
        return apply_film_siren(p, h, style), None

    x, _ = jax.lax.scan(body, x, stacked)
    return x
