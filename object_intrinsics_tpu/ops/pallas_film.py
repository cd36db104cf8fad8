"""Pallas TPU kernel: fused FiLM-SIREN trunk (8 layers + SDF head), with an
optional in-kernel analytic point-gradient.

Design (informed by on-chip floor measurements):
  * FiLM gamma folds into the layer weights outside the kernel
    (ops/film_siren.fold_film), so the inner loop is pure
    ``sin(x @ Wg + bg)`` — no per-point modulation ops;
  * matmuls run as an explicit bf16_3x split (x_hi@w_hi + x_hi@w_lo +
    x_lo@w_hi) with fp32 accumulation — f32-grade SIREN phase accuracy at
    MXU speed, independent of Mosaic's precision-attribute support;
  * the whole 8-layer chain stays VMEM-resident per point tile — one HBM
    read of the points, one write of the outputs;
  * the analytic point-gradient (the SDF normal) is an in-kernel reverse
    sweep over cos(arg) values stored in VMEM scratch: the SDF is scalar per
    point, so d sdf/d x costs one extra matmul chain.

Used on no-grad paths (coarse importance pass, the discriminator-step
renders, evaluation/inference); the generator's differentiated fine render
keeps the XLA path so jax.grad sees a pure-JAX graph. Parity oracle:
ops/film_siren.py (tests/test_pallas_film.py compares both).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128  # trunk width (static for the kernel)
# points per grid step (keeps the 8-layer cos(arg) scratch in VMEM);
# OI_PALLAS_TILE sweeps it for the go/no-go bench (tools/bench_trunk.py)
TILE = int(__import__("os").environ.get("OI_PALLAS_TILE", "256"))


def _fast_sincos(u, want_cos: bool):
    """In-kernel polynomial sine (and its exact-derivative cosine): the same
    Cody-Waite + degree-11 odd minimax construction as film_siren.fast_sin
    (|sin err| < 8e-7, |cos err| < 9e-6 over SIREN's phase range). Pure VPU
    mul/add — Mosaic lowers transcendental `sin`/`cos` far slower.

    Honors OI_FAST_SIN=0 (the film_siren escape hatch): emits the exact
    transcendental pair instead, so disabling fast_sin isolates the
    polynomial numerics on the Pallas path too."""
    from .film_siren import _CW1, _CW2, _INV_2PI, _SIN_COEF, FAST_SIN

    if not FAST_SIN:
        return jnp.sin(u), (jnp.cos(u) if want_cos else None)

    k = jnp.round(u * _INV_2PI)
    r = (u - k * _CW1) - k * _CW2
    r2 = r * r
    p = jnp.full_like(u, _SIN_COEF[-1])
    for c in _SIN_COEF[-2::-1]:
        p = p * r2 + c
    sin = r * p
    if not want_cos:
        return sin, None
    pp = jnp.full_like(u, 5.0 * _SIN_COEF[5])
    for i in (4, 3, 2, 1):
        pp = pp * r2 + i * _SIN_COEF[i]
    cos = p + 2.0 * r2 * pp  # d/dr [r * p(r^2)]
    return sin, cos


def _dot3x(x, w_hi, w_lo):
    """bf16_3x matmul: split both operands to bf16 and accumulate in fp32."""
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    h = jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
    h += jnp.dot(x_hi, w_lo, preferred_element_type=jnp.float32)
    h += jnp.dot(x_lo, w_hi, preferred_element_type=jnp.float32)
    return h


def _trunk_kernel(
    pts_ref,  # (TILE, 128)  xyz in lanes 0..2
    whi_ref,  # (D, 128, 128) bf16 folded weights, high part
    wlo_ref,  # (D, 128, 128) bf16 folded weights, low part
    bf_ref,  # (D, 128) folded biases (gamma*b + beta)
    ws_ref,  # (128, 128) sdf head in column 0
    bs_ref,  # (1, 1)
    sdf_ref,  # out (TILE, 128) — sdf in lane 0
    feat_ref,  # out (TILE, 128)
    grad_ref,  # out (TILE, 128) — d sdf/d xyz in lanes 0..2
    cos_ref,  # scratch (D, TILE, 128): cos(arg) per layer
    *,
    depth: int,
    with_grad: bool,
):
    x = pts_ref[:]
    for i in range(depth):
        arg = _dot3x(x, whi_ref[i], wlo_ref[i]) + bf_ref[i][None, :]
        s, c = _fast_sincos(arg, want_cos=with_grad)
        if with_grad:
            cos_ref[i] = c
        x = s
    feat_ref[:] = x
    sdf = jnp.dot(x, ws_ref[:], preferred_element_type=jnp.float32) + bs_ref[0, 0]
    sdf_ref[:] = sdf

    if with_grad:
        # reverse sweep with folded weights: g_{i-1} = (g_i * cos_i) @ Wg_i^T
        g = jnp.broadcast_to(ws_ref[:][:, 0][None, :], x.shape)  # (TILE, 128)
        for i in range(depth - 1, -1, -1):
            g = g * cos_ref[i]
            gt = jax.lax.dot_general(
                g.astype(jnp.bfloat16), whi_ref[i],
                dimension_numbers=(((1,), (1,)), ((), ())),  # g @ W^T
                preferred_element_type=jnp.float32,
            )
            gt += jax.lax.dot_general(
                g.astype(jnp.bfloat16), wlo_ref[i],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g = gt
        grad_ref[:] = g


def _pack_folded(layers: List[dict], sigma: dict, style: jnp.ndarray):
    """Per-sample folded weights, bf16-split: (bs, D, W, W) hi/lo + (bs, D, W)."""
    from .film_siren import fold_film

    depth = len(layers)
    bs = style.shape[0]
    w_g = jnp.zeros((bs, depth, W, W), dtype=jnp.float32)
    b_g = jnp.zeros((bs, depth, W), dtype=jnp.float32)
    for i, layer in enumerate(layers):
        wg, bg = fold_film(layer, style)  # (bs, in, W), (bs, W)
        in_dim = wg.shape[1]
        w_g = w_g.at[:, i, :in_dim, :].set(wg)
        b_g = b_g.at[:, i, :].set(bg)
    w_hi = w_g.astype(jnp.bfloat16)
    w_lo = (w_g - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ws = jnp.zeros((W, W), dtype=jnp.float32).at[:, :1].set(sigma["w"])
    return w_hi, w_lo, b_g, ws


def film_trunk_pallas(
    layers: List[dict],
    sigma: dict,
    pts: jnp.ndarray,  # (bs, n, 3)
    style: jnp.ndarray,  # (bs, style_dim)
    with_grad: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused trunk+head eval. Returns (sdf (bs,n,1), feat (bs,n,W),
    grad (bs,n,3) or None)."""
    bs, n, _ = pts.shape
    depth = len(layers)
    w_hi, w_lo, b_g, ws = _pack_folded(layers, sigma, style)
    bs_head = jnp.reshape(sigma["b"], (1, 1))

    n_pad = int(np.ceil(n / TILE) * TILE)
    pts_p = jnp.zeros((bs, n_pad, W), dtype=jnp.float32)
    pts_p = pts_p.at[:, :n, :3].set(pts)

    grid = (n_pad // TILE,)
    kernel = functools.partial(_trunk_kernel, depth=depth, with_grad=with_grad)

    def run_one(pts_b, w_hi_b, w_lo_b, b_g_b):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((depth, W, W), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((depth, W, W), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((depth, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((W, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, W), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, W), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, W), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((depth, TILE, W) if with_grad else (1, 8, W), jnp.float32)
            ],
            interpret=interpret,
        )(pts_b, w_hi_b, w_lo_b, b_g_b, ws, bs_head)

    sdf_p, feat_p, grad_p = jax.vmap(run_one)(pts_p, w_hi, w_lo, b_g)
    sdf = sdf_p[:, :n, :1]
    feat = feat_p[:, :n, :]
    grad = grad_p[:, :n, :3] if with_grad else None
    return sdf, feat, grad
