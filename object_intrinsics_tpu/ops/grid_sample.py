"""Bilinear grid sampling (torch grid_sample semantics, align_corners=False,
zero padding), differentiable to arbitrary order.

Replaces the reference's grid_sample_gradfix
(src/third_party/ada/torch_utils/ops/grid_sample_gradfix.py) — in JAX the
gather+lerp formulation is natively differentiable through grad-of-grad, so
no custom autograd plumbing is needed for the R1 penalty to flow through the
ADA augmentation warp.
"""
from __future__ import annotations

import jax.numpy as jnp


def affine_grid(theta: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """theta: (N, 2, 3); size: (N, H, W) output extent -> grid (N, H, W, 2)
    of normalized (x, y) sampling coords. Matches torch.nn.functional.affine_grid."""
    assert not align_corners, "only align_corners=False is implemented"
    N, H, W = size
    xs = (2.0 * jnp.arange(W, dtype=theta.dtype) + 1.0) / W - 1.0
    ys = (2.0 * jnp.arange(H, dtype=theta.dtype) + 1.0) / H - 1.0
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # (H, W)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    return jnp.einsum("nij,hwj->nhwi", theta, base)  # (N, H, W, 2)


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """x: (N, H, W, C); grid: (N, Ho, Wo, 2) normalized (x, y) in [-1, 1].
    Bilinear, zero padding, align_corners=False."""
    N, H, W, C = x.shape
    gx = (grid[..., 0] + 1.0) * W / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * H / 2.0 - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(ix, iy):
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        n = jnp.arange(N, dtype=jnp.int32)[:, None, None]
        vals = x[n, iyc, ixc]  # (N, Ho, Wo, C)
        return vals * inb[..., None].astype(x.dtype)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
