"""Fixed-shape inverse-CDF importance sampling (hierarchical NeRF sampling).

Rebuilds sample_pdf (src/third_party/neus/models/renderer.py:44-74) with
static shapes for jit. torch.searchsorted becomes a broadcast compare+sum —
for the tiny per-ray bin counts used here (<= 64) a dense comparison is
faster on the TPU VPU than a gather-based binary search, and it vectorizes
over rays with no vmap.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = True,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """bins: (..., nb), weights: (..., nb-1) -> samples (..., n_samples).

    Matches the reference's CDF conventions exactly (searchsorted right=True,
    below/above clamping, denom < 1e-5 guard) so training dynamics align.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., nb)

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        assert key is not None, "stochastic sample_pdf needs a PRNG key"
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples), dtype=cdf.dtype)

    # searchsorted(cdf, u, right=True) == #\{cdf <= u\}
    inds = jnp.sum(cdf[..., None, :] <= u[..., :, None], axis=-1)  # (..., n_samples)
    nb = cdf.shape[-1]
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, nb - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
