"""Auxiliary pose-regression loss and its ramp schedule (src/loss/position.py)."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.config import register_target


@register_target(
    "src.loss.position.PositionLoss", "object_intrinsics_tpu.loss.position.PositionLoss"
)
class PositionLoss:
    def __init__(self, loss_str: str = "mse"):
        assert loss_str in ("mse", "smooth_l1"), loss_str
        self.loss_str = loss_str

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.loss_str == "mse":
            return jnp.mean((pred - target) ** 2)
        diff = jnp.abs(pred - target)
        return jnp.mean(jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5))


@register_target(
    "src.loss.position.linear_increase", "object_intrinsics_tpu.loss.position.linear_increase"
)
def linear_increase(max_it: int, max_weight: float):
    """Weight ramps 0 -> max_weight linearly over max_it iterations; ``it``
    may be a traced scalar inside jit."""

    def fn(it):
        return jnp.minimum(it / max_it, 1.0) * max_weight

    return fn
