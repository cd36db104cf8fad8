"""Pytree helpers: EMA, param counting, per-child grad-norm stats.

Covers src/utils/ema.py and tu/utils/training.py:13-41 functionally."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def ema_update(params: Any, ema_params: Any, beta: float) -> Any:
    """p_ema <- p + beta * (p_ema - p)  (torch lerp semantics, src/utils/ema.py:26-32)."""
    return jax.tree.map(lambda p, e: p + beta * (e - p), params, ema_params)


def count_params(tree: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(tree) if hasattr(x, "size"))


def global_norm(tree: Any) -> jnp.ndarray:
    leaves = [jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(tree)]
    return jnp.sqrt(sum(leaves)) if leaves else jnp.zeros(())


def children_grad_norms(grads: Dict[str, Any], prefix: str = "grad_stats") -> Dict[str, jnp.ndarray]:
    """Per-top-level-child gradient norms (tu/utils/training.py:13-41 analog)."""
    return {f"{prefix}/{k}": global_norm(v) for k, v in grads.items()}


def tree_allclose_hash(tree: Any) -> jnp.ndarray:
    """Cheap content fingerprint for cross-chip consistency checks (the
    check_ddp_consistency analog, tu/ddp.py:215-225): sum of leaf sums."""
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree))
