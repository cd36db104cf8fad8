"""GAN objectives and the R1 gradient penalty (rebuilds src/loss/gan.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import register_target


def bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Numerically-stable BCE-with-logits against a constant target."""
    t = jnp.full_like(logits, target)
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def mse(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    return jnp.mean((logits - target) ** 2)


def wgangp(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    if target == 1:  # real
        return -jnp.mean(logits)
    if target == 0:  # fake
        return jnp.mean(logits)
    raise ValueError(f"invalid target: {target}")


@register_target("src.loss.gan.GANLoss", "object_intrinsics_tpu.loss.gan.GANLoss")
class GANLoss:
    def __init__(self, gan_str: str):
        self.fn = {"bce": bce_with_logits, "mse": mse, "wgangp": wgangp}[gan_str]

    def __call__(self, d_out: jnp.ndarray, target: float) -> jnp.ndarray:
        assert d_out.ndim == 2 and d_out.shape[1] == 1, d_out.shape
        return self.fn(d_out, target)


@register_target("src.loss.gan.compute_grad2", "object_intrinsics_tpu.loss.gan.compute_grad2")
def compute_grad2(d_fn, x_in: jnp.ndarray) -> jnp.ndarray:
    """R1 penalty: mean over batch of ||d D/d x||^2 (src/loss/gan.py:5-14).

    ``d_fn`` maps images -> (bs, 1) logits; the grad-of-grad w.r.t. the
    discriminator params flows through naturally under jax.grad.
    """
    grad = jax.grad(lambda x: jnp.sum(d_fn(x)))(x_in)
    bs = x_in.shape[0]
    return jnp.mean(jnp.sum(grad.reshape(bs, -1) ** 2, axis=1))
