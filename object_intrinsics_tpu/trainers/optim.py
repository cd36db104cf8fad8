"""Optimizers and LR schedules with torch-matching semantics.

The reference trains with torch.optim.Adam (betas (0, 0.9), lr 2e-5) for the
generator and torch.optim.RMSprop (lr 1e-4) for both discriminators, stepped
by no-op StepLR schedulers (configs/train.yaml:133-165). GANs amplify small
numeric drift, so these transformations reproduce torch's update rules
exactly:

  * Adam: optax.adam with eps outside sqrt (eps_root=0) matches torch.
  * RMSprop: torch uses ``p -= lr * g / (sqrt(nu) + eps)`` (eps OUTSIDE the
    sqrt, no bias correction) — written here directly since optax's default
    places eps inside the sqrt.
  * StepLR: lr * gamma**(step // step_size) as an optax schedule.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..utils.config import register_target


class GradientTransformationWithLR(NamedTuple):
    """optax GradientTransformation plus the LR schedule that drives it, so
    the trainer can log lr/opt_* scalars per step like the reference
    (src/trainers/gan_pose_trainer.py:95-99) without restructuring the
    optimizer state."""

    init: optax.TransformInitFn
    update: optax.TransformUpdateFn
    lr_schedule: object  # Callable[[count], lr]


class ScaleByRmspropTorchState(NamedTuple):
    nu: optax.Updates


def scale_by_rmsprop_torch(alpha: float = 0.99, eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.RMSprop semantics (no momentum, not centered)."""

    def init_fn(params):
        return ScaleByRmspropTorchState(nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        nu = jax.tree.map(lambda n, g: alpha * n + (1 - alpha) * g * g, state.nu, updates)
        updates = jax.tree.map(lambda g, n: g / (jnp.sqrt(n) + eps), updates, nu)
        return updates, ScaleByRmspropTorchState(nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def step_lr(base_lr: float, step_size: int, gamma: float, last_epoch: int = -1):
    """torch.optim.lr_scheduler.StepLR as an optax schedule."""
    del last_epoch

    def schedule(count):
        return base_lr * gamma ** (count // step_size)

    return schedule


@register_target("torch.optim.Adam", "object_intrinsics_tpu.trainers.optim.adam")
def adam(lr: float, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.0):
    """Returns a factory: schedule -> GradientTransformation (torch.optim.Adam)."""

    def build(schedule=None):
        tx = optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps, eps_root=0.0)
        chain = [tx]
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_learning_rate(schedule if schedule is not None else lr))
        base = optax.chain(*chain)
        return GradientTransformationWithLR(
            base.init, base.update, schedule if schedule is not None else (lambda c: lr)
        )

    build.base_lr = lr
    return build


@register_target("torch.optim.RMSprop", "object_intrinsics_tpu.trainers.optim.rmsprop")
def rmsprop(lr: float, alpha: float = 0.99, eps: float = 1e-8):
    def build(schedule=None):
        base = optax.chain(
            scale_by_rmsprop_torch(alpha=alpha, eps=eps),
            optax.scale_by_learning_rate(schedule if schedule is not None else lr),
        )
        return GradientTransformationWithLR(
            base.init, base.update, schedule if schedule is not None else (lambda c: lr)
        )

    build.base_lr = lr
    return build


@register_target("torch.optim.SGD", "object_intrinsics_tpu.trainers.optim.sgd")
def sgd(lr: float, momentum: float = 0.0, weight_decay: float = 0.0):
    """torch.optim.SGD (dampening=0, non-nesterov): buf = m*buf + g;
    p -= lr*buf — optax.trace(decay=m) matches exactly. Unused by the
    shipped reference configs but a valid ``__target__`` in their schema;
    also the optimizer the DDP-equivalence test uses (no |g| normalization,
    so updates inherit the gradients' tolerance instead of amplifying
    rounding-scale sign flips)."""

    def build(schedule=None):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            chain.append(optax.trace(decay=momentum))
        chain.append(optax.scale_by_learning_rate(schedule if schedule is not None else lr))
        base = optax.chain(*chain)
        return GradientTransformationWithLR(
            base.init, base.update, schedule if schedule is not None else (lambda c: lr)
        )

    build.base_lr = lr
    return build


@register_target(
    "torch.optim.lr_scheduler.StepLR", "object_intrinsics_tpu.trainers.optim.StepLR"
)
def StepLR(step_size: int, gamma: float = 0.1, last_epoch: int = -1):
    """Returns a factory: base_lr -> schedule."""

    def build(base_lr: float):
        return step_lr(base_lr, step_size=step_size, gamma=gamma, last_epoch=last_epoch)

    return build


def build_optimizer(opt_cfg: dict, sch_cfg: Optional[dict]) -> optax.GradientTransformation:
    """Assemble optimizer + schedule from reference-schema config nodes."""
    from ..utils.config import build_from_config

    opt_factory = build_from_config(opt_cfg)
    schedule = None
    if sch_cfg is not None:
        sch_factory = build_from_config(sch_cfg)
        schedule = sch_factory(opt_factory.base_lr)
    return opt_factory(schedule)
