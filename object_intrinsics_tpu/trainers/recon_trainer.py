"""Generator-only reconstruction trainer (auto-decoder).

The reference gates a reconstruction branch behind RECON_OBJ=1
(gan_pose_trainer.py:288-291) whose ``train_step_recon`` method is never
defined — dead code. This is a *working* equivalent used for the staged
benchmark config "generator-only reconstruction training" and as a debugging
harness for the differentiable renderer: each real crop gets a learnable
latent and a learnable 9-d pose (Zhou 6-d rotation + translation,
utils/pose.d9_to_pose) initialized from the prior's canonical pose, and the
generator + per-image codes optimize a photometric L1 + mask-BCE + eikonal
objective. No discriminators involved.
"""
from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.pose import d9_to_pose, pose_to_d9
from ..utils.config import register_target

logger = logging.getLogger(__name__)


@register_target("object_intrinsics_tpu.trainers.recon_trainer.ReconTrainer")
class ReconTrainer:
    def __init__(
        self,
        generator,
        params,
        n_images: int,
        lr: float = 1e-4,
        code_lr: float = 1e-2,
        w_mask: float = 1.0,
        w_eikonal: float = 0.1,
        writer=None,
        seed: int = 0,
    ):
        self.generator = generator
        self.writer = writer
        self.w_mask = w_mask
        self.w_eikonal = w_eikonal

        key = jax.random.PRNGKey(seed)
        canonical = getattr(generator.pose_prior, "canonical", np.eye(4, dtype=np.float32))
        d9 = np.asarray(pose_to_d9(jnp.asarray(canonical, dtype=jnp.float32)))
        codes = {
            "z": 0.01 * jax.random.normal(key, (n_images, generator.z_dim)),
            "pose_d9": jnp.broadcast_to(jnp.asarray(d9), (n_images, 9)).astype(jnp.float32) + 0.0,
        }
        all_params = {"gen": params, "codes": codes}
        labels = {
            "gen": jax.tree.map(lambda _: "gen", params),
            "codes": jax.tree.map(lambda _: "codes", codes),
        }
        self.tx = optax.multi_transform(
            {"gen": optax.adam(lr, b1=0.0, b2=0.9), "codes": optax.adam(code_lr)},
            labels,
        )
        self.state = {
            "params": all_params,
            "opt": self.tx.init(all_params),
            "it": jnp.asarray(-1, dtype=jnp.int32),
        }
        self._step = None

    def _build(self, bs: int):
        gen = self.generator

        def loss_fn(params, batch, key, it):
            codes = params["codes"]
            idx = batch["pose_indices"]  # (bs,)
            z = codes["z"][idx]
            b2w = d9_to_pose(codes["pose_d9"][idx])
            data = {"z": z, "b2w": b2w, "bg_color": batch["bg_color"]}
            out = gen.forward(params["gen"], key, bs, it, data, train=True)["box"]
            image = out["render_out"]["image"]
            mask = out["render_out"]["mask"]
            l_img = jnp.mean(jnp.abs(image - batch["image"]))
            m = batch["mask"]
            l_mask = -jnp.mean(m * jnp.log(mask) + (1 - m) * jnp.log(1 - mask))
            l_eik = out["loss"]["eikonal"]
            loss = l_img + self.w_mask * l_mask + self.w_eikonal * l_eik
            return loss, {"recon/image_l1": l_img, "recon/mask_bce": l_mask,
                          "recon/eikonal": l_eik, "recon/loss": loss}

        def step(state, batch, key):
            it = state["it"] + 1
            (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"], batch, key, it
            )
            upd, opt = self.tx.update(grads, state["opt"], state["params"])
            params = optax.apply_updates(state["params"], upd)
            return {"params": params, "opt": opt, "it": it}, stats

        return jax.jit(step, donate_argnums=(0,))

    @property
    def it(self) -> int:
        return int(self.state["it"])

    def train_step(self, batch: Dict[str, np.ndarray], key) -> Dict[str, Any]:
        bs = batch["image"].shape[0]
        if self._step is None:
            self._step = self._build(bs)
        batch_dev = {
            "image": jnp.asarray(batch["image"]),
            "mask": jnp.asarray(batch["mask"]),
            "pose_indices": jnp.asarray(batch["pose_indices"]),
            "bg_color": jnp.asarray(batch.get(
                "bg_color", np.ones((bs, 3), dtype=np.float32)
            )),
        }
        self.state, stats = self._step(self.state, batch_dev, key)
        return stats


def train_recon(generator, params, dataset, max_it: int = 1000, bs: int = 1,
                writer=None, seed: int = 0, print_every: int = 100):
    """Convenience loop for the staged recon benchmark config."""
    trainer = ReconTrainer(generator, params, n_images=len(dataset), writer=writer, seed=seed)
    loader = dataset.batches(bs, seed=seed)
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    for batch in loader:
        if trainer.it >= max_it:
            break
        stats = trainer.train_step(batch, jax.random.fold_in(key, trainer.it + 1))
        if trainer.it % print_every == 0:
            s = {k: float(v) for k, v in stats.items()}
            logger.info("recon it=%05d %s (%.1fs)", trainer.it,
                        " ".join(f"{k.split('/')[-1]}={v:.4f}" for k, v in sorted(s.items())),
                        time.time() - t0)
            if writer is not None:
                writer.add_scalars(s, trainer.it)
    return trainer
