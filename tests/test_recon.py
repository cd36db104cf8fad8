import jax
import numpy as np
import pytest

from __graft_entry__ import _generator_cfg
from object_intrinsics_tpu.trainers.recon_trainer import ReconTrainer
from object_intrinsics_tpu.utils.config import build_from_config


def test_recon_trainer_decreases_loss():
    gen = build_from_config(_generator_cfg(resolution=16, n_samples=4, n_importance=2))
    params = gen.init(jax.random.PRNGKey(0))
    trainer = ReconTrainer(gen, params, n_images=4, lr=1e-3, code_lr=1e-2)

    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(2, 16, 16, 3).astype(np.float32),
        "mask": (rng.rand(2, 16, 16, 1) > 0.5).astype(np.float32),
        "pose_indices": np.array([0, 1]),
    }
    # fixed key -> deterministic objective; loss must trend down
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(20):
        stats = trainer.train_step(batch, key)
        losses.append(float(stats["recon/loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    # codes moved
    z = np.asarray(trainer.state["params"]["codes"]["z"])
    assert np.abs(z[:2]).max() > 0
