"""Loud NaN detection in non-DEBUG runs (r4 verdict weak #4).

_rank_onehot's failure mode is silent outside DEBUG: a NaN SDF corrupts the
renderer's merge ORDER instead of propagating, so a poisoned run would keep
"training" on garbage. The trainer folds a non-finite count over the loss /
param-norm scalars into the stats dict (zero extra device fetches) and the
train loop aborts at print cadence. Reference analog: the NaN guards at
neus/models/renderer.py:316-320.
"""
import itertools

import numpy as np
import pytest

from object_intrinsics_tpu.trainers.gan_pose_trainer import train_loops


class _PoisonedTrainer:
    """Stub whose step starts returning NaN stats at a given iteration."""

    def __init__(self, poison_at=3):
        self.it = 0
        self.poison_at = poison_at
        self.saved = []
        self.mesh = None
        self.writer = None
        self.state = {"w": 0.0}
        self.generator = type("G", (), {"resolution": 4})()

    def train_step(self, batch, key):
        self.it += 1
        bad = self.it >= self.poison_at
        return {
            "generator/loss": float("nan") if bad else 0.5,
            "nan_alarm": 1.0 if bad else 0.0,
        }

    def save_checkpoint(self, overwrite=True, epoch=-1, **kw):
        self.saved.append(self.it)

    def visualize(self, batch, key):
        pass


def _loader():
    return itertools.repeat({"image": np.zeros((1, 4, 4, 3), np.float32)})


def test_loop_aborts_within_print_every():
    t = _PoisonedTrainer(poison_at=3)
    with pytest.raises(RuntimeError, match="non-finite training state"):
        train_loops(
            eval_every=0, print_every=2, visualize_every=0,
            checkpoint_every=0, checkpoint_overwrite=True, cfg={},
            trainer=t, train_loader=_loader(), max_it=100,
        )
    # poisoned at it=3, print cadence 2 -> must stop at it=4 (within
    # print_every steps of the poison), not run to max_it
    assert t.it == 4


def test_forensic_snapshot_uses_distinct_name(tmp_path):
    saves = []

    class _IO:
        checkpoint_dir = str(tmp_path)

        def save(self, name, state, meta):
            saves.append((name, meta["it"]))

    t = _PoisonedTrainer(poison_at=1)
    t.checkpoint_io = _IO()
    with pytest.raises(RuntimeError):
        train_loops(
            eval_every=0, print_every=1, visualize_every=0,
            checkpoint_every=0, checkpoint_overwrite=True, cfg={},
            trainer=t, train_loader=_loader(), max_it=100,
        )
    # the poisoned state is snapshotted under nan_it_* — model.npz (the last
    # good resume point) is never clobbered by the abort path
    assert saves == [("nan_it_00000001", 1)]


def test_clean_run_does_not_trip():
    t = _PoisonedTrainer(poison_at=10**9)
    train_loops(
        eval_every=0, print_every=1, visualize_every=0, checkpoint_every=0,
        checkpoint_overwrite=True, cfg={}, trainer=t, train_loader=_loader(),
        max_it=5,
    )
    assert t.it == 6  # ran to max_it, no abort


def test_real_step_raises_alarm_on_poisoned_batch():
    """A NaN in the data propagates to the alarm through the real jitted
    step — the end-to-end wiring of the guard, on the tiny 16px config."""
    import jax

    from __graft_entry__ import _build_trainer

    trainer = _build_trainer(mesh=None, resolution=16)
    good = {
        "image": np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32),
        "mask": np.ones((1, 16, 16, 1), np.float32),
    }
    stats = trainer.train_step(good, jax.random.PRNGKey(1))
    assert float(stats["nan_alarm"]) == 0.0

    bad = dict(good, image=np.full((1, 16, 16, 3), np.nan, np.float32))
    stats = trainer.train_step(bad, jax.random.PRNGKey(2))
    assert float(stats["nan_alarm"]) > 0.0
