"""Termination semantics of train_loops (reference gan_pose_trainer.py:265-283).

The reference's outer loop returns when the pre-increment epoch counter
exceeds ``max_epoch`` (checked at epoch boundaries only) or when
``trainer.it > max_it``. These tests pin both, with a stub trainer — no
device code.
"""
import itertools

import pytest

from object_intrinsics_tpu.trainers.gan_pose_trainer import train_loops


class _StubTrainer:
    def __init__(self):
        self.it = 0
        self.saved = []
        self.mesh = None
        self.writer = None

    def train_step(self, batch, key):
        self.it += 1
        return {}

    def save_checkpoint(self, overwrite=True, epoch=-1, **kw):
        self.saved.append((self.it, epoch))

    def visualize(self, batch, key):
        pass


def _loader():
    return itertools.repeat({"image": None})


def _run(**kw):
    t = _StubTrainer()
    train_loops(
        eval_every=0, print_every=0, visualize_every=0, checkpoint_every=0,
        checkpoint_overwrite=True, cfg={}, trainer=t, train_loader=_loader(),
        **kw,
    )
    return t


def test_max_it_terminates():
    t = _run(max_it=10)
    # stops at the first batch where it > max_it (reference checks `> max_it`)
    assert t.it == 11
    assert t.saved[-1][0] == 11


def test_max_epoch_terminates_like_reference():
    # Reference semantics with epoch starting at -1 and max_epoch=0:
    # check(-1>0) run epoch 0; check(0>0) run epoch 1; check(1>0) return.
    # => TWO epochs execute (epochs 0 and 1).
    t = _run(max_epoch=0, max_it=10**9, batches_per_epoch=5)
    assert t.it == 10
    assert t.saved[-1] == (10, 1)


def test_max_epoch_resume_offset():
    # Resuming with epoch=3 and max_epoch=3: check(3>3) false, run epoch 4,
    # check(4>3) return after one more epoch.
    t = _run(max_epoch=3, max_it=10**9, batches_per_epoch=4, epoch=3)
    assert t.it == 4
    assert t.saved[-1] == (4, 4)


def test_max_epoch_requires_batches_per_epoch():
    with pytest.raises(ValueError, match="batches_per_epoch"):
        _run(max_epoch=1)


class _StubMultiTrainer(_StubTrainer):
    def __init__(self):
        super().__init__()
        self.multi_calls = []

    def train_step_multi(self, batches, root_key):
        self.multi_calls.append(len(batches))
        self.it += len(batches)
        return {}


def test_steps_per_dispatch_blocked_loop_matches_termination():
    """K-steps-per-dispatch must terminate at the same iteration as the
    single-step loop; the tail to max_it runs as single steps."""
    t = _StubMultiTrainer()
    train_loops(
        eval_every=0, print_every=0, visualize_every=0, checkpoint_every=0,
        checkpoint_overwrite=True, cfg={"training": {"steps_per_dispatch": 4}},
        trainer=t, train_loader=_loader(), max_it=10,
    )
    assert t.it == 11  # identical to test_max_it_terminates
    assert t.multi_calls == [4, 4]  # it 0->4->8, then singles 9..11


def test_steps_per_dispatch_disabled_when_cadence_not_divisible():
    t = _StubMultiTrainer()
    train_loops(
        eval_every=0, print_every=0, visualize_every=3, checkpoint_every=0,
        checkpoint_overwrite=True, cfg={"training": {"steps_per_dispatch": 4}},
        trainer=t, train_loader=_loader(), max_it=6,
    )
    assert t.multi_calls == []  # fell back to one dispatch per step
    assert t.it == 7


def test_steps_per_dispatch_disabled_under_max_epoch():
    t = _StubMultiTrainer()
    train_loops(
        eval_every=0, print_every=0, visualize_every=0, checkpoint_every=0,
        checkpoint_overwrite=True, cfg={"training": {"steps_per_dispatch": 4}},
        trainer=t, train_loader=_loader(), max_epoch=0, batches_per_epoch=5,
        max_it=10**9,
    )
    assert t.multi_calls == []
    assert t.it == 10  # same as test_max_epoch_terminates_like_reference
