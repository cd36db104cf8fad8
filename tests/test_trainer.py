import os

import jax
import numpy as np
import pytest

from __graft_entry__ import _build_trainer


@pytest.fixture(scope="module")
def tiny_trainer():
    return _build_trainer(mesh=None, resolution=16)


def _batch(bs=2, res=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.rand(bs, res, res, 3).astype(np.float32),
        "mask": (rng.rand(bs, res, res, 1) > 0.5).astype(np.float32),
    }


def test_train_step_updates_all_players(tiny_trainer):
    t = tiny_trainer
    before = jax.tree.map(np.asarray, t.state["params"])
    stats = t.train_step(_batch(), jax.random.PRNGKey(0))
    stats = {k: float(v) for k, v in stats.items()}
    for k, v in stats.items():
        assert np.isfinite(v), (k, v)
    # all three players' params moved
    for name in ["generator", "discriminator", "mask_discriminator"]:
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            t.state["params"][name],
            before[name],
        )
        assert max(jax.tree.leaves(diffs)) > 0, name
    # iteration counter advanced (starts at -1)
    assert t.it == 0
    # initial BCE losses near log(2)
    assert abs(stats["generator/loss"] - 0.693) < 0.2
    assert abs(stats["discriminator/real"] - 0.693) < 0.2


def test_ema_moves_toward_params(tiny_trainer):
    t = tiny_trainer
    t.train_step(_batch(seed=1), jax.random.PRNGKey(1))
    ema = t.state["ema"]["ema@0.9"]
    p = t.state["params"]["generator"]
    # after updates ema != params but finite
    d = max(
        jax.tree.leaves(
            jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), ema, p)
        )
    )
    assert np.isfinite(d)


def test_checkpoint_roundtrip(tmp_path, tiny_trainer):
    t = tiny_trainer
    t.checkpoint_io.checkpoint_dir = str(tmp_path)
    t.save_checkpoint(overwrite=True, epoch=3)
    it_before = t.it
    params_before = jax.tree.map(np.asarray, t.state["params"])

    # perturb then restore
    t.train_step(_batch(seed=2), jax.random.PRNGKey(2))
    assert t.it == it_before + 1
    meta = t.load_checkpoint(os.path.join(str(tmp_path), "model.npz"))
    assert t.it == it_before
    assert meta["epoch"] == 3
    restored = jax.tree.map(np.asarray, t.state["params"])
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(restored)):
        assert np.allclose(a, b)


def test_resumed_step_matches(tmp_path):
    """Determinism: same state + same batch + same key -> same result."""
    t = _build_trainer(mesh=None, resolution=16)
    t.checkpoint_io.checkpoint_dir = str(tmp_path)
    t.save_checkpoint(overwrite=True)
    s1 = t.train_step(_batch(seed=3), jax.random.PRNGKey(3))
    after1 = jax.tree.map(np.asarray, t.state["params"]["generator"])

    t.load_checkpoint(os.path.join(str(tmp_path), "model.npz"))
    s2 = t.train_step(_batch(seed=3), jax.random.PRNGKey(3))
    after2 = jax.tree.map(np.asarray, t.state["params"]["generator"])
    for a, b in zip(jax.tree.leaves(after1), jax.tree.leaves(after2)):
        assert np.allclose(a, b, atol=1e-6)
    for k in s1:
        assert np.allclose(np.asarray(s1[k]), np.asarray(s2[k]), atol=1e-5), k


def test_state_hash_is_bitwise_sensitive():
    """The cross-chip consistency fingerprint must not admit float
    cancellation: two states whose errors cancel in a sum hash differently."""
    import jax.numpy as jnp

    from object_intrinsics_tpu.parallel.mesh import state_hash

    a = {"p": jnp.asarray([1.0, -1.0, 2.0]), "it": jnp.asarray(3, jnp.int32)}
    # same float sum (errors cancel), different bits
    b = {"p": jnp.asarray([1.5, -1.5, 2.0]), "it": jnp.asarray(3, jnp.int32)}
    assert np.array_equal(np.asarray(state_hash(a)), np.asarray(state_hash(a)))
    assert not np.array_equal(np.asarray(state_hash(a)), np.asarray(state_hash(b)))
    # single-bit flip is detected
    c = {"p": jnp.asarray([1.0, -1.0, np.nextafter(np.float32(2.0), np.float32(3.0))]),
         "it": jnp.asarray(3, jnp.int32)}
    assert not np.array_equal(np.asarray(state_hash(a)), np.asarray(state_hash(c)))
