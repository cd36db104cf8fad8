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


def test_async_checkpoint_snapshot_semantics(tmp_path, tiny_trainer):
    """The async writer must persist the state AS OF the save call (the
    on-device jnp.copy snapshot), even when the next donated train step
    mutates the live state while the write is still in flight."""
    from object_intrinsics_tpu.utils.checkpoint import load_pytree

    t = tiny_trainer
    t.checkpoint_io.checkpoint_dir = str(tmp_path)
    t.train_step(_batch(seed=40), jax.random.PRNGKey(40))
    at_save = jax.tree.map(np.asarray, t.state["params"])
    it_at_save = t.it
    assert t._async_ckpt  # default on
    t.save_checkpoint(overwrite=True, epoch=1)
    # mutate (and donate) the live state under the pending write
    t.train_step(_batch(seed=41), jax.random.PRNGKey(41))
    t.flush_checkpoints()
    loaded, meta = load_pytree(os.path.join(str(tmp_path), "model.npz"))
    assert meta["it"] == it_at_save
    for a, b in zip(jax.tree.leaves(loaded["params"]), jax.tree.leaves(at_save)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_visualize_background_writer(tmp_path, tiny_trainer):
    """visualize dispatches the renders then writes PNGs from a background
    thread; after a flush every expected file exists and is a valid image."""
    t = tiny_trainer
    t.vis_dir = str(tmp_path)
    batch = _batch(seed=50)
    t.visualize(batch, jax.random.PRNGKey(50))
    # training continues while the writer fetches/encodes
    t.train_step(batch, jax.random.PRNGKey(51))
    t.flush_checkpoints()
    d = os.path.join(str(tmp_path), f"it_{t.it - 1:08d}")
    for name in ("fake_image.png", "fake_mask.png", "fake_normal_map.png",
                 "light.png", "image_aug.png", "real_image.png"):
        p = os.path.join(d, name)
        assert os.path.exists(p), name
        assert os.path.getsize(p) > 100, name
    t.vis_dir = None


def test_async_checkpoint_error_surfaces(tmp_path, tiny_trainer):
    """A failed background write must raise at the next flush, not vanish."""
    import pytest

    t = tiny_trainer
    blocker = tmp_path / "blocker"
    blocker.write_text("")  # a FILE where the writer needs a directory
    t.checkpoint_io.checkpoint_dir = str(blocker / "sub")
    t.save_checkpoint(overwrite=True)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        t.flush_checkpoints()
    # the error is consumed; the trainer keeps working afterwards
    t.checkpoint_io.checkpoint_dir = str(tmp_path)
    t.save_checkpoint(overwrite=True, blocking=True)
    assert os.path.exists(os.path.join(str(tmp_path), "model.npz"))


def test_multi_step_dispatch_matches_single_steps():
    """K steps in one scan dispatch reproduce K single-step dispatches: same
    math graph and same per-step keys (fold_in(root, it+1), re-derived
    in-program). XLA schedules the scan body differently from the unrolled
    step, so float rounding differs at ~1 ulp per op; after 4 GAN steps that
    accumulates to ~1e-4 relative — we pin that bound, plus exact it/key
    bookkeeping (a wrong key or batch order diverges at O(1))."""
    root = jax.random.PRNGKey(42)
    batches = [_batch(seed=10 + i) for i in range(4)]

    t1 = _build_trainer(mesh=None, resolution=16)
    for b in batches:
        s_single = t1.train_step(b, jax.random.fold_in(root, t1.it + 1))

    t2 = _build_trainer(mesh=None, resolution=16)
    s_multi = t2.train_step_multi(batches, root)

    assert t2.it == t1.it == 3
    assert int(np.asarray(t2.state["it"])) == 3
    _assert_states_track(t1.state, t2.state)
    for k in s_single:
        a, b = np.float64(s_single[k]), np.float64(s_multi[k])
        assert abs(a - b) / (abs(b) + 1e-6) < 5e-2, (k, a, b)


def test_multi_step_single_block_matches_one_step():
    """A K=1 block is ONE step with the loop's exact key — the tightest
    check of the in-program key derivation (a wrong key diverges at O(1),
    while XLA reassociation stays at rounding level)."""
    root = jax.random.PRNGKey(5)
    b = _batch(seed=30)

    t1 = _build_trainer(mesh=None, resolution=16)
    t1.train_step(b, jax.random.fold_in(root, t1.it + 1))
    t2 = _build_trainer(mesh=None, resolution=16)
    t2.train_step_multi([b], root)

    assert t1.it == t2.it == 0
    # elementwise bounds are unattainable even at one step (RMSprop's
    # g/sqrt(nu) is O(lr*10) sensitive where g ~ 0), but a wrong key or
    # batch puts the global distance at O(1) instead of rounding level
    _assert_states_track(t1.state, t2.state, rel=3e-3)


def _assert_states_track(s1, s2, rel=1e-2):
    """Global relative Frobenius distance between two training states —
    rounding-level program differences stay orders below this; a key/batch
    mix-up lands at O(1)."""
    num = den = 0.0
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        num += float(((a - b) ** 2).sum())
        den += float((b**2).sum())
    assert num**0.5 / (den**0.5 + 1e-12) < rel, (num**0.5, den**0.5)


def test_multi_step_dispatch_matches_on_mesh():
    """Same check on the data-parallel path: the scan body folds the chip
    index exactly like parallel/mesh.data_parallel_step does."""
    from object_intrinsics_tpu.parallel.mesh import make_mesh

    root = jax.random.PRNGKey(7)
    batches = [_batch(bs=8, seed=20 + i) for i in range(2)]

    t1 = _build_trainer(mesh=make_mesh(-1), resolution=16)
    for b in batches:
        t1.train_step(b, jax.random.fold_in(root, t1.it + 1))

    t2 = _build_trainer(mesh=make_mesh(-1), resolution=16)
    t2.train_step_multi(batches, root)

    assert t2.it == t1.it
    _assert_states_track(t1.state, t2.state)


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


def test_debug_mode_uses_jit_dispatch(monkeypatch):
    """DEBUG=1 must dispatch through plain jax.jit, not an AOT Compiled:
    jax_debug_nans' op-localized FloatingPointError (which the SIREN phase
    guard's NaN-poison relies on) only fires through jit's de-optimized
    re-run; an AOT executable raises an opaque InternalFloatingPointError."""
    trainer = _build_trainer(mesh=None, resolution=16)
    batch = _batch(bs=1)
    args = (trainer.state, batch, jax.random.PRNGKey(0))

    monkeypatch.setenv("DEBUG", "1")
    fn_debug = trainer._compile_step(lambda: trainer._build_step(1), args)
    assert hasattr(fn_debug, "lower"), "DEBUG=1 should return the jitted fn"

    monkeypatch.delenv("DEBUG")
    fn_aot = trainer._compile_step(lambda: trainer._build_step(1), args)
    assert not hasattr(fn_aot, "lower"), "non-DEBUG should AOT-compile"
