"""Flat-buffer optimizer execution (trainers/gan_pose_trainer.py, flat_optim).

The flat path ravels each player's grads/params into ONE contiguous vector,
runs the optax update + both EMA lerps there, and unravels back into the
state's leaves. The update math is elementwise over the same elements, but
the two layouts compile to different programs, and XLA's fusion decisions
perturb the GRAD computations by float rounding (~1 ulp). Like the
DDP-equivalence test, the tight multi-step equality therefore runs under
SGD (updates inherit the gradients' tolerance); Adam/RMSprop amplify
rounding-scale grad diffs through their 1/(sqrt(nu)+eps) normalization
(measured: 1e-4 after two steps), so the real-optimizer check uses a bound
loose to rounding but far below misplacement scale — an actual
slicing/ordering bug misplaces whole elements and shows as O(leaf-max)
error. Checkpoints written under either optimizer-state layout must restore
under the other (utils/checkpoint.coerce_leaf_stream preserves element
order; integer optax counts must align with leaf boundaries).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.flatten_util import ravel_pytree

from __graft_entry__ import _build_trainer
from object_intrinsics_tpu.utils.checkpoint import coerce_leaf_stream


def _batch(bs=2, res=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.rand(bs, res, res, 3).astype(np.float32),
        "mask": (rng.rand(bs, res, res, 1) > 0.5).astype(np.float32),
    }


def _run_steps(t, seeds):
    for s in seeds:
        t.train_step(_batch(seed=s), jax.random.PRNGKey(s))
    return jax.tree.map(
        np.asarray, {"params": t.state["params"], "ema": t.state["ema"]}
    )


def _assert_trees_equal(a, b, atol=0.0):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.shape == y.shape, (x.shape, y.shape)
        if atol == 0.0:
            assert np.array_equal(x, y), float(np.abs(x - y).max())
        else:
            assert np.allclose(x, y, atol=atol), float(np.abs(x - y).max())


def test_flat_matches_tree_sgd():
    flat = _run_steps(
        _build_trainer(mesh=None, resolution=16, sgd=True, flat_optim=True),
        seeds=[0, 1])
    tree = _run_steps(
        _build_trainer(mesh=None, resolution=16, sgd=True, flat_optim=False),
        seeds=[0, 1])
    _assert_trees_equal(flat, tree, atol=1e-6)


def test_checkpoint_cross_layout_restore(tmp_path):
    # tree-layout checkpoint -> flat trainer, and flat -> tree; after the
    # coerced restore both must continue training identically
    t_tree = _build_trainer(mesh=None, resolution=16, flat_optim=False)
    t_tree.train_step(_batch(seed=5), jax.random.PRNGKey(5))
    t_tree.checkpoint_io.checkpoint_dir = str(tmp_path / "tree")
    t_tree.save_checkpoint(overwrite=True)
    t_tree.flush_checkpoints()  # another trainer reads this file next
    p_tree = os.path.join(str(tmp_path / "tree"), "model.npz")

    t_flat = _build_trainer(mesh=None, resolution=16, flat_optim=True)
    t_flat.load_checkpoint(p_tree)
    assert t_flat.it == t_tree.it
    t_flat.checkpoint_io.checkpoint_dir = str(tmp_path / "flat")
    t_flat.save_checkpoint(overwrite=True)
    t_flat.flush_checkpoints()  # read below by t_tree2
    p_flat = os.path.join(str(tmp_path / "flat"), "model.npz")

    # flat-layout checkpoint back into a per-leaf trainer
    t_tree2 = _build_trainer(mesh=None, resolution=16, flat_optim=False)
    t_tree2.load_checkpoint(p_flat)
    _assert_trees_equal(t_tree2.state["opt"], t_tree.state["opt"])

    # the optimizer state survived both coercions: one more identical step
    # from each trainer lands on identical params (Adam/RMSprop second
    # moments would amplify any element misplacement)
    t_tree.train_step(_batch(seed=6), jax.random.PRNGKey(6))
    t_flat.train_step(_batch(seed=6), jax.random.PRNGKey(6))
    t_tree2.train_step(_batch(seed=6), jax.random.PRNGKey(6))
    # cross-layout under Adam/RMSprop: rounding-amplified tolerance (module
    # docstring) — misplaced elements would miss by O(leaf-max) ~ 0.1
    _assert_trees_equal(t_tree.state["params"], t_flat.state["params"], atol=1e-3)
    # same layout, same program: bitwise
    _assert_trees_equal(t_tree.state["params"], t_tree2.state["params"])


def test_coerce_leaf_stream_adam_roundtrip():
    params = {
        "a": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": jnp.ones((3,), jnp.float32)},
        "c": jnp.full((4,), 2.0, jnp.float32),
    }
    tx = optax.adam(1e-3)
    tree_state = tx.init(params)
    flat, _ = ravel_pytree(params)
    flat_state = tx.init(flat)

    # tree -> flat template and back: element order preserved exactly
    as_flat = coerce_leaf_stream(flat_state, tree_state)
    _assert_trees_equal(
        jax.tree.map(np.asarray, as_flat), jax.tree.map(np.asarray, flat_state)
    )
    back = coerce_leaf_stream(tree_state, as_flat)
    _assert_trees_equal(
        jax.tree.map(np.asarray, back), jax.tree.map(np.asarray, tree_state)
    )


def test_coerce_leaf_stream_rejects_mismatch():
    t = {"a": jnp.zeros((4,), jnp.float32)}
    with pytest.raises(ValueError, match="cannot coerce"):
        coerce_leaf_stream(t, {"a": jnp.zeros((5,), jnp.float32)})
    # an int leaf may never be absorbed into a float stream
    with pytest.raises(ValueError, match="not stream-compatible"):
        coerce_leaf_stream(
            {"a": jnp.zeros((2,), jnp.float32)},
            {"a": jnp.zeros((1,), jnp.float32), "b": jnp.zeros((1,), jnp.int32)},
        )
