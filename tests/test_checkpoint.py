import jax.numpy as jnp
import numpy as np
import optax

from object_intrinsics_tpu.utils.checkpoint import (
    load_pytree,
    restore_like,
    save_pytree,
)


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "nested": {"b": np.float32(1.5), "lst": [np.zeros(2), np.ones(3)]},
        "tup": (np.asarray(1), np.asarray([2, 3])),
        "none": None,
        "scalar": jnp.asarray(7, dtype=jnp.int32),
    }
    path = str(tmp_path / "state.npz")
    save_pytree(path, tree, meta={"it": 5})
    loaded, meta = load_pytree(path)
    assert meta == {"it": 5}
    assert np.allclose(loaded["a"], tree["a"])
    assert float(loaded["nested"]["b"]) == 1.5
    assert isinstance(loaded["nested"]["lst"], list) and len(loaded["nested"]["lst"]) == 2
    assert isinstance(loaded["tup"], tuple)
    assert loaded["none"] is None
    assert int(loaded["scalar"]) == 7


def test_restore_like_optax_state(tmp_path):
    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros(2)}
    tx = optax.adam(1e-3)
    state = tx.init(params)
    path = str(tmp_path / "opt.npz")
    save_pytree(path, state)
    loaded, _ = load_pytree(path)
    restored = restore_like(tx.init(params), loaded)
    # same structure (named tuples) and same leaves
    assert type(restored) is type(state)
    for a, b in zip(
        __import__("jax").tree.leaves(state), __import__("jax").tree.leaves(restored)
    ):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_restore_like_rejects_shape_mismatch():
    """Loading a checkpoint from a different architecture must fail loudly,
    not silently reshape (VERDICT r1)."""
    import jax.numpy as jnp
    import pytest

    from object_intrinsics_tpu.utils.checkpoint import restore_like

    template = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    ok = restore_like(template, {"w": np.ones((4, 4)), "b": np.ones((4,))})
    assert ok["w"].shape == (4, 4)
    with pytest.raises(ValueError, match="shape mismatch"):
        restore_like(template, {"w": np.ones((2, 8)), "b": np.ones((4,))})
    # scalars stored as size-1 arrays are the tolerated case
    t2 = {"it": jnp.zeros(())}
    out = restore_like(t2, {"it": np.ones((1,))})
    assert out["it"].shape == ()


def test_resolve_checkpoint_newest_wins(tmp_path):
    """A format switch mid-project must resume from the NEWER file, whichever
    extension it has."""
    import os
    import time

    from object_intrinsics_tpu.utils.checkpoint import (
        load_pytree,
        resolve_checkpoint,
        save_pytree,
    )

    base = str(tmp_path / "model")
    save_pytree(base + ".npz", {"a": np.zeros(3)}, {"it": 10})
    time.sleep(0.05)
    try:
        save_pytree(base + ".oipk", {"a": np.ones(3)}, {"it": 30, "np": np.int32(5)})
    except AssertionError:
        import pytest

        pytest.skip("native toolchain unavailable")
    assert resolve_checkpoint(base + ".npz").endswith(".oipk")
    assert resolve_checkpoint(base).endswith(".oipk")
    loaded, meta = load_pytree(resolve_checkpoint(base + ".npz"))
    assert meta["it"] == 30  # numpy scalar meta serialized via default=str
    np.testing.assert_array_equal(loaded["a"], np.ones(3))
    # make npz newer again
    os.utime(base + ".npz")
    assert resolve_checkpoint(base + ".oipk").endswith(".npz")
