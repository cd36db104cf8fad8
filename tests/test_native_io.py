import glob
import os

import numpy as np
import pytest

from object_intrinsics_tpu.data import native_io

EXAMPLE = "/root/reference/data/example"


@pytest.mark.skipif(not native_io.available(), reason="native toolchain unavailable")
def test_png_decode_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    paths = sorted(glob.glob(os.path.join(EXAMPLE, "*.png")))[:3]
    if not paths:
        pytest.skip("reference data not mounted")
    for p in paths:
        ours = native_io.decode_png(p)
        assert ours is not None
        ref = cv2.cvtColor(cv2.imread(p, cv2.IMREAD_UNCHANGED), cv2.COLOR_BGRA2RGBA)
        assert ours.shape == ref.shape
        assert np.array_equal(ours, ref), np.abs(ours.astype(int) - ref.astype(int)).max()


@pytest.mark.skipif(not native_io.available(), reason="native toolchain unavailable")
def test_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(37, 53, 4), dtype=np.uint8)
    ours = native_io.resize_bilinear(img, (24, 16))
    ref = cv2.resize(img, (24, 16), interpolation=cv2.INTER_LINEAR)
    assert ours.shape == ref.shape
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # identical convention; allow 1-count rounding differences
    assert diff.max() <= 1, diff.max()


@pytest.mark.skipif(not native_io.available(), reason="native toolchain unavailable")
def test_dataset_uses_native_path():
    if not os.path.isdir(EXAMPLE):
        pytest.skip("reference data not mounted")
    from object_intrinsics_tpu.data.dataset import Dataset

    ds = Dataset(resolution=32, dataset_folder=EXAMPLE)
    assert ds.rgb.shape[1:] == (32, 32, 3)


def test_native_ckptpack_roundtrip(tmp_path):
    """Native .oipk checkpoint pack: atomic write + mmap read must
    round-trip a realistic training-state pytree bit-exactly, through both
    the raw pack API and save_pytree/load_pytree."""
    import numpy as np
    import pytest

    from object_intrinsics_tpu.utils import ckpt_native
    from object_intrinsics_tpu.utils.checkpoint import load_pytree, save_pytree

    if not ckpt_native.available():
        pytest.skip("native toolchain unavailable")

    rng = np.random.RandomState(0)
    state = {
        "params": {
            "generator": {"w": rng.randn(17, 33).astype(np.float32),
                          "layers": [rng.randn(4).astype(np.float32),
                                     rng.randn(2, 3).astype(np.float64)]},
        },
        "it": np.asarray(1234, dtype=np.int32),
        "flags": (np.asarray(1, np.int8), None),
    }
    p = str(tmp_path / "model.oipk")
    save_pytree(p, state, meta={"it": 1234, "epoch": 7})
    loaded, meta = load_pytree(p)
    assert meta["it"] == 1234 and meta["epoch"] == 7
    np.testing.assert_array_equal(loaded["params"]["generator"]["w"],
                                  state["params"]["generator"]["w"])
    np.testing.assert_array_equal(loaded["params"]["generator"]["layers"][1],
                                  state["params"]["generator"]["layers"][1])
    assert int(np.asarray(loaded["it"]).reshape(())) == 1234
    assert loaded["flags"][1] is None and isinstance(loaded["flags"], tuple)

    # zero-copy mmap views match and 64-byte alignment holds
    flat, meta2 = ckpt_native.read_pack(p, copy=False)
    for k, v in flat.items():
        assert not v.flags.writeable
        assert v.ctypes.data % 64 == 0 or v.size <= 1, k
    key = "params/generator/w"
    np.testing.assert_array_equal(flat[key], state["params"]["generator"]["w"])
    del flat, meta2  # release mapping


def test_ckptpack_selected_by_env(tmp_path, monkeypatch):
    import numpy as np
    import pytest

    from object_intrinsics_tpu.utils import ckpt_native
    from object_intrinsics_tpu.utils.checkpoint import CheckpointIO

    if not ckpt_native.available():
        pytest.skip("native toolchain unavailable")
    monkeypatch.setenv("OI_CKPT_FORMAT", "oipk")
    io = CheckpointIO(str(tmp_path))
    io.save("model", {"a": np.arange(5, dtype=np.float32)}, {"it": 1})
    assert (tmp_path / "model.oipk").exists()
    # load by basename and by the .npz name a caller might guess
    loaded, meta = io.load("model")
    np.testing.assert_array_equal(loaded["a"], np.arange(5, dtype=np.float32))
    loaded2, _ = io.load(str(tmp_path / "model.npz"))  # falls back to .oipk
    np.testing.assert_array_equal(loaded2["a"], np.arange(5, dtype=np.float32))
