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
