import os

import numpy as np
import pytest

from object_intrinsics_tpu.data.dataset import Dataset

EXAMPLE = "/root/reference/data/example"


@pytest.mark.skipif(not os.path.isdir(EXAMPLE), reason="reference data not mounted")
def test_dataset_shapes_and_compositing():
    ds = Dataset(resolution=64, dataset_folder=EXAMPLE)
    assert len(ds) > 0
    item = ds.get(0)
    assert item["image"].shape == (64, 64, 3)
    assert item["mask"].shape == (64, 64, 1)
    assert set(np.unique(item["mask"])) <= {0.0, 1.0}
    # background region is a constant color; two draws differ there
    item2 = ds.get(0)
    bg = item["mask"][..., 0] == 0
    if bg.any():
        a = item["image"][bg]
        b = item2["image"][bg]
        assert np.allclose(a, a[0], atol=1e-6)  # constant bg color
        assert not np.allclose(a[0], b[0])  # fresh random bg each access
    fg = item["mask"][..., 0] == 1
    assert np.allclose(item["image"][fg], item2["image"][fg])


@pytest.mark.skipif(not os.path.isdir(EXAMPLE), reason="reference data not mounted")
def test_batches_iterator():
    ds = Dataset(resolution=32, dataset_folder=EXAMPLE)
    it = ds.batches(batch_size=4, seed=0)
    b1 = next(it)
    assert b1["image"].shape == (4, 32, 32, 3)
    assert b1["mask"].shape == (4, 32, 32, 1)
    b2 = next(it)
    assert not np.allclose(b1["image"], b2["image"])
