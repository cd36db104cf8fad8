"""Multi-instance RGBA crop dataset with random-background compositing.

Rebuilds src/datasets/eval_dataset.py + src/utils/preprocess.py: every *.png
in the dataset folder is an RGBA crop of one object instance; images load
once, resize to the training resolution, and each access composites the RGB
over a fresh random background color using the binarized alpha.

TPU-first divergences: NHWC layout; batches are produced host-side as numpy
(one small host->device transfer per step) by an infinite shuffled iterator
(replacing torch DataLoader + DistributedSampler); for data parallelism the
iterator yields the *global* batch which the caller shards over the mesh.
"""
from __future__ import annotations

import glob
import logging
import os
from typing import Dict, Iterator, Optional

import numpy as np

from ..utils.config import register_target

logger = logging.getLogger(__name__)


def read_rgba(path: str, size: Optional[tuple] = None, mask_threshold: int = 128):
    """RGBA png -> (rgb uint8 (h,w,3), mask bool (h,w)).

    Decode/resize order of preference: native C++ library (native/dataio.cpp,
    our replacement for the reference's cv2 dependency,
    src/utils/preprocess.py:5-20) -> cv2 -> PIL."""
    from . import native_io

    if native_io.available():
        arr = native_io.decode_png(path)
        if arr is not None and arr.shape[2] == 4:
            if size is not None:
                arr = native_io.resize_bilinear(arr, size)
            return arr[:, :, :3], arr[:, :, 3] >= mask_threshold

    arr = None
    try:
        import cv2

        raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if raw is None:
            raise ValueError(f"failed to read {path}")
        assert raw.shape[2] == 4, raw.shape
        arr = cv2.cvtColor(raw, cv2.COLOR_BGRA2RGBA)
        if size is not None:
            arr = cv2.resize(arr, size, interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        from PIL import Image

        img = Image.open(path).convert("RGBA")
        if size is not None:
            img = img.resize(size, Image.BILINEAR)
        arr = np.asarray(img)
    rgb = arr[:, :, :3]
    mask = arr[:, :, 3] >= mask_threshold
    return rgb, mask


@register_target(
    "src.datasets.eval_dataset.Dataset",
    "object_intrinsics_tpu.data.dataset.Dataset",
)
class Dataset:
    def __init__(self, resolution: int, dataset_folder: str, seed: int = 0):
        self.resolution = int(resolution)
        self.dataset_folder = dataset_folder
        paths = sorted(glob.glob(os.path.join(dataset_folder, "*.png")))
        logger.info("found %d images in %s", len(paths), dataset_folder)
        if not paths:
            raise FileNotFoundError(f"no *.png in {dataset_folder}")
        self.paths = paths

        rgb_list, mask_list = [], []
        for p in paths:
            rgb, mask = read_rgba(p, size=(self.resolution, self.resolution))
            rgb_list.append(rgb)
            mask_list.append(mask)
        self.rgb = np.stack(rgb_list).astype(np.float32) / 255.0  # (n, h, w, 3)
        self.alpha = np.stack(mask_list).astype(np.float32)[..., None]  # (n, h, w, 1)
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.paths)

    def get(self, index: int, rng: Optional[np.random.RandomState] = None) -> Dict:
        rng = rng or self._rng
        rgb = self.rgb[index]
        alpha = self.alpha[index]
        bg = rng.uniform(0, 1, size=(1, 1, 3)).astype(np.float32)
        return {
            "image": rgb * alpha + bg * (1 - alpha),
            "mask": alpha,
            "image_path": self.paths[index],
            "pose_indices": index,
        }

    def batches(self, batch_size: int, seed: int = 0, drop_last: bool = True) -> Iterator[Dict]:
        """Infinite shuffled epoch iterator yielding stacked numpy batches."""
        rng = np.random.RandomState(seed)
        n = len(self)
        while True:
            order = rng.permutation(n)
            stop = n - n % batch_size if drop_last else n
            for i in range(0, stop, batch_size):
                idx = order[i : i + batch_size]
                items = [self.get(int(j), rng) for j in idx]
                yield {
                    "image": np.stack([it["image"] for it in items]),
                    "mask": np.stack([it["mask"] for it in items]),
                    "pose_indices": np.asarray([it["pose_indices"] for it in items]),
                }
