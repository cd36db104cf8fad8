"""Image/grid/video dump helpers for training + inference visualization.

Covers tu/utils/visualize.py + src/utils/plot.py's normalize helper. Stills
go to PNG grids, sequences to GIF/MP4 via imageio (with a PNG-sequence
fallback)."""
from __future__ import annotations

import logging
import os
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0) * 255).astype(np.uint8)


def make_grid(images: np.ndarray, ncol: Optional[int] = None, pad: int = 2) -> np.ndarray:
    """(n, h, w, c) -> one (H, W, 3) grid image."""
    images = np.asarray(images)
    if images.ndim == 3:
        images = images[None]
    n, h, w, c = images.shape
    if c == 1:
        images = np.repeat(images, 3, axis=-1)
        c = 3
    ncol = ncol or int(np.ceil(np.sqrt(n)))
    nrow = int(np.ceil(n / ncol))
    grid = np.ones((nrow * (h + pad) - pad, ncol * (w + pad) - pad, c), dtype=images.dtype)
    for i in range(n):
        r, q = divmod(i, ncol)
        grid[r * (h + pad) : r * (h + pad) + h, q * (w + pad) : q * (w + pad) + w] = images[i]
    return grid


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(to_uint8(img)).save(path)


def save_image_grid(path: str, images: np.ndarray, ncol: Optional[int] = None) -> None:
    save_image(path, make_grid(images, ncol=ncol))


def normalize_batched_tensor(x: np.ndarray, xmin=None, xmax=None) -> np.ndarray:
    """Per-sample min/max normalization for depth-style maps
    (src/utils/plot.py:122-133)."""
    x = np.asarray(x, dtype=np.float32)
    axes = tuple(range(1, x.ndim))
    if xmin is None:
        xmin = x.min(axis=axes, keepdims=True)
    if xmax is None:
        xmax = x.max(axis=axes, keepdims=True)
    return (x - xmin) / np.maximum(xmax - xmin, 1e-8)


def has_mp4_backend() -> bool:
    try:
        import imageio_ffmpeg  # noqa: F401

        return True
    except ImportError:
        import shutil

        return shutil.which("ffmpeg") is not None


def save_video(path: str, frames: List[np.ndarray], fps: int = 25) -> str:
    """frames: list of (h, w, 3) float [0,1]. Writes GIF or MP4 by extension;
    silently downgrades mp4 -> gif when no ffmpeg backend exists. Returns the
    path actually written."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames8 = [to_uint8(f) for f in frames]
    import imageio

    if path.endswith(".mp4") and not has_mp4_backend():
        path = os.path.splitext(path)[0] + ".gif"
        logger.info("no mp4 backend available; writing %s", path)
    try:
        if path.endswith(".gif"):
            imageio.mimsave(path, frames8, duration=1000.0 / fps, loop=0)
        else:
            imageio.mimsave(path, frames8, fps=fps)
    except Exception as e:  # pragma: no cover
        logger.warning("video writer failed (%s); dumping PNG sequence", e)
        stem = os.path.splitext(path)[0]
        for i, f in enumerate(frames8):
            save_image(f"{stem}_{i:04d}.png", f / 255.0)
    return path
