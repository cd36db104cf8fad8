"""Camera/pose wireframe plots and histogram dumps (rebuilds src/utils/plot.py).

Headless by default (Agg backend, saves PNG) — the reference used TkAgg +
plt.show() which is not CI-runnable (tests/test_pose_prior.py:8,26 there).
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def _camera_wireframe(scale: float = 0.3):
    """Canonical camera frustum wireframe in camera coords (apex at origin,
    looking down +z)."""
    a = scale
    corners = np.array(
        [[-a, -a, 2 * a], [a, -a, 2 * a], [a, a, 2 * a], [-a, a, 2 * a]], dtype=np.float32
    )
    apex = np.zeros((1, 3), dtype=np.float32)
    segs = []
    for i in range(4):
        segs.append([apex[0], corners[i]])
        segs.append([corners[i], corners[(i + 1) % 4]])
    # up-indicator
    segs.append([corners[3], np.array([0, 1.6 * a, 2 * a], dtype=np.float32)])
    segs.append([np.array([0, 1.6 * a, 2 * a], dtype=np.float32), corners[2]])
    return np.asarray(segs)  # (n_segs, 2, 3)


def plot_camera_scene(
    poses: np.ndarray,
    out_path: Optional[str] = None,
    title: str = "",
    scale: float = 0.3,
    show_origin_sphere: bool = True,
):
    """3D wireframe plot of a batch of SE(3) camera/object poses (b, 4, 4)
    (src/utils/plot.py:18-110 analog). Saves PNG when out_path is given."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    poses = np.asarray(poses)
    if poses.ndim == 2:
        poses = poses[None]
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    segs = _camera_wireframe(scale)
    cmap = plt.get_cmap("viridis")
    for i, pose in enumerate(poses):
        rot, t = pose[:3, :3], pose[:3, 3]
        w = segs @ rot.T + t
        color = cmap(i / max(len(poses) - 1, 1))
        for seg in w:
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color=color, linewidth=0.8)
    if show_origin_sphere:
        u, v = np.mgrid[0 : 2 * np.pi : 24j, 0 : np.pi : 12j]
        ax.plot_wireframe(
            np.cos(u) * np.sin(v), np.sin(u) * np.sin(v), np.cos(v),
            color="gray", alpha=0.2, linewidth=0.3,
        )
    ax.set_title(title)
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    lim = max(1.5, np.abs(poses[:, :3, 3]).max() + 0.5)
    ax.set_xlim(-lim, lim); ax.set_ylim(-lim, lim); ax.set_zlim(-lim, lim)
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        fig.savefig(out_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def dump_histogram(values: np.ndarray, out_path: str, bins: int = 50, title: str = ""):
    """src/utils/plot.py:113 analog."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.hist(np.asarray(values).ravel(), bins=bins)
    ax.set_title(title)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def normalize_batched_tensor(x, xmin=None, xmax=None):
    from .visualize import normalize_batched_tensor as f

    return f(x, xmin=xmin, xmax=xmax)
