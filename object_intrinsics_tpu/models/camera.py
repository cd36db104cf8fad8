"""Fixed pinhole scene camera (src/models/camera_network.py).

Pure constants derived from (resolution, fov, cam_dist); stored as a frozen
dataclass so it can ride inside static (hashable) generator configs. The
canonical pose places the camera at ``cam_dist * (0,0,-1)`` looking at the
origin with identity rotation (src/utils/pose.py:190-206).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..utils.config import register_target
from ..utils.pose import camera_intrinsics, get_identity_pose


@register_target(
    "src.models.camera_network.Camera",
    "object_intrinsics_tpu.models.camera.Camera",
)
@dataclasses.dataclass(frozen=True)
class Camera:
    cam_dist: float
    fov: float
    resolution: int

    @property
    def focal(self) -> float:
        return (self.resolution / 2.0) / np.tan(0.5 * self.fov * np.pi / 180.0)

    @property
    def intrinsics(self) -> np.ndarray:
        return camera_intrinsics(self.resolution, self.fov)

    @property
    def intrinsics_inv(self) -> np.ndarray:
        return np.linalg.inv(self.intrinsics).astype(np.float32)

    @property
    def c2w(self) -> np.ndarray:
        return get_identity_pose(self.cam_dist)[0]

    @property
    def w2c(self) -> np.ndarray:
        return get_identity_pose(self.cam_dist)[1]
