"""Orthographic lit-sphere render for visualizing the learned light
direction (rebuilds src/utils/unit_sphere.py:8-59)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import lighting


class UnitSphere:
    def __init__(self, resolution: int, scale: float = 0.5):
        self.resolution = int(resolution)
        t = np.linspace(-1, 1, self.resolution) / scale
        xx, yy = np.meshgrid(t, t, indexing="xy")
        rr = xx**2 + yy**2
        inside = rr < 1.0
        zz = -np.sqrt(np.clip(1.0 - rr, 0.0, None))
        normals = np.stack([xx, yy, zz], axis=-1)
        normals = np.where(inside[..., None], normals, 0.0)
        self.normals = jnp.asarray(normals.astype(np.float32))  # (h, w, 3)
        self.mask = jnp.asarray(inside.astype(np.float32))[..., None]

    def render(self, light_params) -> dict:
        """Ambient + diffuse shading of a unit sphere seen from -z."""
        amb = lighting.ambient_color(light_params)
        diff = lighting.diffuse(
            self.normals, lighting.diffuse_color(light_params), lighting.direction(light_params)
        )
        shading = (amb + diff) * self.mask
        return {"shading_map": shading}  # (h, w, 3)
