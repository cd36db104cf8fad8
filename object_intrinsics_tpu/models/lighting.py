"""Learnable directional light with Lambertian diffuse + Phong specular.

Rebuilds src/models/lighting.py functionally. Parameterization (lighting.py:6-27):
  * ``param_ambient``  — logit of ambient/(ambient+diffuse); ambient+diffuse=1
  * ``param_direction``— unnormalized light direction (world frame)
  * ``param_shininess``— Phong exponent
  * ``param_specular`` — specular color scalar, clamped >= 0

The shading functions are pure and broadcast over (bs, n_pts, 3) batches; the
per-sample box-frame transform (BatchDirectionalLight..., lighting.py:79-119)
is just a rotation of the direction by w2b here.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import register_target
from ..utils.pose import look_at

Params = Dict[str, Any]


def init_light(
    direction: Sequence[float],
    ambient_color: float = 0.33,
    diffuse_color: float = 0.66,
    specular_color: float = 0.01,
    shininess: float = 10.0,
) -> Params:
    direction = np.asarray(direction, dtype=np.float32)
    assert np.allclose(np.linalg.norm(direction), 1.0), direction
    ratio = ambient_color / (ambient_color + diffuse_color)
    return {
        "param_ambient": jnp.asarray(np.log(ratio / (1 - ratio)), dtype=jnp.float32),
        "param_direction": jnp.asarray(direction),
        "param_shininess": jnp.asarray(shininess, dtype=jnp.float32),
        "param_specular": jnp.asarray(specular_color, dtype=jnp.float32),
    }


@register_target(
    "src.utils.prior.build_directional_light_optimizable",
    "object_intrinsics_tpu.models.lighting.build_directional_light_optimizable",
)
def build_directional_light_optimizable(
    cam_loc=None, light_loc=None, ambient_color=0.33, diffuse_color=0.66,
    specular_color=0.0, shininess=10.0,
):
    """Initial light direction in the camera frame from world-frame camera and
    light positions; collocated ``(0,0,-1)`` by default (src/utils/prior.py:31-49).
    Returns init kwargs consumed by the generator builder."""
    if cam_loc is None and light_loc is None:
        cam_loc = [0.0, 0.0, -1.0]
        light_loc = [0.0, 0.0, -1.0]
    dw = np.asarray(light_loc, dtype=np.float64)
    dw = dw / np.linalg.norm(dw)
    c2w = look_at(cam_loc)
    direction = (c2w.T @ dw).astype(np.float32)
    return dict(
        direction=direction,
        ambient_color=ambient_color,
        diffuse_color=diffuse_color,
        specular_color=specular_color,
        shininess=shininess,
    )


# --------------------------------------------------------------------------
# Derived quantities
# --------------------------------------------------------------------------

def ambient_color(p: Params) -> jnp.ndarray:
    return jnp.broadcast_to(jax.nn.sigmoid(p["param_ambient"]), (3,))


def diffuse_color(p: Params) -> jnp.ndarray:
    return jnp.broadcast_to(1.0 - jax.nn.sigmoid(p["param_ambient"]), (3,))


def specular_color(p: Params) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.maximum(p["param_specular"], 0.0), (3,))


def shininess(p: Params) -> jnp.ndarray:
    return p["param_shininess"]


def direction(p: Params) -> jnp.ndarray:
    d = p["param_direction"]
    return d / jnp.linalg.norm(d)


def batch_direction(p: Params, w2b: jnp.ndarray) -> jnp.ndarray:
    """World-frame light direction rotated into each sample's box frame
    (lighting.py:115-119). w2b: (bs, 4, 4) -> (bs, 3)."""
    return jnp.einsum("bij,j->bi", w2b[:, :3, :3], direction(p))


# --------------------------------------------------------------------------
# Shading (adapted from the PyTorch3D formulas the reference vendored,
# lighting.py:126-225)
# --------------------------------------------------------------------------

def _normalize(x, eps=1e-6):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def diffuse(normals: jnp.ndarray, color: jnp.ndarray, light_dir: jnp.ndarray) -> jnp.ndarray:
    """Lambert: color * relu(n . l). normals (..., 3); light_dir broadcastable."""
    n = _normalize(normals)
    l = _normalize(light_dir)
    angle = jax.nn.relu(jnp.sum(n * l, axis=-1))
    return color * angle[..., None]


def specular(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    light_dir: jnp.ndarray,
    color: jnp.ndarray,
    camera_position: jnp.ndarray,
    shininess: jnp.ndarray,
) -> jnp.ndarray:
    """Phong: color * relu(v . reflect(l, n))^shininess, gated on n.l > 0."""
    n = _normalize(normals)
    l = _normalize(light_dir)
    cos_angle = jnp.sum(n * l, axis=-1)
    mask = (cos_angle > 0).astype(points.dtype)
    view_dir = _normalize(camera_position - points)
    reflect_dir = -l + 2.0 * cos_angle[..., None] * n
    alpha = jax.nn.relu(jnp.sum(view_dir * reflect_dir, axis=-1)) * mask
    return color * jnp.power(alpha, shininess)[..., None]
