"""SE(3) pose math, numpy (host/setup) and jax.numpy (traced) variants.

Covers the reference's src/utils/pose.py: look_at, SE(3) assembly/inversion,
33/34 -> 44 padding, 6d rotation codecs (Zhou et al.), pose interpolation and
camera intrinsics builders. Everything here is pure and shape-static so the
jnp variants can be used inside jit.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# --------------------------------------------------------------------------
# look-at (host, numpy)
# --------------------------------------------------------------------------

def look_at(eye, center=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Rotation whose columns are (right, up, forward); matches the reference
    convention (src/utils/pose.py:13-61) including the degenerate
    forward == up == +y special case."""
    eye = np.asarray(eye, dtype=np.float64)
    center = np.asarray(center, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)

    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = up / np.linalg.norm(up)

    if np.allclose(fwd, [0.0, 1.0, 0.0]) and np.allclose(up, [0.0, 1.0, 0.0]):
        # Degenerate: camera looking straight "up" the up-axis
        # (src/utils/pose.py:26-40).
        return np.array(
            [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]], dtype=np.float32
        )

    right = np.cross(up, fwd)
    right = right / np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    up2 = up2 / np.linalg.norm(up2)
    rot = np.stack([right, up2, fwd], axis=-1).astype(np.float32)
    return rot


def get_lookat_mat(eye, center=(0.0, 0.0, 0.0)) -> np.ndarray:
    rot = look_at(eye, center=center)
    return assemble_rot_trans_np(rot, np.asarray(eye, dtype=np.float32))


def get_identity_pose(cam_dist: float = 1.0):
    """Canonical camera: at ``cam_dist * (0,0,-1)`` looking at the origin
    (src/utils/pose.py:190-206). Returns (c2w, w2c) as (4,4) float32."""
    assert cam_dist > 0
    t = np.array([0.0, 0.0, -1.0], dtype=np.float32)
    rot = look_at(t)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = rot
    c2w[:3, 3] = cam_dist * t
    return c2w, invert_rot_t_np(c2w)


# --------------------------------------------------------------------------
# SE(3) assembly / inversion
# --------------------------------------------------------------------------

def mat_33_to_44_np(x: np.ndarray) -> np.ndarray:
    out = np.zeros((*x.shape[:-2], 4, 4), dtype=x.dtype)
    out[..., :3, :3] = x
    out[..., 3, 3] = 1.0
    return out


def mat_34_to_44_np(x: np.ndarray) -> np.ndarray:
    out = np.zeros((*x.shape[:-2], 4, 4), dtype=x.dtype)
    out[..., :3, :4] = x
    out[..., 3, 3] = 1.0
    return out


def assemble_rot_trans_np(rot: np.ndarray, trans: np.ndarray) -> np.ndarray:
    pose = np.concatenate([rot, trans.reshape(*rot.shape[:-2], 3, 1)], axis=-1)
    return mat_34_to_44_np(pose)


def invert_rot_t_np(pose: np.ndarray) -> np.ndarray:
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    rot_inv = np.swapaxes(rot, -2, -1)
    t_inv = -np.einsum("...ij,...j->...i", rot_inv, t)
    return assemble_rot_trans_np(rot_inv, t_inv)


# jnp variants (usable inside jit) ------------------------------------------

def mat_33_to_44(x: jnp.ndarray) -> jnp.ndarray:
    pad = jnp.zeros((*x.shape[:-2], 3, 1), dtype=x.dtype)
    top = jnp.concatenate([x, pad], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=x.dtype), (*x.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def assemble_rot_trans(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    pose34 = jnp.concatenate([rot, trans[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), (*rot.shape[:-2], 1, 4)
    )
    return jnp.concatenate([pose34, bottom], axis=-2)


def invert_rot_t(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert an SE(3) pose (rotation + translation), (..., 4, 4)."""
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    rot_inv = jnp.swapaxes(rot, -2, -1)
    t_inv = -jnp.einsum("...ij,...j->...i", rot_inv, t)
    return assemble_rot_trans(rot_inv, t_inv)


# --------------------------------------------------------------------------
# Rotation constructions (jnp, traced)
# --------------------------------------------------------------------------

def rotvec_to_mat(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    theta = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-12)
    axis = rotvec / safe
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    t = theta[..., None]
    eye = jnp.eye(3, dtype=rotvec.dtype)
    R = eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)
    # theta ~ 0: R -> I
    return jnp.where(t > 1e-12, R, jnp.broadcast_to(eye, R.shape))


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) (x, y, z, w) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


# --------------------------------------------------------------------------
# 6d / 9d rotation codecs (Zhou et al.) — src/utils/pose.py:411-449
# --------------------------------------------------------------------------

def pose_to_d9(pose: jnp.ndarray) -> jnp.ndarray:
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    r6 = rot[..., :2, :3].reshape(*rot.shape[:-2], 6)
    return jnp.concatenate([t, r6], axis=-1)


def r6d2mat(d6: jnp.ndarray) -> jnp.ndarray:
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def d9_to_pose(d9: jnp.ndarray) -> jnp.ndarray:
    t = d9[..., :3]
    rot = r6d2mat(d9[..., 3:])
    return assemble_rot_trans(rot, t)


def pose_to_vec_repr(pose: jnp.ndarray) -> jnp.ndarray:
    """First two rotation rows, the 6-d pose target for the discriminator's
    auxiliary pose head (src/utils/pose_sampler.py:19-21)."""
    return pose[..., :2, :3].reshape(*pose.shape[:-2], 6)


# --------------------------------------------------------------------------
# Pose interpolation (host, numpy) — src/utils/pose.py:371-387
# --------------------------------------------------------------------------

def interpolate_pose(c2w_0: np.ndarray, c2w_1: np.ndarray, ratio: float) -> np.ndarray:
    from scipy.spatial.transform import Rotation as R
    from scipy.spatial.transform import Slerp

    pose_0 = np.linalg.inv(np.asarray(c2w_0, dtype=np.float64))
    pose_1 = np.linalg.inv(np.asarray(c2w_1, dtype=np.float64))
    rots = R.from_matrix(np.stack([pose_0[:3, :3], pose_1[:3, :3]]))
    slerp = Slerp([0, 1], rots)
    pose = np.eye(4, dtype=np.float64)
    pose[:3, :3] = slerp(ratio).as_matrix()
    pose[:3, 3] = ((1.0 - ratio) * pose_0 + ratio * pose_1)[:3, 3]
    return np.linalg.inv(pose).astype(np.float32)


def get_tip_from_spherical_coord(elev, azim) -> np.ndarray:
    """src/utils/pose.py:452-457."""
    elev = np.asarray(elev)
    azim = np.asarray(azim)
    z = -np.sin(elev) * np.cos(azim)
    x = np.sin(elev) * np.sin(azim)
    y = -np.cos(elev)
    return np.stack([x, y, z], axis=-1)


# --------------------------------------------------------------------------
# Camera intrinsics — src/models/camera_network.py:15-23
# --------------------------------------------------------------------------

def camera_intrinsics(resolution: int, fov_deg: float) -> np.ndarray:
    focal = (resolution / 2.0) / np.tan(0.5 * fov_deg * np.pi / 180.0)
    return np.array(
        [
            [focal, 0, 0.5 * resolution, 0],
            [0, focal, 0.5 * resolution, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
