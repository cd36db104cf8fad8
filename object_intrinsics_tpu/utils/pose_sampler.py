"""Pose-prior samplers producing batched box-to-world SE(3) poses.

Rebuilds src/utils/pose_sampler.py as *device-side, jit-compatible* samplers:
the reference samples poses with numpy/scipy on the host every step (a
host->device sync per iteration); here each sampler is a pure function of a
PRNG key with static shapes, so pose sampling fuses into the jitted train
step. The reference's rejection sampling (pose_sampler.py:120-137) becomes
fixed-budget oversampling + stable sort, which is XLA-friendly.

All samplers return b2w poses of shape (bs, 4, 4).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import register_target
from .pose import (
    assemble_rot_trans,
    get_lookat_mat,
    look_at,
    mat_33_to_44,
    mat_33_to_44_np,
    quat_to_mat,
    rotvec_to_mat,
)


class BasePose:
    """Interface: __call__(key, bs) -> (bs, 4, 4) b2w poses (jnp)."""

    repr_dim: int = 6

    def __call__(self, key: jax.Array, bs: int) -> jnp.ndarray:
        raise NotImplementedError

    @property
    def canonical(self) -> np.ndarray:
        raise NotImplementedError

    @property
    def canonical_vec(self) -> np.ndarray:
        raise NotImplementedError

    @staticmethod
    def pose_to_vec_repr(pose: jnp.ndarray) -> jnp.ndarray:
        return pose[..., :2, :3].reshape(*pose.shape[:-2], 6)


def _sample_uniform_rotations(key: jax.Array, n: int) -> jnp.ndarray:
    """Uniform random rotations via normalized 4-d gaussians (Haar measure)."""
    q = jax.random.normal(key, (n, 4), dtype=jnp.float32)
    return quat_to_mat(q)


@register_target(
    "src.utils.pose_sampler.Sphere",
    "src.utils.pose_sampler.SphereDown0p3",
    "object_intrinsics_tpu.utils.pose_sampler.Sphere",
)
class Sphere(BasePose):
    """Uniform rotations filtered by a view-cone on the forward axis, then a
    random roll about the canonical axis (src/utils/pose_sampler.py:28-60).

    Rejection sampling runs on-device as a ``lax.while_loop`` over fixed-size
    candidate batches: each round draws bs*OVERSAMPLE uniform rotations and
    fills still-empty slots with accepted ones, looping until every slot is
    filled — like the reference's host-side rejection loop
    (pose_sampler.py:120-137), this *never* returns a rejected pose (a fixed
    single-round oversample leaks a rejected rotation with probability
    0.75^16 ~ 1% per step at bs=1). Acceptance region (vec_z < 0,
    -0.7 < vec_y < 0.3) covers ~25% of the sphere, so the loop almost always
    exits after one round.
    """

    OVERSAMPLE = 16

    def __init__(self):
        self._canonical_vec = np.array([0.0, 0.0, 1.0], dtype=np.float32)

    @property
    def canonical_vec(self) -> np.ndarray:
        return self._canonical_vec

    @property
    def canonical(self) -> np.ndarray:
        """Representative display pose: the rotation mapping the canonical
        axis to the center of the acceptance band (vec = (0, -0.2, -0.98)),
        zero roll. The reference raises NotImplementedError here and
        instead special-cases its Sphere datasets by folder name in
        scripts/test.py:24-31 ('rose'); defining a canonical makes camera/
        latent walks work for ANY Sphere-prior dataset (e.g.
        data/synth_sphere) without a named hack.
        """
        f = np.array([0.0, -0.2, -np.sqrt(1.0 - 0.04)], dtype=np.float64)
        up = np.array([0.0, 1.0, 0.0])
        r = np.cross(up, f)
        r /= np.linalg.norm(r)
        u = np.cross(f, r)
        rot = np.stack([r, u, f], axis=-1)  # columns: rot @ z = f
        return mat_33_to_44_np(rot)

    def __call__(self, key: jax.Array, bs: int) -> jnp.ndarray:
        k_rot, k_roll = jax.random.split(key)
        n = bs * self.OVERSAMPLE
        cvec = jnp.asarray(self._canonical_vec)

        def draw(k):
            rot = _sample_uniform_rotations(k, n)  # (n, 3, 3)
            vec = jnp.einsum("nij,j->ni", rot, cvec)
            accept = (vec[:, 2] < 0) & (vec[:, 1] > -0.7) & (vec[:, 1] < 0.3)
            order = jnp.argsort(~accept, stable=True)  # accepted first
            return rot[order[:bs]], accept[order[:bs]]

        def body(carry):
            k, rot, ok = carry
            k, sub = jax.random.split(k)
            cand, cand_ok = draw(sub)
            rot = jnp.where(ok[:, None, None], rot, cand)
            return k, rot, ok | cand_ok

        k_next, sub0 = jax.random.split(k_rot)
        rot0, ok0 = draw(sub0)
        _, rot, _ = jax.lax.while_loop(
            lambda c: ~jnp.all(c[2]), body, (k_next, rot0, ok0)
        )

        trans = jnp.einsum("bij,j->bi", rot, cvec)
        mat = assemble_rot_trans(rot, trans)

        theta = jax.random.uniform(k_roll, (bs,), minval=0.0, maxval=2 * jnp.pi)
        roll = rotvec_to_mat(cvec[None, :] * theta[:, None])
        return mat @ mat_33_to_44(roll)


@register_target(
    "src.utils.pose_sampler.Plane",
    "object_intrinsics_tpu.utils.pose_sampler.Plane",
)
class Plane(BasePose):
    """Objects standing on a ground plane seen by a fixed camera: yaw about the
    plane normal, planar xy translation, roll about the camera axis
    (src/utils/pose_sampler.py:66-90, 158-261). Fully closed-form."""

    def __init__(
        self,
        cam_loc: Sequence[float],
        rot_degree_range_scale: Union[float, Sequence[Sequence[float]]],
        xy_range_scale: Union[float, Sequence[float]],
        rot_roll_degree_range_scale: Union[float, Sequence[Sequence[float]]],
    ):
        self.cam_loc = tuple(float(v) for v in cam_loc)
        self.rot_degree_range_scale = rot_degree_range_scale
        if isinstance(xy_range_scale, (int, float)):
            xy_range_scale = (xy_range_scale, xy_range_scale)
        self.xy_range_scale = tuple(float(v) for v in xy_range_scale)
        self.rot_roll_degree_range_scale = rot_roll_degree_range_scale

        c2p = get_lookat_mat(self.cam_loc)  # camera -> physical world
        self._p2c_rot = c2p[:3, :3].T.astype(np.float32)
        self._vec_phy = np.array([0.0, -1.0, 0.0], dtype=np.float32)
        self._vec_cam = (self._p2c_rot @ self._vec_phy).astype(np.float32)
        # canonical pose: physical->camera rotation (pose_sampler.py:74-79)
        self._canonical = mat_33_to_44_np(self._p2c_rot)
        self._canonical_vec = np.array([0.0, -1.0, 0.0], dtype=np.float32)

    @property
    def canonical(self) -> np.ndarray:
        return self._canonical

    @property
    def canonical_vec(self) -> np.ndarray:
        return self._canonical_vec

    @staticmethod
    def _sample_angle_from_spec(u: jnp.ndarray, spec, centered: bool, half_open_high: Optional[float] = None):
        """Either ``(u - 0.5) * scale`` (degrees) for scalar spec, or uniform
        over a union of [lo, hi] degree intervals for a list spec — matching
        pose_sampler.py:197-205 (which scales the *raw* uniform by the chosen
        bin width) and uniform_sample_from_set_of_range (pose_sampler.py:140)."""
        if isinstance(spec, (int, float)):
            if centered:
                return (u - 0.5) * float(spec) / 180.0 * jnp.pi
            hi = float(spec) if half_open_high is None else half_open_high
            return u * hi / 180.0 * jnp.pi
        widths = np.asarray([r[1] - r[0] for r in spec], dtype=np.float32) / 180.0 * np.pi
        starts = np.asarray([r[0] for r in spec], dtype=np.float32) / 180.0 * np.pi
        probs = np.cumsum(widths / widths.sum())
        idx = jnp.searchsorted(jnp.asarray(probs), u, side="right")
        idx = jnp.clip(idx, 0, len(spec) - 1)
        return jnp.asarray(starts)[idx] + u * jnp.asarray(widths)[idx]

    def __call__(self, key: jax.Array, bs: int) -> jnp.ndarray:
        k_raw, k_roll = jax.random.split(key)
        rand_raw = jax.random.uniform(k_raw, (bs, 3), dtype=jnp.float32)

        theta = self._sample_angle_from_spec(rand_raw[:, 0], self.rot_degree_range_scale, centered=True)
        vec_phy = jnp.asarray(self._vec_phy)
        rot = rotvec_to_mat(vec_phy[None, :] * theta[:, None])  # physical frame
        rot = jnp.asarray(self._p2c_rot)[None] @ rot  # camera frame

        sx, sy = self.xy_range_scale
        x = (rand_raw[:, 1] * 2 - 1) * sx
        y = (rand_raw[:, 2] * 2 - 1) * sy
        vc = self._vec_cam
        if abs(float(vc[2])) < 1e-8:
            z = jnp.zeros_like(x)
        else:
            z = -(float(vc[0]) * x + float(vc[1]) * y) / float(vc[2])
        mat = assemble_rot_trans(rot, jnp.stack([x, y, z], axis=-1))

        u_roll = jax.random.uniform(k_roll, (bs,), dtype=jnp.float32)
        # scalar roll spec samples U(0, scale) degrees (pose_sampler.py:255-257)
        roll_angle = self._sample_angle_from_spec(
            u_roll, self.rot_roll_degree_range_scale, centered=False
        )
        z_axis = jnp.array([0.0, 0.0, 1.0], dtype=jnp.float32)
        roll = rotvec_to_mat(z_axis[None, :] * roll_angle[:, None])
        return mat @ mat_33_to_44(roll)


@register_target(
    "src.utils.pose_sampler.Hemisphere",
    "object_intrinsics_tpu.utils.pose_sampler.Hemisphere",
)
class Hemisphere(BasePose):
    """Upper-hemisphere viewpoints around a canonical camera
    (src/utils/pose_sampler.py:93-115)."""

    def __init__(self):
        self._c2w_canonical = look_at(eye=(0.0, 4.0, -0.5)).astype(np.float32)
        self._canonical_vec = np.array([0.0, 0.0, 1.0], dtype=np.float32)

    @property
    def canonical(self) -> np.ndarray:
        return mat_33_to_44_np(self._c2w_canonical.T)

    @property
    def canonical_vec(self) -> np.ndarray:
        return self._canonical_vec

    def __call__(self, key: jax.Array, bs: int) -> jnp.ndarray:
        u = jax.random.uniform(key, (bs, 2), dtype=jnp.float32)
        ax = jnp.abs(jnp.arccos(1 - 2 * u[:, 0]) - jnp.pi / 2)
        az = u[:, 1] * 2 * jnp.pi
        # intrinsic XYZ euler with zero Y: R = Rx(ax) @ Rz(az)
        x_axis = jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32)
        z_axis = jnp.array([0.0, 0.0, 1.0], dtype=jnp.float32)
        rot = rotvec_to_mat(x_axis[None] * ax[:, None]) @ rotvec_to_mat(z_axis[None] * az[:, None])
        rot = jnp.swapaxes(rot, -2, -1)
        c2w = rot @ jnp.asarray(self._c2w_canonical)[None]
        b2w = jnp.swapaxes(c2w, -2, -1)
        return mat_33_to_44(b2w)
