import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from object_intrinsics_tpu.utils import pose
from object_intrinsics_tpu.utils.pose_sampler import Hemisphere, Plane, Sphere


def test_look_at_matches_scipy_convention():
    rot = pose.look_at([0.0, 0.0, -1.0])
    assert np.allclose(rot, np.eye(3), atol=1e-6)
    rot = pose.look_at([1.0, 1.0, 1.0])
    # orthonormal, det +1, forward column points at origin
    assert np.allclose(rot @ rot.T, np.eye(3), atol=1e-5)
    assert np.isclose(np.linalg.det(rot), 1.0, atol=1e-5)
    fwd = rot[:, 2]
    assert np.allclose(fwd, -np.array([1, 1, 1]) / np.sqrt(3), atol=1e-5)


def test_look_at_degenerate_up():
    rot = pose.look_at([0.0, -1.0, 0.0])  # forward == up == +y
    expected = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=np.float32)
    assert np.allclose(rot, expected)


def test_invert_rot_t_roundtrip():
    rng = np.random.RandomState(0)
    rot = R.random(8, random_state=rng).as_matrix()
    t = rng.randn(8, 3)
    p = pose.assemble_rot_trans_np(rot.astype(np.float32), t.astype(np.float32))
    inv = pose.invert_rot_t_np(p)
    assert np.allclose(np.einsum("bij,bjk->bik", p, inv), np.eye(4), atol=1e-5)
    # jnp variant agrees
    inv_j = np.asarray(pose.invert_rot_t(jnp.asarray(p)))
    assert np.allclose(inv, inv_j, atol=1e-5)


def test_rotvec_to_mat_matches_scipy():
    rng = np.random.RandomState(1)
    v = rng.randn(16, 3).astype(np.float32)
    ours = np.asarray(pose.rotvec_to_mat(jnp.asarray(v)))
    ref = R.from_rotvec(v).as_matrix()
    assert np.allclose(ours, ref, atol=1e-5)
    # zero rotvec -> identity
    assert np.allclose(np.asarray(pose.rotvec_to_mat(jnp.zeros((1, 3)))), np.eye(3), atol=1e-6)


def test_quat_to_mat_valid_rotations():
    q = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
    m = np.asarray(pose.quat_to_mat(q))
    prod = np.einsum("bij,bkj->bik", m, m)
    assert np.allclose(prod, np.eye(3), atol=1e-5)
    assert np.allclose(np.linalg.det(m), 1.0, atol=1e-4)


def test_6d_codec_roundtrip():
    rng = np.random.RandomState(2)
    rot = R.random(8, random_state=rng).as_matrix().astype(np.float32)
    t = rng.randn(8, 3).astype(np.float32)
    p = pose.assemble_rot_trans_np(rot, t)
    d9 = pose.pose_to_d9(jnp.asarray(p))
    back = np.asarray(pose.d9_to_pose(d9))
    assert np.allclose(back, p, atol=1e-4)


def test_plane_sampler_geometry():
    sampler = Plane(
        cam_loc=[0, -1, 0],
        rot_degree_range_scale=360,
        xy_range_scale=[6, 3.5],
        rot_roll_degree_range_scale=20,
    )
    b2w = np.asarray(sampler(jax.random.PRNGKey(0), 64))
    assert b2w.shape == (64, 4, 4)
    rot = b2w[:, :3, :3]
    assert np.allclose(np.einsum("bij,bkj->bik", rot, rot), np.eye(3), atol=1e-4)
    t = b2w[:, :3, 3]
    # cam_loc (0,-1,0): vec_cam = (0,0,-1) -> planar translation has z == 0
    assert np.allclose(t[:, 2], 0.0, atol=1e-5)
    assert np.all(np.abs(t[:, 0]) <= 6.0 + 1e-5)
    assert np.all(np.abs(t[:, 1]) <= 3.5 + 1e-5)
    # canonical pose is p2c rotation
    assert sampler.canonical.shape == (4, 4)


def test_sphere_sampler_view_cone():
    sampler = Sphere()
    b2w = np.asarray(sampler(jax.random.PRNGKey(1), 128))
    rot = b2w[:, :3, :3]
    # b2w includes the roll about canonical_vec; the forward axis is preserved
    vec = np.einsum("bij,j->bi", rot, sampler.canonical_vec)
    assert np.all(vec[:, 2] < 0)
    assert np.all(vec[:, 1] > -0.7) and np.all(vec[:, 1] < 0.3)
    # translation == rotated canonical vec (pre-roll rotation applied to it)
    t = b2w[:, :3, 3]
    assert np.allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-4)


def test_sphere_canonical_is_a_valid_in_band_pose():
    """Sphere.canonical (our extension: the reference raises and relies on
    per-dataset name hacks in scripts/test.py:24-31) must be a proper
    rotation whose forward direction lies inside the sampler's own
    acceptance band — so camera walks composed about canonical_vec show
    plausible views for any Sphere-prior dataset."""
    from object_intrinsics_tpu.utils.pose_sampler import Sphere

    sampler = Sphere()
    c = sampler.canonical
    assert c.shape == (4, 4)
    assert np.allclose(c[:3, 3], 0.0)
    R = c[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.isclose(np.linalg.det(R), 1.0, atol=1e-6)
    vec = R @ sampler.canonical_vec
    assert vec[2] < 0 and -0.7 < vec[1] < 0.3


def test_hemisphere_sampler_rotation_only():
    sampler = Hemisphere()
    b2w = np.asarray(sampler(jax.random.PRNGKey(2), 32))
    assert np.allclose(b2w[:, :3, 3], 0.0)
    rot = b2w[:, :3, :3]
    assert np.allclose(np.einsum("bij,bkj->bik", rot, rot), np.eye(3), atol=1e-4)
