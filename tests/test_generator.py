import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _generator_cfg
from object_intrinsics_tpu.models import lighting
from object_intrinsics_tpu.models.generator import build_rays, near_far_from_sphere
from object_intrinsics_tpu.utils.config import build_from_config


@pytest.fixture(scope="module")
def gen():
    return build_from_config(_generator_cfg(resolution=32, n_samples=8, n_importance=4))


@pytest.fixture(scope="module")
def params(gen):
    return gen.init(jax.random.PRNGKey(0))


def test_rays_at_identity_pose_centered(gen, params):
    """With b2w = I the box sits at the origin: the crop is centered in the
    scene image and the central ray points straight at the box."""
    b2w = jnp.eye(4)[None]
    prior = gen.sample_prior(params, jax.random.PRNGKey(0), 1, {"b2w": b2w})
    rays = gen.gen_rays_at({}, prior)
    res, scene_res = gen.resolution, gen.scene_resolution
    assert np.allclose(np.asarray(rays["x_offset"]), (scene_res - res) / 2, atol=1e-3)
    assert np.allclose(np.asarray(rays["y_offset"]), (scene_res - res) / 2, atol=1e-3)
    # central ray direction ~ +z in box frame (camera at -z looking at origin)
    c = res // 2
    d = np.asarray(rays["rays_d"])[0, c, c]
    assert d[2] > 0.999, d
    # ray origins at camera position in box frame: distance cam_dist
    o = np.asarray(rays["rays_o"])[0, 0, 0]
    assert abs(np.linalg.norm(o) - gen.camera.cam_dist) < 1e-3


def test_near_far_bracket_unit_sphere():
    o = jnp.asarray([[[0.0, 0.0, -3.0]]])
    d = jnp.asarray([[[0.0, 0.0, 1.0]]])
    near, far = near_far_from_sphere(o, d)
    assert float(near[0, 0, 0]) == pytest.approx(2.0)
    assert float(far[0, 0, 0]) == pytest.approx(4.0)


def test_light_direction_rotates_into_box_frame(gen, params):
    from object_intrinsics_tpu.utils.pose import invert_rot_t
    from scipy.spatial.transform import Rotation as R

    rot = R.from_euler("xyz", [0.3, -0.5, 1.0]).as_matrix().astype(np.float32)
    b2w = np.eye(4, dtype=np.float32)
    b2w[:3, :3] = rot
    prior = gen.sample_prior(params, jax.random.PRNGKey(0), 1, {"b2w": jnp.asarray(b2w[None])})
    d_world = np.asarray(lighting.direction(params["light"]))
    expected = rot.T @ d_world  # w2b rotation applied to the direction
    assert np.allclose(np.asarray(prior["light_dir_b"])[0], expected, atol=1e-5)


def test_forward_deterministic_with_data(gen, params):
    z = jnp.zeros((1, gen.z_dim))
    b2w = jnp.eye(4)[None]
    data = {"z": z, "b2w": b2w, "bg_color": jnp.ones((1, 3))}
    o1 = gen.forward(params, jax.random.PRNGKey(1), 1, jnp.asarray(0), data, train=False)
    o2 = gen.forward(params, jax.random.PRNGKey(2), 1, jnp.asarray(0), data, train=False)
    # all stochastic inputs provided + eval mode (no perturb): keys must not matter
    assert np.allclose(
        np.asarray(o1["box"]["render_out"]["image"]),
        np.asarray(o2["box"]["render_out"]["image"]),
    )


def test_forward_map_shapes_and_ranges(gen, params):
    out = gen.forward(params, jax.random.PRNGKey(0), 2, jnp.asarray(0), {},
                      train=True, return_raw=True)["box"]
    ro = out["render_out"]
    res = gen.resolution
    assert ro["image"].shape == (2, res, res, 3)
    assert ro["mask"].shape == (2, res, res, 1)
    assert ro["normal_map"].shape == (2, res, res, 3)
    m = np.asarray(ro["mask"])
    assert m.min() >= 1e-3 - 1e-6 and m.max() <= 1 - 1e-3 + 1e-6
    assert np.isfinite(np.asarray(ro["image"])).all()
    assert out["prior_info"]["c2b"].shape == (2, 4, 4)


def test_remat_gradients_match_stored(gen, params, monkeypatch):
    """training.remat / OI_REMAT recomputes the fine field evaluation in the
    backward pass; the loss gradient must equal the stored-activation path
    (same math graph; jax.checkpoint only changes WHEN things are computed)."""

    def loss(p, remat):
        monkeypatch.setattr(gen, "remat", remat)
        out = gen.forward(p, jax.random.PRNGKey(3), 1, jnp.asarray(5), {}, train=True)
        box = out["box"]
        return jnp.mean(box["render_out"]["image"]) + box["loss"]["eikonal"]

    g_stored = jax.grad(lambda p: loss(p, False))(params)
    g_remat = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_stored), jax.tree.leaves(g_remat)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.all(np.abs(a - b) <= 1e-6 + 1e-4 * np.abs(b).max())
