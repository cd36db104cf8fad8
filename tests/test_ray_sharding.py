"""Ray-sharded eval rendering must match the single-device render."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _generator_cfg
from object_intrinsics_tpu.parallel.mesh import make_mesh
from object_intrinsics_tpu.parallel.ray_sharding import sharded_eval_render
from object_intrinsics_tpu.utils.config import build_from_config


def test_sharded_render_matches_single_device():
    gen = build_from_config(_generator_cfg(resolution=16, n_samples=4, n_importance=2))
    params = gen.init(jax.random.PRNGKey(0))
    data = {
        "b2w": jnp.eye(4)[None],
        "z": jnp.zeros((1, gen.z_dim)),
        "bg_color": jnp.full((1, 3), 0.5),
    }
    mesh = make_mesh(8)
    sharded = sharded_eval_render(gen, params, data, mesh, bs=1, it=0)

    full = gen.forward(
        params, jax.random.PRNGKey(0), 1, jnp.asarray(0), data,
        train=False, return_raw=True,
    )["box"]["render_out"]

    # sharded reductions regroup float ops (matmul tile widths change);
    # images drift ~1e-4, raw-gradient normals ~1e-3
    tol = {"image": 1e-3, "mask": 1e-3, "normal_map": 5e-3, "shading_map": 2e-3}
    for k, atol in tol.items():
        a = np.asarray(sharded[k])
        b = np.asarray(full[k])
        assert a.shape == b.shape, (k, a.shape, b.shape)
        assert np.allclose(a, b, atol=atol), (k, np.abs(a - b).max())
