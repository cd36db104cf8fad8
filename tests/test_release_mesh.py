"""Release-weights mesh gate: geometry extracted from the committed
flagship weights must be a non-trivial closed oriented manifold with sane
appearance attributes — a code change that breaks extraction, the SDF
query path, or the appearance bake trips this. Skips when the release is
absent (same convention as test_release_weights.py).
"""
import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
RELEASES = [
    os.path.join(REPO, "release", name)
    for name in ("example", "synth_hemi", "synth_sphere")
]
_PRESENT = [
    p for p in RELEASES if os.path.exists(os.path.join(p, "checkpoints", "model.npz"))
]

pytestmark = pytest.mark.skipif(
    not _PRESENT, reason="no release weights present"
)


@pytest.fixture(scope="module", params=_PRESENT, ids=[os.path.basename(p) for p in _PRESENT])
def mesh(request):
    RELEASE = request.param
    import jax
    import jax.numpy as jnp

    import object_intrinsics_tpu  # noqa: F401 - registry
    from object_intrinsics_tpu.models import fields
    from object_intrinsics_tpu.ops.marching_cubes import extract_geometry
    from object_intrinsics_tpu.utils.test import inference_setup

    cfg, model, info = inference_setup(RELEASE, ema=None)
    assert model is not None
    params = model["params"]
    z = jax.random.normal(jax.random.PRNGKey(0), (1, model["generator"].z_dim))
    w = fields.shape_style(params["sdf_network"], z)
    sdf_fn = jax.jit(
        lambda pts: fields.shape_sdf(params["sdf_network"], pts[None], w)[0, :, 0]
    )

    def query(pts):
        return -np.asarray(sdf_fn(jnp.asarray(pts, dtype=jnp.float32)))

    verts, faces = extract_geometry([-1] * 3, [1] * 3, 49, 0.0, query)
    return params, w, verts, faces


def test_release_mesh_closed_manifold(mesh):
    _, _, verts, faces = mesh
    assert len(verts) > 300 and len(faces) > 600  # a real object, not noise
    de = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    k = de[:, 0].astype(np.int64) * len(verts) + de[:, 1]
    uk, cnt = np.unique(k, return_counts=True)
    assert (cnt == 1).all(), "duplicate directed edge"
    assert np.isin(de[:, 1].astype(np.int64) * len(verts) + de[:, 0], uk).all(), (
        "boundary edge — mesh not closed"
    )
    # outward orientation encloses positive volume, all inside the unit box
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    vol = float(np.einsum("ij,ij->", v0, np.cross(v1, v2))) / 6.0
    assert vol > 1e-3, vol
    assert np.abs(verts).max() <= 1.0 + 1e-5


def test_release_mesh_appearance(mesh):
    from object_intrinsics_tpu.utils.mesh import vertex_attributes

    params, w, verts, _ = mesh
    normals, colors = vertex_attributes(params, w, verts)
    assert np.abs(np.linalg.norm(normals, axis=-1) - 1.0).max() < 1e-3
    assert colors.min() >= 0.0 and colors.max() <= 1.0
    assert colors.std() > 0.01  # a learned albedo, not a constant
