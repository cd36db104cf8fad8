"""Mesh appearance export: per-vertex normals/albedo + PLY/OBJ writers.

Beyond-parity surface (the reference's extract_geometry is geometry-only,
neus/models/renderer.py:475-492): utils/mesh.vertex_attributes +
ops/marching_cubes.save_ply / save_obj color-and-normal modes, as driven by
`scripts/extract_mesh.py --vertex-attrs`.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_intrinsics_tpu.models import fields
from object_intrinsics_tpu.ops.marching_cubes import save_obj, save_ply
from object_intrinsics_tpu.utils.mesh import vertex_attributes


@pytest.fixture(scope="module")
def tiny_params():
    key = jax.random.PRNGKey(0)
    ks, kc = jax.random.split(key)
    return {
        "sdf_network": fields.init_shape_network(ks, D=2, W=16, style_dim=8),
        "color_network": fields.init_color_network(kc, W=16, style_dim=8),
    }


def test_vertex_attributes(tiny_params):
    w = fields.shape_style(
        tiny_params["sdf_network"], jax.random.normal(jax.random.PRNGKey(1), (1, 8))
    )
    verts = np.random.default_rng(0).uniform(-0.5, 0.5, size=(300, 3)).astype(np.float32)
    normals, colors = vertex_attributes(tiny_params, w, verts, chunk=128)
    assert normals.shape == verts.shape and colors.shape == verts.shape
    assert np.abs(np.linalg.norm(normals, axis=-1) - 1.0).max() < 1e-4
    assert colors.min() >= 0.0 and colors.max() <= 1.0
    # chunk padding must not change values: recompute with one big chunk
    n2, c2 = vertex_attributes(tiny_params, w, verts, chunk=512)
    np.testing.assert_allclose(normals, n2, atol=1e-5)
    np.testing.assert_allclose(colors, c2, atol=1e-5)
    # normals are the normalized analytic SDF gradient
    _, grads, _ = fields.shape_sdf_grad(
        tiny_params["sdf_network"], jnp.asarray(verts)[None], w
    )
    g = np.asarray(grads[0])
    g = g / np.linalg.norm(g, axis=-1, keepdims=True)
    np.testing.assert_allclose(normals, g, atol=1e-4)


def _tetra():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
    )
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], dtype=np.int64)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], dtype=np.float32)
    normals = np.tile(np.array([[0, 0, 1.0]], dtype=np.float32), (4, 1))
    return verts, faces, colors, normals


def test_save_ply_roundtrip(tmp_path):
    verts, faces, colors, normals = _tetra()
    p = str(tmp_path / "m.ply")
    save_ply(p, verts, faces, colors=colors, normals=normals)
    raw = open(p, "rb").read()
    header, _, body = raw.partition(b"end_header\n")
    text = header.decode("ascii")
    assert "element vertex 4" in text and "element face 4" in text
    assert "property uchar red" in text and "property float nx" in text
    vrec = np.frombuffer(
        body[: 4 * (6 * 4 + 3)],
        dtype=np.dtype([("xyz", "<f4", 3), ("n", "<f4", 3), ("c", "u1", 3)]),
    )
    np.testing.assert_allclose(vrec["xyz"], verts, atol=1e-6)
    np.testing.assert_allclose(vrec["n"], normals, atol=1e-6)
    np.testing.assert_array_equal(vrec["c"], np.round(colors * 255).astype(np.uint8))
    frec = np.frombuffer(
        body[4 * (6 * 4 + 3) :], dtype=np.dtype([("k", "u1"), ("idx", "<i4", 3)])
    )
    assert (frec["k"] == 3).all()
    np.testing.assert_array_equal(frec["idx"], faces)


def test_save_ply_positions_only(tmp_path):
    verts, faces, _, _ = _tetra()
    p = str(tmp_path / "m.ply")
    save_ply(p, verts, faces)
    raw = open(p, "rb").read()
    header, _, body = raw.partition(b"end_header\n")
    assert b"uchar red" not in header
    assert len(body) == 4 * 12 + 4 * 13  # 3 floats/vert + (uchar + 3 ints)/face


def test_save_obj_colors_normals(tmp_path):
    verts, faces, colors, normals = _tetra()
    p = str(tmp_path / "m.obj")
    save_obj(p, verts, faces, colors=colors, normals=normals)
    lines = open(p).read().splitlines()
    vlines = [l for l in lines if l.startswith("v ")]
    assert len(vlines) == 4 and len(vlines[0].split()) == 7  # x y z r g b
    assert sum(1 for l in lines if l.startswith("vn ")) == 4
    flines = [l for l in lines if l.startswith("f ")]
    assert len(flines) == 4 and "//" in flines[0]
