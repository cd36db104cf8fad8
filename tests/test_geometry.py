import numpy as np
import pytest

from object_intrinsics_tpu.ops.marching_cubes import (
    extract_geometry,
    marching_tetrahedra,
    save_obj,
)


def test_sphere_mesh():
    """Meshing -(|x| - r) at threshold 0 (the reference's -sdf convention)
    recovers a sphere of radius r."""
    r = 0.5

    def query(pts):
        return -(np.linalg.norm(pts, axis=-1) - r)

    verts, faces = extract_geometry([-1, -1, -1], [1, 1, 1], 48, 0.0, query)
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=-1)
    assert np.abs(radii - r).max() < 0.06, np.abs(radii - r).max()
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_empty_field():
    field = np.ones((8, 8, 8), dtype=np.float32)
    verts, faces = marching_tetrahedra(field, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_obj_export(tmp_path):
    def query(pts):
        return -(np.linalg.norm(pts, axis=-1) - 0.4)

    verts, faces = extract_geometry([-1, -1, -1], [1, 1, 1], 24, 0.0, query)
    p = tmp_path / "mesh.obj"
    save_obj(str(p), verts, faces)
    text = p.read_text()
    assert text.count("v ") >= len(verts)
    assert text.count("f ") == len(faces)
