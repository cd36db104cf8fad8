"""Marching cubes (table-driven) validation.

The table is constructed, not transcribed (ops/marching_cubes._build_mc_table),
so the tests prove the construction: every one of the 256 sign cases — and
random multi-cube fields mixing cases, including the ambiguous-face ones —
must triangulate to a CLOSED, CONSISTENTLY ORIENTED manifold (every directed
edge appears exactly once, paired with its reverse). Geometry is pinned
against analytic SDFs and the independent marching-tetrahedra path.

Reference analog: src/third_party/neus/models/renderer.py:31 (mcubes).
"""
import numpy as np
import pytest

from object_intrinsics_tpu.ops.marching_cubes import (
    _MC_TRI_TABLE,
    extract_fields_sparse,
    extract_geometry,
    marching_cubes,
    marching_tetrahedra,
)


def _check_closed_oriented(verts, faces, context=""):
    """Every directed edge occurs exactly once and its reverse exists."""
    assert faces.size, f"empty mesh ({context})"
    # no degenerate faces (repeated vertex index)
    assert (faces[:, 0] != faces[:, 1]).all(), context
    assert (faces[:, 1] != faces[:, 2]).all(), context
    assert (faces[:, 0] != faces[:, 2]).all(), context
    de = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    keys = de[:, 0].astype(np.int64) * len(verts) + de[:, 1]
    uk, counts = np.unique(keys, return_counts=True)
    assert (counts == 1).all(), f"duplicate directed edge ({context})"
    rev = de[:, 1].astype(np.int64) * len(verts) + de[:, 0]
    assert np.isin(rev, uk).all(), f"boundary edge — mesh not closed ({context})"


def _signed_volume(verts, faces):
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    return float(np.einsum("ij,ij->", v0, np.cross(v1, v2))) / 6.0


def test_table_shape():
    assert len(_MC_TRI_TABLE) == 256
    assert _MC_TRI_TABLE[0].size == 0 and _MC_TRI_TABLE[255].size == 0
    for c in range(1, 255):
        assert _MC_TRI_TABLE[c].shape[0] >= 1, c


def test_all_256_cases_closed_manifold():
    """Embed each case as the center cube of a cold-padded 4^3 field: the
    resulting isosurface must be a closed oriented 2-manifold enclosing
    positive volume (hot = inside)."""
    for case in range(1, 256):
        f = -np.ones((4, 4, 4), dtype=np.float64)
        for i in range(8):
            sign = 1.0 if case >> i & 1 else -1.0
            f[1 + ((i >> 2) & 1), 1 + ((i >> 1) & 1), 1 + (i & 1)] = sign
        verts, faces = marching_cubes(f, 0.0)
        _check_closed_oriented(verts, faces, f"case {case}")
        vol = _signed_volume(verts, faces)
        assert vol > 0, f"case {case}: inverted orientation (vol={vol})"


def test_random_fields_closed_manifold():
    """Random continuous fields with a cold border: closed + oriented. This
    exercises every cross-cube case adjacency statistically, including
    ambiguous shared faces."""
    rng = np.random.default_rng(0)
    for trial in range(30):
        f = rng.standard_normal((6, 6, 6))
        f[0], f[-1] = -1.0, -1.0
        f[:, 0], f[:, -1] = -1.0, -1.0
        f[:, :, 0], f[:, :, -1] = -1.0, -1.0
        if not (f > 0).any():
            continue
        verts, faces = marching_cubes(f, 0.0)
        _check_closed_oriented(verts, faces, f"trial {trial}")
        assert _signed_volume(verts, faces) > 0, f"trial {trial}"


def test_sphere_geometry_and_volume():
    """Radius accuracy + enclosed volume vs (4/3)pi r^3, and agreement with
    the independent marching-tetrahedra triangulation."""
    r, R = 0.6, 49
    ax = np.linspace(-1, 1, R)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    f = -(np.sqrt(X**2 + Y**2 + Z**2) - r)  # the -sdf convention: hot inside

    verts, faces = marching_cubes(f, 0.0)
    _check_closed_oriented(verts, faces, "sphere")
    world = verts / (R - 1) * 2.0 - 1.0
    radii = np.linalg.norm(world, axis=-1)
    assert np.abs(radii - r).max() < 0.01, np.abs(radii - r).max()

    vol = _signed_volume(world, faces)
    vol_true = 4.0 / 3.0 * np.pi * r**3
    assert abs(vol - vol_true) / vol_true < 0.01, vol

    # same isosurface and enclosed volume as the independent tetrahedra path
    tv, tf = marching_tetrahedra(f, 0.0)
    tworld = tv / (R - 1) * 2.0 - 1.0
    tradii = np.linalg.norm(tworld, axis=-1)
    assert np.abs(tradii - r).max() < 0.01
    tvol = _signed_volume(tworld, tf)
    assert abs(tvol - vol_true) / vol_true < 0.01, tvol
    # MC emits sparser meshes than the 6-tet decomposition
    assert len(faces) < len(tf)


def test_tets_closed_manifold():
    """The Kuhn 6-tet decomposition cuts every shared cube face along the
    translation-invariant diagonal, so marching tetrahedra is crack-free
    too, with the same outward winding convention as marching cubes. (The
    pre-r5 ad-hoc decomposition used opposite diagonals on the z=0/z=1
    faces — this test would catch that: cracks show as unpaired directed
    edges.)"""
    rng = np.random.default_rng(2)
    for trial in range(20):
        f = rng.standard_normal((6, 6, 6))
        f[0], f[-1] = -1.0, -1.0
        f[:, 0], f[:, -1] = -1.0, -1.0
        f[:, :, 0], f[:, :, -1] = -1.0, -1.0
        if not (f > 0).any():
            continue
        verts, faces = marching_tetrahedra(f, 0.0)
        _check_closed_oriented(verts, faces, f"tets trial {trial}")
        assert _signed_volume(verts, faces) > 0, f"tets trial {trial}"


def test_tets_float32_field_exact_dedup():
    """Regression: with float32 fields, the same cut point interpolated from
    opposite edge directions in two tets differs by ~1e-6, so the old
    position-rounding dedup left cracks (248 boundary edges on the release
    SDF). Dedup is now exact by global edge key — float32 fields at large
    grid coordinates must still be closed."""
    rng = np.random.default_rng(3)
    for trial in range(8):
        f = rng.standard_normal((14, 14, 14)).astype(np.float32)
        f[0], f[-1] = -1.0, -1.0
        f[:, 0], f[:, -1] = -1.0, -1.0
        f[:, :, 0], f[:, :, -1] = -1.0, -1.0
        verts, faces = marching_tetrahedra(f, 0.0)
        _check_closed_oriented(verts, faces, f"f32 trial {trial}")
        assert _signed_volume(verts, faces) > 0
        vc, fcs = marching_cubes(f, 0.0)
        _check_closed_oriented(vc, fcs, f"f32 mc trial {trial}")


def test_vertices_on_grid_edges():
    """MC vertices vary in exactly one coordinate from an integer lattice
    point (they live on grid edges) — the mcubes-format property the
    tetrahedra path does not have."""
    rng = np.random.default_rng(1)
    f = rng.standard_normal((5, 5, 5))
    f[0], f[-1] = -1.0, -1.0
    f[:, 0], f[:, -1] = -1.0, -1.0
    f[:, :, 0], f[:, :, -1] = -1.0, -1.0
    verts, faces = marching_cubes(f, 0.0)
    frac = np.abs(verts - np.round(verts))
    n_fractional = (frac > 1e-6).sum(axis=-1)
    assert (n_fractional <= 1).all()


def test_extract_geometry_methods(tmp_path):
    def query(pts):
        return -(np.linalg.norm(pts, axis=-1) - 0.5)

    vc, fc = extract_geometry([-1] * 3, [1] * 3, 32, 0.0, query, method="cubes")
    vt, ft = extract_geometry([-1] * 3, [1] * 3, 32, 0.0, query, method="tets")
    for verts in (vc, vt):
        assert np.abs(np.linalg.norm(verts, axis=-1) - 0.5).max() < 0.03
    with pytest.raises(ValueError):
        extract_geometry([-1] * 3, [1] * 3, 8, 0.0, query, method="nope")


def test_sparse_extraction_identical_mesh():
    """The hierarchical block-skipping field pass must produce the exact
    same mesh as the dense pass (every surface-crossing cube reads real
    values thanks to the Lipschitz margin + neighbor halo), while skipping
    most evaluations for a centered object."""
    r = 0.45
    calls = {"dense": 0, "sparse": 0}
    mode = ["dense"]

    def query(pts):
        calls[mode[0]] += len(pts)
        # an off-center lump breaks symmetry so the test isn't trivial
        d1 = np.linalg.norm(pts, axis=-1) - r
        d2 = np.linalg.norm(pts - np.array([0.3, 0.2, -0.1]), axis=-1) - 0.25
        return -np.minimum(d1, d2)

    vd, fd = extract_geometry([-1] * 3, [1] * 3, 129, 0.0, query, sparse=False)
    mode[0] = "sparse"
    vs, fs = extract_geometry([-1] * 3, [1] * 3, 129, 0.0, query, sparse=True)
    np.testing.assert_array_equal(vd, vs)
    np.testing.assert_array_equal(fd, fs)
    # the active shell is ~2 blocks thick, so savings grow with resolution;
    # at 129 the bound is modest, at 512 it is ~16x (see the docstring)
    assert calls["sparse"] < 0.6 * calls["dense"], calls
    _check_closed_oriented(vs, fs, "sparse")


def test_sparse_extraction_nonzero_threshold():
    """Sparsity must track the THRESHOLD level set, not the raw zero set."""

    def query(pts):
        return -(np.linalg.norm(pts, axis=-1) - 0.5) + 2.0  # zero set far away

    vd, fd = extract_geometry([-1] * 3, [1] * 3, 65, 2.0, query, sparse=False)
    vs, fs = extract_geometry([-1] * 3, [1] * 3, 65, 2.0, query, sparse=True)
    np.testing.assert_array_equal(vd, vs)
    np.testing.assert_array_equal(fd, fs)
    assert np.abs(np.linalg.norm(vs, axis=-1) - 0.5).max() < 0.02


def test_sparse_fields_far_surface():
    """A field with no zero crossing in the box: no active blocks, constant
    sign everywhere, empty mesh."""

    def query(pts):
        return np.full(len(pts), 7.0, dtype=np.float32)

    u = extract_fields_sparse([-1] * 3, [1] * 3, 65, query)
    assert (u > 0).all()
    v, f = marching_cubes(u, 0.0)
    assert v.size == 0 and f.size == 0


def test_sharded_point_query_matches_single_device():
    """sharded_point_query over the virtual 8-device mesh must agree with a
    single-device evaluation (padding + slicing must be invisible), and the
    extracted mesh must be identical."""
    import jax
    import jax.numpy as jnp

    from object_intrinsics_tpu.parallel.mesh import make_mesh
    from object_intrinsics_tpu.parallel.ray_sharding import sharded_point_query

    dev_mesh = make_mesh(-1)
    assert dev_mesh.size >= 2, "suite runs on the virtual 8-device CPU mesh"
    a = jnp.asarray([0.3, -0.2, 0.15])

    def fn(pts):
        return jnp.linalg.norm(pts - a, axis=-1) - 0.4

    q = sharded_point_query(fn, dev_mesh, chunk=64)
    rng = np.random.default_rng(0)
    for n in (7, 64 * dev_mesh.size, 64 * dev_mesh.size + 3, 2000):
        pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        got = q(pts)
        want = np.asarray(jax.jit(fn)(jnp.asarray(pts)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    vd, fd = extract_geometry([-1] * 3, [1] * 3, 33, 0.0, lambda p: -np.asarray(jax.jit(fn)(jnp.asarray(p))))
    vs, fs = extract_geometry([-1] * 3, [1] * 3, 33, 0.0, lambda p: -q(p))
    np.testing.assert_array_equal(vd, vs)
    np.testing.assert_array_equal(fd, fs)


def test_empty_and_full():
    v, f = marching_cubes(-np.ones((5, 5, 5)), 0.0)
    assert v.size == 0 and f.size == 0
    v, f = marching_cubes(np.ones((5, 5, 5)), 0.0)
    assert v.size == 0 and f.size == 0
