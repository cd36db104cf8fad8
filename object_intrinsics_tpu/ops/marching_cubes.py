"""Mesh extraction from the learned SDF (extract_geometry parity).

The reference uses the external ``mcubes`` package behind an import guard
(src/third_party/neus/models/renderer.py:6-10, 15-41, 475-492) and neither
CLI calls it. Here extraction is self-contained: the SDF evaluates on a
dense grid in jit-sized chunks (device), and the isosurface triangulates
with *marching tetrahedra* in vectorized numpy — table-free, watertight,
slightly denser meshes than marching cubes but identical surfaces for
rendering/inspection purposes. OBJ export included.
"""
from __future__ import annotations

import logging
from typing import Callable, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# Six tetrahedra decomposing a unit cube (corner indices into the 8 cube
# corners, which are ordered by bit pattern (x, y, z) -> x*4 + y*2 + z).
_CUBE_TETS = np.array(
    [
        [0, 5, 1, 3],
        [0, 5, 3, 7],
        [0, 5, 7, 4],
        [0, 7, 3, 2],
        [0, 7, 2, 6],
        [0, 7, 6, 4],
    ],
    dtype=np.int64,
)

# For each of the 16 sign patterns of a tet (bit i = corner i inside), the
# edges (pairs of local corners) forming 0, 1 or 2 triangles.
_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _tet_triangles(case: int):
    inside = [i for i in range(4) if case & (1 << i)]
    outside = [i for i in range(4) if not case & (1 << i)]
    if len(inside) in (0, 4):
        return []
    edge_id = {tuple(sorted(e)): k for k, e in enumerate(_TET_EDGES)}

    def eid(a, b):
        return edge_id[tuple(sorted((a, b)))]

    if len(inside) == 1:
        a = inside[0]
        b, c, d = outside
        return [(eid(a, b), eid(a, c), eid(a, d))]
    if len(inside) == 3:
        a = outside[0]
        b, c, d = inside
        return [(eid(a, b), eid(a, d), eid(a, c))]
    # two inside, two outside -> quad = two triangles
    a, b = inside
    c, d = outside
    return [
        (eid(a, c), eid(b, c), eid(b, d)),
        (eid(a, c), eid(b, d), eid(a, d)),
    ]


_TET_TRI_TABLE = [_tet_triangles(c) for c in range(16)]


def extract_fields(
    bound_min,
    bound_max,
    resolution: int,
    query_fn: Callable[[np.ndarray], np.ndarray],
    chunk: int = 64**3,
) -> np.ndarray:
    """Evaluate a scalar field on a dense grid (renderer.py:15-30 analog);
    ``query_fn`` maps (n, 3) points to (n,) values (device-side, jitted by
    the caller)."""
    bound_min = np.asarray(bound_min, dtype=np.float32)
    bound_max = np.asarray(bound_max, dtype=np.float32)
    axes = [np.linspace(bound_min[i], bound_max[i], resolution, dtype=np.float32) for i in range(3)]
    xs, ys, zs = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
    out = np.empty(pts.shape[0], dtype=np.float32)
    for i in range(0, pts.shape[0], chunk):
        out[i : i + chunk] = np.asarray(query_fn(pts[i : i + chunk]))
    return out.reshape(resolution, resolution, resolution)


def marching_tetrahedra(
    field: np.ndarray, threshold: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Isosurface of ``field`` (R, R, R) at ``threshold`` -> (verts (V, 3) in
    voxel coords, faces (F, 3)). Vectorized over all tets; vertices are
    deduplicated per grid edge."""
    R = field.shape[0]
    f = field - threshold

    # grid of cube-origin indices
    idx = np.arange(R - 1)
    cx, cy, cz = np.meshgrid(idx, idx, idx, indexing="ij")
    origin = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)  # (C, 3)

    corner_offsets = np.array(
        [[(i >> 2) & 1, (i >> 1) & 1, i & 1] for i in range(8)], dtype=np.int64
    )
    # corner coords per cube: (C, 8, 3)
    corners = origin[:, None, :] + corner_offsets[None]
    corner_vals = f[corners[..., 0], corners[..., 1], corners[..., 2]]  # (C, 8)

    verts_list, faces_list = [], []
    n_verts = 0
    # edge key -> vertex index, deduplicated via unique keys per batch
    for tet in _CUBE_TETS:
        tv = corner_vals[:, tet]  # (C, 4)
        tc = corners[:, tet]  # (C, 4, 3)
        case = ((tv < 0) * np.array([1, 2, 4, 8])).sum(axis=-1)  # (C,)
        for case_id in range(1, 15):
            tris = _TET_TRI_TABLE[case_id]
            if not tris:
                continue
            sel = np.nonzero(case == case_id)[0]
            if sel.size == 0:
                continue
            v_sel = tv[sel]  # (S, 4)
            c_sel = tc[sel]  # (S, 4, 3)
            # interpolated vertex per referenced edge
            edge_vert = {}
            for e_local, (a, b) in enumerate(_TET_EDGES):
                va, vb = v_sel[:, a], v_sel[:, b]
                denom = va - vb
                denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
                t = np.clip(va / denom, 0.0, 1.0)
                edge_vert[e_local] = c_sel[:, a].astype(np.float64) + t[:, None] * (
                    c_sel[:, b] - c_sel[:, a]
                )
            for tri in tris:
                pts = np.stack([edge_vert[e] for e in tri], axis=1)  # (S, 3, 3)
                verts_list.append(pts.reshape(-1, 3))
                faces_list.append(
                    np.arange(n_verts, n_verts + 3 * len(sel)).reshape(-1, 3)
                )
                n_verts += 3 * len(sel)

    if not verts_list:
        return np.zeros((0, 3), dtype=np.float32), np.zeros((0, 3), dtype=np.int64)
    verts = np.concatenate(verts_list, axis=0)
    faces = np.concatenate(faces_list, axis=0)
    # deduplicate vertices
    verts_q = np.round(verts, 6)
    uniq, inverse = np.unique(verts_q, axis=0, return_inverse=True)
    faces = inverse[faces]
    return uniq.astype(np.float32), faces


def extract_geometry(
    bound_min,
    bound_max,
    resolution: int,
    threshold: float,
    query_fn: Callable[[np.ndarray], np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh of {query_fn == threshold} in world coords (renderer.py:33-41).

    NOTE: the reference meshes ``-sdf`` and thresholds at 0 (renderer.py:475-492
    query_func returns -sdf); pass query_fn accordingly."""
    u = extract_fields(bound_min, bound_max, resolution, query_fn)
    verts, faces = marching_tetrahedra(u, threshold)
    bound_min = np.asarray(bound_min, dtype=np.float32)
    bound_max = np.asarray(bound_max, dtype=np.float32)
    verts = verts / (resolution - 1.0) * (bound_max - bound_min)[None] + bound_min[None]
    return verts, faces


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in faces + 1:
            fh.write(f"f {f[0]} {f[1]} {f[2]}\n")
    logger.info("wrote %s (%d verts, %d faces)", path, len(verts), len(faces))
