"""Mesh extraction from the learned SDF (extract_geometry parity).

The reference uses the external ``mcubes`` package behind an import guard
(src/third_party/neus/models/renderer.py:6-10, 15-41, 475-492) and neither
CLI calls it. Here extraction is self-contained: the SDF evaluates on a
dense grid in jit-sized chunks (device), and the isosurface triangulates
in vectorized numpy with either

- **marching cubes** (default, the reference's ``mcubes`` analog):
  table-driven, vertices on grid edges only, globally deduplicated. The
  256-case table is *constructed* at import rather than transcribed:
  connected components of the hot corners -> cut edges -> boundary cycles
  traced by pairing cut edges per cube face (ambiguous faces resolve by
  the fixed "separate the hot diagonal" rule, which depends only on the
  face's own signs, so adjacent cubes always agree) -> oriented triangle
  fans. Watertight by construction; `tests/test_marching_cubes.py` proves
  closed-manifold output for every one of the 256 cases.
- **marching tetrahedra** (``method='tets'``): table-free 6-tet
  decomposition, denser meshes, kept as the independent cross-check.

OBJ export included.
"""
from __future__ import annotations

import logging
from typing import Callable, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# Six tetrahedra decomposing a unit cube (corner indices into the 8 cube
# corners, which are ordered by bit pattern (x, y, z) -> x*4 + y*2 + z).
# This is the Kuhn decomposition — the six 0 -> 7 paths that set one bit at
# a time, one per axis order. Its defining property here: every cube FACE is
# split along the diagonal through that face's lowest and highest corner,
# which is invariant under translation, so adjacent cubes cut their shared
# face identically and the mesh is crack-free. (An earlier ad-hoc 6-tet
# split used opposite diagonals on the z=0/z=1 faces and could leave
# hairline cracks across z-interfaces.) Corner order within each tet is
# normalized below to positive orientation so one winding table serves all.
def _kuhn_tets() -> np.ndarray:
    import itertools

    tets = []
    for order in itertools.permutations((4, 2, 1)):  # x, y, z bits
        c, path = 0, [0]
        for bit in order:
            c |= bit
            path.append(c)
        tets.append(path)
    tets = np.array(tets, dtype=np.int64)
    # normalize parity: positive det((p1-p0, p2-p0, p3-p0))
    pos = np.array([[(i >> 2) & 1, (i >> 1) & 1, i & 1] for i in range(8)], float)
    for t in tets:
        m = pos[t[1:]] - pos[t[0]]
        if np.linalg.det(m) < 0:
            t[2], t[3] = t[3], t[2]
    return tets


_CUBE_TETS = _kuhn_tets()

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


def _orient_tet_table():
    """Fix each case's winding on a canonical positively-oriented tet so
    triangle normals point toward the negative corners (the f < threshold
    side — the same outward convention as the marching-cubes table). All
    _CUBE_TETS are parity-normalized, and orientation-preserving affine maps
    preserve winding, so one table serves every tet."""
    P = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64)
    table = []
    for case in range(16):
        vals = np.array([-1.0 if case >> i & 1 else 1.0 for i in range(4)])
        tris_out = []
        for tri in _tet_triangles(case):
            pts = []
            for e in tri:
                a, b = _TET_EDGES[e]
                t = vals[a] / (vals[a] - vals[b])
                pts.append(P[a] + t * (P[b] - P[a]))
            n = np.cross(pts[1] - pts[0], pts[2] - pts[0])
            inside_c = P[vals < 0].mean(axis=0)
            to_inside = inside_c - np.mean(pts, axis=0)
            tris_out.append(tri if float(n @ to_inside) > 0 else tri[::-1])
        table.append(tris_out)
    return table


_TET_TRI_TABLE = _orient_tet_table()


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
    """Isosurface of ``field`` (X, Y, Z) at ``threshold`` -> (verts (V, 3) in
    voxel coords, faces (F, 3)). Vectorized over all tets; vertices are
    deduplicated EXACTLY by their global tet-edge (lattice endpoint pair)
    and interpolated once per edge in a canonical endpoint order — a
    position-rounding dedup is not crack-safe: the same cut point computed
    from opposite edge directions in two tets differs by ~1e-6 with float32
    fields, which a 6-decimal round keeps distinct (observed as 248
    boundary edges on the release-weights SDF). Faces wind so normals point
    toward ``field < threshold``, matching marching_cubes."""
    f = np.asarray(field, dtype=np.float64) - threshold
    X, Y, Z = f.shape
    nxc, nyc, nzc = X - 1, Y - 1, Z - 1

    corner_offsets = np.array(
        [[(i >> 2) & 1, (i >> 1) & 1, i & 1] for i in range(8)], dtype=np.int64
    )
    # linear lattice index of each cube corner: (C, 8)
    idx = np.arange(nxc * nyc * nzc, dtype=np.int64)
    ox, oy, oz = idx // (nyc * nzc), idx // nzc % nyc, idx % nzc
    corner_lin = (
        (ox[:, None] + corner_offsets[None, :, 0]) * Y
        + (oy[:, None] + corner_offsets[None, :, 1])
    ) * Z + (oz[:, None] + corner_offsets[None, :, 2])
    f_flat = f.ravel()
    corner_vals = f_flat[corner_lin]  # (C, 8)

    ga_list, gb_list = [], []
    for tet in _CUBE_TETS:
        tv = corner_vals[:, tet]  # (C, 4)
        case = ((tv < 0) * np.array([1, 2, 4, 8])).sum(axis=-1)  # (C,)
        for case_id in range(1, 15):
            tris = _TET_TRI_TABLE[case_id]
            if not tris:
                continue
            sel = np.nonzero(case == case_id)[0]
            if sel.size == 0:
                continue
            # per triangle vertex: the tet edge's two cube-corner ids
            A = np.array([[tet[_TET_EDGES[e][0]] for e in tri] for tri in tris])
            B = np.array([[tet[_TET_EDGES[e][1]] for e in tri] for tri in tris])
            cl = corner_lin[sel]  # (S, 8)
            ga_list.append(cl[:, A].reshape(-1, 3))  # (S*T, 3)
            gb_list.append(cl[:, B].reshape(-1, 3))

    if not ga_list:
        return np.zeros((0, 3), dtype=np.float32), np.zeros((0, 3), dtype=np.int64)
    ga = np.concatenate(ga_list)  # (N, 3) global endpoint a per face vertex
    gb = np.concatenate(gb_list)
    lo = np.minimum(ga, gb)
    hi = np.maximum(ga, gb)
    nv = X * Y * Z
    key = lo * nv + hi
    uniq, inverse = np.unique(key.ravel(), return_inverse=True)
    faces = inverse.reshape(-1, 3)

    ulo, uhi = uniq // nv, uniq % nv
    va, vb = f_flat[ulo], f_flat[uhi]
    denom = va - vb
    denom = np.where(np.abs(denom) < 1e-30, 1e-30, denom)
    t = np.clip(va / denom, 0.0, 1.0)

    def _coords(lin):
        return np.stack([lin // (Y * Z), lin // Z % Y, lin % Z], axis=-1).astype(
            np.float64
        )

    pa, pb = _coords(ulo), _coords(uhi)
    verts = pa + t[:, None] * (pb - pa)
    return verts.astype(np.float32), faces


def extract_fields_sparse(
    bound_min,
    bound_max,
    resolution: int,
    query_fn: Callable[[np.ndarray], np.ndarray],
    block: int = 8,
    margin_factor: float = 1.25,
    chunk: int = 64**3,
) -> np.ndarray:
    """Hierarchical analog of :func:`extract_fields` for SDF-like fields:
    evaluate a coarse block-corner lattice first and skip blocks provably
    far from the zero set, evaluating fine points only near the surface.

    A zero crossing inside a block implies some corner value is at most
    L * (block diagonal) for an L-Lipschitz field, so a block is *active*
    when the min |value| over its 8 coarse corners is below
    ``margin_factor * diagonal`` (the learned SDF is eikonal-regularized to
    |grad| = 1 in world units; the default 1.25 is the slack on top, and the
    halo below adds a further full block of safety). Activity dilates to
    the 26 neighbors so every surface-crossing cube — including ones
    straddling a block boundary — reads only truly evaluated values: the
    mesh is IDENTICAL to the dense one (pinned by tests). Skipped blocks
    fill with the sign-correct corner mean, which never produces a
    crossing. The active shell's thickness shrinks as block*step, so the
    saving GROWS with resolution: ~16x fewer evaluations at 512 for a
    centered object (134M dense).
    """
    bound_min = np.asarray(bound_min, dtype=np.float32)
    bound_max = np.asarray(bound_max, dtype=np.float32)
    R = resolution
    nb = (R - 1 + block - 1) // block  # blocks per axis
    axes = [np.linspace(bound_min[i], bound_max[i], R, dtype=np.float32) for i in range(3)]
    step = (bound_max - bound_min) / (R - 1)

    # coarse lattice: block-corner sample points (nb+1 per axis, clamped to R-1)
    cidx = np.minimum(np.arange(nb + 1) * block, R - 1)
    cax = [axes[i][cidx] for i in range(3)]
    cx, cy, cz = np.meshgrid(*cax, indexing="ij")
    cpts = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)
    cvals = np.empty(len(cpts), dtype=np.float32)
    for i in range(0, len(cpts), chunk):
        cvals[i : i + chunk] = np.asarray(query_fn(cpts[i : i + chunk]))
    cvals = cvals.reshape(nb + 1, nb + 1, nb + 1)

    # active blocks: min corner |value| below the Lipschitz margin
    diag = float(np.linalg.norm(step * block))
    corner_abs = np.stack(
        [
            np.abs(cvals[dx : dx + nb, dy : dy + nb, dz : dz + nb])
            for dx in (0, 1)
            for dy in (0, 1)
            for dz in (0, 1)
        ]
    )
    active = corner_abs.min(axis=0) < margin_factor * diag
    # dilate to the 26 neighbors (halo) so boundary-straddling cubes are real
    dil = np.zeros_like(active)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                sx = slice(max(dx, 0), nb + min(dx, 0))
                tx = slice(max(-dx, 0), nb + min(-dx, 0))
                sy = slice(max(dy, 0), nb + min(dy, 0))
                ty = slice(max(-dy, 0), nb + min(-dy, 0))
                sz = slice(max(dz, 0), nb + min(dz, 0))
                tz = slice(max(-dz, 0), nb + min(-dz, 0))
                dil[tx, ty, tz] |= active[sx, sy, sz]
    active = dil

    out = np.empty((R, R, R), dtype=np.float32)
    # fill skipped blocks with their sign-correct corner mean (no crossings)
    bx, by, bz = np.nonzero(~active)
    for x, y, z in zip(bx, by, bz):
        x0, y0, z0 = x * block, y * block, z * block
        out[x0 : min(x0 + block + 1, R), y0 : min(y0 + block + 1, R), z0 : min(z0 + block + 1, R)] = cvals[
            x : x + 2, y : y + 2, z : z + 2
        ].mean()

    # evaluate fine points of active blocks (gather, one chunked device sweep)
    ax_idx, ay_idx, az_idx = np.nonzero(active)
    if len(ax_idx):
        pt_idx = []
        for x, y, z in zip(ax_idx, ay_idx, az_idx):
            xs = np.arange(x * block, min((x + 1) * block + 1, R))
            ys = np.arange(y * block, min((y + 1) * block + 1, R))
            zs = np.arange(z * block, min((z + 1) * block + 1, R))
            gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
            pt_idx.append(np.stack([gx, gy, gz], axis=-1).reshape(-1, 3))
        pt_idx = np.unique(np.concatenate(pt_idx), axis=0)
        pts = np.stack(
            [axes[0][pt_idx[:, 0]], axes[1][pt_idx[:, 1]], axes[2][pt_idx[:, 2]]],
            axis=-1,
        )
        vals = np.empty(len(pts), dtype=np.float32)
        for i in range(0, len(pts), chunk):
            vals[i : i + chunk] = np.asarray(query_fn(pts[i : i + chunk]))
        out[pt_idx[:, 0], pt_idx[:, 1], pt_idx[:, 2]] = vals
        n_eval = len(cpts) + len(pts)
    else:
        n_eval = len(cpts)
    logger.info(
        "sparse field eval: %d/%d points (%.1f%%), %d/%d blocks active",
        n_eval,
        R**3,
        100.0 * n_eval / R**3,
        int(active.sum()),
        active.size,
    )
    return out


# ---------------------------------------------------------------------------
# Marching cubes (table-driven; reference renderer.py:31 `mcubes.marching_cubes`
# analog). Corner i sits at offset ((i>>2)&1, (i>>1)&1, i&1) — the same
# x*4 + y*2 + z convention as the tetrahedra path above. "Hot" = value > 0
# after threshold subtraction; triangles are wound so normals point from hot
# to cold (outward for the -sdf convention used by extract_geometry).
# ---------------------------------------------------------------------------

_MC_CORNER_OFFSETS = np.array(
    [[(i >> 2) & 1, (i >> 1) & 1, i & 1] for i in range(8)], dtype=np.int64
)
# The 12 cube edges: corner pairs differing in exactly one bit, a < b (so a
# holds the 0 side of the differing axis).
_MC_EDGES = [
    (a, b)
    for a in range(8)
    for b in range(a + 1, 8)
    if bin(a ^ b).count("1") == 1
]
# Axis of each edge: which coordinate differs (0=x, 1=y, 2=z).
_MC_EDGE_AXIS = np.array(
    [2 - (a ^ b).bit_length() + 1 for a, b in _MC_EDGES], dtype=np.int64
)


def _mc_faces():
    """The 6 cube faces as corner indices in cyclic order."""
    faces = []
    for bit in range(3):  # bit position within the corner index
        for val in (0, 1):
            others = [b for b in range(3) if b != bit]
            cyc = []
            for u, v in [(0, 0), (1, 0), (1, 1), (0, 1)]:
                cyc.append((val << bit) | (u << others[0]) | (v << others[1]))
            faces.append(cyc)
    return faces


def _build_mc_table():
    """Triangle table for all 256 sign cases; entry = (T, 3) array of edge ids.

    Construction (instead of transcribing the classic Lorensen table): for
    each case, take connected components of the hot corners, collect each
    component's cut edges, pair cut edges that are consecutive on a cube
    face (an ambiguous face — two hot corners on a diagonal — always pairs
    each hot corner with its own two adjacent cut edges, a rule that is a
    function of the face's signs alone, hence identical in the neighboring
    cube: watertightness across cubes), trace the pairing into closed
    cycles, orient each cycle hot->cold via its Newell area vector, and fan-
    triangulate. Unlike the classic table this is hole-free for every
    adjacent-case combination (the classic one is not; mcubes inherits its
    rare cracks).
    """
    edge_id = {e: k for k, e in enumerate(_MC_EDGES)}
    adj = {i: [i ^ (1 << s) for s in range(3)] for i in range(8)}
    faces = _mc_faces()
    corner_pos = _MC_CORNER_OFFSETS.astype(np.float64)
    # the two faces containing each cube edge (to reject face-flat triangles)
    edge_faces = {e: set() for e in _MC_EDGES}
    for fi, fc in enumerate(faces):
        for k in range(4):
            a, b = fc[k], fc[(k + 1) % 4]
            edge_faces[(min(a, b), max(a, b))].add(fi)

    table = []
    for case in range(256):
        hotset = {i for i in range(8) if case >> i & 1}
        # connected components of the hot corners
        comps, seen = [], set()
        for h in sorted(hotset):
            if h in seen:
                continue
            comp, stack = set(), [h]
            while stack:
                x = stack.pop()
                if x in comp:
                    continue
                comp.add(x)
                stack.extend(n for n in adj[x] if n in hotset and n not in comp)
            seen |= comp
            comps.append(comp)

        tris = []
        for comp in comps:
            cut = [e for e in _MC_EDGES if (e[0] in comp) != (e[1] in comp)]
            cutset = set(cut)
            nbrs = {e: [] for e in cut}
            for fc in faces:
                fedges = []
                for k in range(4):
                    a, b = fc[k], fc[(k + 1) % 4]
                    e = (min(a, b), max(a, b))
                    if e in cutset:
                        fedges.append(e)
                if len(fedges) == 2:
                    a, b = fedges
                    nbrs[a].append(b)
                    nbrs[b].append(a)
                elif len(fedges) == 4:
                    # ambiguous face: this component holds both diagonal hot
                    # corners; separate them (each keeps its adjacent pair).
                    for hc in (c for c in fc if c in comp):
                        ea, eb = [e for e in fedges if hc in e]
                        nbrs[ea].append(eb)
                        nbrs[eb].append(ea)
            # every cut edge lies on exactly 2 faces -> exactly 2 partners
            assert all(len(v) == 2 for v in nbrs.values()), (case, comp)

            unvisited = set(cut)
            while unvisited:
                start = min(unvisited)
                cycle, prev, cur = [start], None, start
                unvisited.discard(start)
                while True:
                    nxt = next(n for n in nbrs[cur] if n != prev)
                    if nxt == start:
                        break
                    cycle.append(nxt)
                    unvisited.discard(nxt)
                    prev, cur = cur, nxt
                # orient: Newell area vector vs hot->cold direction
                mids = np.array(
                    [(corner_pos[a] + corner_pos[b]) / 2 for a, b in cycle]
                )
                area = np.zeros(3)
                for i in range(len(mids)):
                    area += np.cross(mids[i], mids[(i + 1) % len(mids)])
                hot_c = np.mean([corner_pos[a if a in comp else b] for a, b in cycle], axis=0)
                cold_c = np.mean([corner_pos[b if a in comp else a] for a, b in cycle], axis=0)
                if float(area @ (cold_c - hot_c)) < 0:
                    cycle.reverse()
                # fan root: a rotation where no fan triangle has all three
                # vertices on one cube face — a face-flat triangle's edges
                # coincide with the neighbor cube's and break manifoldness
                # (observed as duplicate directed edges on random fields).
                n = len(cycle)
                for shift in range(n):
                    cyc = cycle[shift:] + cycle[:shift]
                    fan = [(cyc[0], cyc[i], cyc[i + 1]) for i in range(1, n - 1)]
                    if not any(
                        edge_faces[t[0]] & edge_faces[t[1]] & edge_faces[t[2]]
                        for t in fan
                    ):
                        break
                else:
                    raise AssertionError(f"no flat-free fan root: case {case}")
                ids = [edge_id[e] for e in cyc]
                tris.extend((ids[0], ids[i], ids[i + 1]) for i in range(1, len(ids) - 1))
        table.append(np.array(tris, dtype=np.int64).reshape(-1, 3))
    return table


_MC_TRI_TABLE = _build_mc_table()


def marching_cubes(
    field: np.ndarray, threshold: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Isosurface of ``field`` (X, Y, Z) at ``threshold`` -> (verts (V, 3) in
    voxel coords, faces (F, 3)). Vertices lie on grid edges and are shared
    exactly (keyed by grid edge, no rounding); faces wind so normals point
    toward ``field < threshold``."""
    f = np.asarray(field, dtype=np.float64) - threshold
    X, Y, Z = f.shape
    hot = f > 0

    # case id per cube, bit i = corner i hot
    case = np.zeros((X - 1, Y - 1, Z - 1), dtype=np.int64)
    for i, (ox, oy, oz) in enumerate(_MC_CORNER_OFFSETS):
        case |= hot[ox : ox + X - 1, oy : oy + Y - 1, oz : oz + Z - 1].astype(np.int64) << i
    case_flat = case.ravel()

    tri_cube, tri_edge = [], []
    for c in np.unique(case_flat):
        tris = _MC_TRI_TABLE[c]
        if tris.size == 0:
            continue
        sel = np.nonzero(case_flat == c)[0]  # (S,)
        tri_cube.append(np.repeat(sel, len(tris)))  # (S*T,)
        tri_edge.append(np.tile(tris, (len(sel), 1)))  # (S*T, 3)
    if not tri_cube:
        return np.zeros((0, 3), dtype=np.float32), np.zeros((0, 3), dtype=np.int64)
    tri_cube = np.concatenate(tri_cube)  # (N,)
    tri_edge = np.concatenate(tri_edge)  # (N, 3)

    # global edge key per (cube, local edge): low-corner grid coords + axis
    cy, cz = Y - 1, Z - 1
    ox = tri_cube[:, None] // (cy * cz)
    oy = tri_cube[:, None] // cz % cy
    oz = tri_cube[:, None] % cz
    lo = np.array([_MC_CORNER_OFFSETS[a] for a, _ in _MC_EDGES], dtype=np.int64)  # (12, 3)
    gx = ox + lo[tri_edge, 0]
    gy = oy + lo[tri_edge, 1]
    gz = oz + lo[tri_edge, 2]
    axis = _MC_EDGE_AXIS[tri_edge]
    key = ((gx * Y + gy) * Z + gz) * 3 + axis  # (N, 3)

    uniq, inverse = np.unique(key.ravel(), return_inverse=True)
    faces_out = inverse.reshape(-1, 3)

    # interpolate one vertex per unique cut grid edge
    uax = uniq % 3
    ulin = uniq // 3
    ux, uy, uz = ulin // (Y * Z), ulin // Z % Y, ulin % Z
    va = f[ux, uy, uz]
    step = np.eye(3, dtype=np.int64)[uax]
    vb = f[ux + step[:, 0], uy + step[:, 1], uz + step[:, 2]]
    denom = va - vb
    denom = np.where(np.abs(denom) < 1e-30, 1e-30, denom)
    t = np.clip(va / denom, 0.0, 1.0)
    verts = np.stack([ux, uy, uz], axis=-1).astype(np.float64) + t[:, None] * step
    return verts.astype(np.float32), faces_out


def extract_geometry(
    bound_min,
    bound_max,
    resolution: int,
    threshold: float,
    query_fn: Callable[[np.ndarray], np.ndarray],
    method: str = "cubes",
    sparse: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh of {query_fn == threshold} in world coords (renderer.py:33-41).

    ``method='cubes'`` (default) is the reference's mcubes analog (vertices
    on grid edges, outward normals for the -sdf convention);
    ``method='tets'`` is the denser marching-tetrahedra cross-check.

    ``sparse`` switches the field evaluation to the hierarchical
    block-skipping pass (identical mesh, >90% fewer SDF evaluations for a
    centered object); default: automatic at resolution >= 256, where the
    dense pass costs 16.7M+ evaluations.

    NOTE: the reference meshes ``-sdf`` and thresholds at 0 (renderer.py:475-492
    query_func returns -sdf); pass query_fn accordingly."""
    if sparse is None:
        sparse = resolution >= 256
    if sparse:
        shifted = lambda p: query_fn(p) - threshold  # noqa: E731 — sparsity needs the zero set
        u = extract_fields_sparse(bound_min, bound_max, resolution, shifted) + threshold
    else:
        u = extract_fields(bound_min, bound_max, resolution, query_fn)
    if method == "cubes":
        verts, faces = marching_cubes(u, threshold)
    elif method == "tets":
        verts, faces = marching_tetrahedra(u, threshold)
    else:
        raise ValueError(f"unknown method {method!r} (want 'cubes' or 'tets')")
    bound_min = np.asarray(bound_min, dtype=np.float32)
    bound_max = np.asarray(bound_max, dtype=np.float32)
    verts = verts / (resolution - 1.0) * (bound_max - bound_min)[None] + bound_min[None]
    return verts, faces


def save_obj(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
) -> None:
    """OBJ export; ``colors`` (V, 3) in [0, 1] use the widespread
    'v x y z r g b' extension, ``normals`` (V, 3) emit vn + v//vn faces."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        for i, v in enumerate(verts):
            if colors is not None:
                c = colors[i]
                fh.write(
                    f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f} {c[0]:.4f} {c[1]:.4f} {c[2]:.4f}\n"
                )
            else:
                fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if normals is not None:
            for n in normals:
                fh.write(f"vn {n[0]:.4f} {n[1]:.4f} {n[2]:.4f}\n")
            for f in faces + 1:
                fh.write(f"f {f[0]}//{f[0]} {f[1]}//{f[1]} {f[2]}//{f[2]}\n")
        else:
            for f in faces + 1:
                fh.write(f"f {f[0]} {f[1]} {f[2]}\n")
    logger.info("wrote %s (%d verts, %d faces)", path, len(verts), len(faces))


def ply_bytes(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
) -> bytes:
    """Binary little-endian PLY with optional per-vertex normals and uchar
    colors — the standard interchange format for colored meshes."""
    props = ["property float x", "property float y", "property float z"]
    cols = [verts.astype("<f4")]
    if normals is not None:
        props += ["property float nx", "property float ny", "property float nz"]
        cols.append(np.asarray(normals, dtype="<f4"))
    if colors is not None:
        props += ["property uchar red", "property uchar green", "property uchar blue"]
        cols.append(
            np.clip(np.round(np.asarray(colors) * 255.0), 0, 255).astype(np.uint8)
        )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n" + "\n".join(props) + "\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    vert_fields = [("xyz", "<f4", 3)]
    if normals is not None:
        vert_fields.append(("n", "<f4", 3))
    if colors is not None:
        vert_fields.append(("c", "u1", 3))
    vrec = np.zeros(len(verts), dtype=np.dtype(vert_fields))
    for (name, _, _), col in zip(vert_fields, cols):
        vrec[name] = col
    frec = np.zeros(len(faces), dtype=np.dtype([("k", "u1"), ("idx", "<i4", 3)]))
    frec["k"] = 3
    frec["idx"] = faces.astype("<i4") if len(faces) else frec["idx"]
    return header.encode("ascii") + vrec.tobytes() + frec.tobytes()


def save_ply(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
) -> None:
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(ply_bytes(verts, faces, colors=colors, normals=normals))
    logger.info("wrote %s (%d verts, %d faces)", path, len(verts), len(faces))
