"""Per-vertex appearance for extracted meshes.

Beyond-parity: the reference's ``extract_geometry`` is geometry-only
(src/third_party/neus/models/renderer.py:475-492); here extracted meshes can
carry the learned appearance — outward unit normals from the analytic SDF
gradient and albedo from the color network (the same fields the renderer
shades with, src/models/fields.py:80-146) — evaluated per vertex in fixed-
shape jitted chunks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import fields


@jax.jit
def _attrs(sdf_p, color_p, w, p):
    _, grads, feat = fields.shape_sdf_grad(sdf_p, p[None], w)
    n = grads / (jnp.linalg.norm(grads, axis=-1, keepdims=True) + 1e-12)
    rgb = fields.color_forward(color_p, feat, n, w)
    return n[0], rgb[0]


def vertex_attributes(
    params: dict, w: jnp.ndarray, verts: np.ndarray, chunk: int = 65536
):
    """(normals (V, 3) outward unit, colors (V, 3) in [0, 1]) at ``verts``
    (V, 3 world coords) for a generator param tree and style ``w`` (1, S).

    The SDF is positive outside, so the outward normal is the normalized
    gradient. Albedo is ``color_forward`` on the trunk features + normals —
    view-independent, so a single evaluation is the full appearance. The
    jitted kernel is module-level with params as arguments, so repeated
    calls (e.g. every serve.py /mesh request) reuse one executable."""
    sdf_p, color_p = params["sdf_network"], params["color_network"]

    def attrs(p):
        return _attrs(sdf_p, color_p, w, p)

    verts = np.asarray(verts, dtype=np.float32)
    normals = np.empty_like(verts)
    colors = np.empty_like(verts)
    for i in range(0, len(verts), chunk):
        block = verts[i : i + chunk]
        pad = chunk - len(block)  # fixed shape: one compile for all chunks
        n, c = attrs(jnp.asarray(np.pad(block, ((0, pad), (0, 0)))))
        normals[i : i + chunk] = np.asarray(n)[: len(block)]
        colors[i : i + chunk] = np.asarray(c)[: len(block)]
    return normals, colors
