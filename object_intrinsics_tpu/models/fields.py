"""Object-intrinsics field networks: style-conditioned SDF, albedo, variance.

Rebuilds src/models/fields.py (ShapeNetwork/ColorNetwork) and NeuS's
SingleVarianceNetwork (src/third_party/neus/models/fields.py:262-268) as
functional JAX param trees.

The reference computes analytic SDF normals with 40 lines of torch.autograd
bookkeeping (src/models/fields.py:104-146); here it is one ``jax.grad`` of the
summed SDF — exact per-point gradients because each point's SDF depends only
on itself, and still differentiable w.r.t. params for the second-order terms
the GAN objective needs (normals feed the color network and the losses).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import film_siren as fs

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# Shape network: 3-layer mapping MLP + 8-layer FiLM-SIREN + linear SDF head
# --------------------------------------------------------------------------

def init_shape_network(
    key,
    D: int = 8,
    W: int = 128,
    style_dim: int = 64,
    input_ch: int = 3,
    input_ch_views: int = 3,  # accepted for config parity; unused by the trunk
    checkpoint_path: Optional[str] = None,
) -> Params:
    del input_ch_views
    k_style, k_trunk, k_head = jax.random.split(key, 3)
    params = {
        "style": fs.init_mapping_mlp(k_style, style_dim, n_layers=3),
        "pts_linears": fs.init_siren_trunk(k_trunk, D, input_ch, W, style_dim),
        "sigma_linear": fs.init_linear(k_head, W, 1, freq_init=True),
    }
    if checkpoint_path:
        from ..utils.sphere_init import load_sphere_init

        params = load_sphere_init(checkpoint_path, params)
    return params


def shape_style(params: Params, z: jnp.ndarray) -> jnp.ndarray:
    """Latent z (bs, style_dim) -> style w (bs, style_dim)."""
    return fs.apply_mapping_mlp(params["style"], z)


def shape_forward(params: Params, pts: jnp.ndarray, w: jnp.ndarray):
    """pts: (bs, n, 3), w: (bs, style_dim) -> (sdf (bs, n, 1), feat (bs, n, W)).

    bs=1 runs the whole chain in 2D (one squeeze at entry, one unsqueeze at
    exit) so every activation between layers is a clean (n, W) GEMM operand
    — see apply_film_siren's layout note."""
    if pts.shape[0] == 1:
        h = fs.apply_siren_trunk(params["pts_linears"], pts[0], w)
        sdf = fs.apply_linear(params["sigma_linear"], h)
        return sdf[None], h[None]
    h = fs.apply_siren_trunk(params["pts_linears"], pts, w)
    sdf = fs.apply_linear(params["sigma_linear"], h)
    return sdf, h


def shape_sdf(params: Params, pts: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return shape_forward(params, pts, w)[0]


def shape_sdf_grad(params: Params, pts: jnp.ndarray, w: jnp.ndarray):
    """SDF value, analytic spatial gradient, and features in one pass.

    grad_pts(sum(sdf)) gives exact per-point gradients (the SDF of point i is
    independent of point j), replacing fields.py:104-146.
    """
    def sdf_sum(p):
        sdf, feat = shape_forward(params, p, w)
        return sdf.sum(), (sdf, feat)

    grads, (sdf, feat) = jax.grad(sdf_sum, has_aux=True)(pts)
    return sdf, grads, feat


def shape_sdf_grad_hessian(params: Params, pts: jnp.ndarray, w: jnp.ndarray,
                           laplacian: bool = False):
    """SDF, gradient, features, and the per-point spatial Hessian
    (bs, n, 3, 3) — or its diagonal with ``laplacian=True``.

    The reference implements this with a per-column autograd loop
    (src/models/fields.py:104-146, ``second_order``/``laplacian``), feeding a
    divergence regularizer that is dead under the shipped configs
    (neus/renderer.py:314 is ``if False``). Here it is forward-over-reverse:
    three jvps of the exact point-gradient, differentiable w.r.t. params."""

    def grad_with_aux(p):
        sdf, grads, feat = shape_sdf_grad(params, p, w)
        return grads, (sdf, feat)

    # linearize evaluates the network once; the three tangent pushes reuse
    # the stored linearization instead of re-running the primal per axis
    grads, f_jvp, (sdf, feat) = jax.linearize(grad_with_aux, pts, has_aux=True)
    cols = [f_jvp(jnp.zeros_like(pts).at[..., i].set(1.0)) for i in range(3)]
    hess = jnp.stack(cols, axis=-1)  # (bs, n, 3, 3); cols[i] = dgrad/dp_i
    if laplacian:
        return sdf, grads, feat, jnp.diagonal(hess, axis1=-2, axis2=-1)
    return sdf, grads, feat, hess



# --------------------------------------------------------------------------
# Color network: one FiLM layer on [features, normals] + linear RGB head
# --------------------------------------------------------------------------

def init_color_network(
    key,
    D: int = 8,  # accepted for config parity; the color head is a single layer
    W: int = 128,
    style_dim: int = 64,
    input_ch: int = 3,
    input_ch_views: int = 3,
) -> Params:
    del D, input_ch
    k_views, k_rgb = jax.random.split(key)
    return {
        "views_linears": fs.init_film_siren(k_views, input_ch_views + W, W, style_dim),
        "rgb_linear": fs.init_linear(k_rgb, W, 3, freq_init=True),
    }


def color_forward(params: Params, feat: jnp.ndarray, normals: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Albedo from (features, raw normals); view-independent despite the name
    (src/models/fields.py:80-101). feat: (bs, n, W), normals: (bs, n, 3)."""
    h = jnp.concatenate([feat, normals], axis=-1)
    if h.shape[0] == 1:  # 2D fast path, see shape_forward
        h2 = fs.apply_film_siren(params["views_linears"], h[0], w)
        rgb = fs.apply_linear(params["rgb_linear"], h2)[None]
        return jax.nn.sigmoid(rgb)
    h = fs.apply_film_siren(params["views_linears"], h, w)
    rgb = fs.apply_linear(params["rgb_linear"], h)
    return jax.nn.sigmoid(rgb)



# --------------------------------------------------------------------------
# Background NeRF (n_outside > 0): unconditional density/color field over
# inverted-sphere coordinates — the NeRF++ outer model
# --------------------------------------------------------------------------

def positional_encoding(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """NeRF positional encoding (neus/models/embedder.py:12-51): include the
    input, log-sampled frequencies 2^0..2^(num_freqs-1), [sin, cos] per
    frequency — layout [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]."""
    parts = [x]
    for i in range(num_freqs):
        f = float(2.0**i)
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)


def _torch_linear_init(key, d_in: int, d_out: int) -> Params:
    """nn.Linear default init: kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    for the weight, U(+-1/sqrt(fan_in)) for the bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound),
    }


def init_nerf(
    key,
    D: int = 8,
    W: int = 256,
    d_in: int = 4,
    d_in_view: int = 3,
    multires: int = 10,
    multires_view: int = 4,
    skips=(4,),
) -> Params:
    """Background NeRF MLP (neus/models/fields.py:181-232, use_viewdirs=True):
    D relu layers with a skip concat after layer ``skips``, then alpha head,
    feature->view branch, rgb head. d_in=4 for the inverted-sphere (x/r, 1/r)
    input the n_outside path feeds (renderer.py:112-113)."""
    input_ch = d_in * (1 + 2 * multires)
    input_ch_view = d_in_view * (1 + 2 * multires_view)
    keys = jax.random.split(key, D + 4)
    pts_linears = [_torch_linear_init(keys[0], input_ch, W)]
    for i in range(D - 1):
        d = W + input_ch if i in skips else W
        pts_linears.append(_torch_linear_init(keys[i + 1], d, W))
    return {
        "pts_linears": pts_linears,
        "feature_linear": _torch_linear_init(keys[D], W, W),
        "alpha_linear": _torch_linear_init(keys[D + 1], W, 1),
        "views_linear": _torch_linear_init(keys[D + 2], input_ch_view + W, W // 2),
        "rgb_linear": _torch_linear_init(keys[D + 3], W // 2, 3),
    }


def nerf_forward(
    params: Params,
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    multires: int = 10,
    multires_view: int = 4,
    skips=(4,),
):
    """pts: (bs, n, d_in) inverted-sphere coords, dirs: (bs, n, 3) ->
    (density (bs, n, 1), color (bs, n, 3)).

    Matches NeRF.forward with use_viewdirs=True (neus/models/fields.py:235-258):
    both heads return RAW values — the caller applies softplus to the density
    and uses the rgb untransformed, exactly like render_core_outside
    (renderer.py:120-124, which applies no sigmoid)."""
    emb = positional_encoding(pts, multires)
    emb_view = positional_encoding(dirs, multires_view)
    h = emb
    for i, p in enumerate(params["pts_linears"]):
        h = jax.nn.relu(fs.apply_linear(p, h))
        if i in skips:
            h = jnp.concatenate([emb, h], axis=-1)
    density = fs.apply_linear(params["alpha_linear"], h)
    feat = fs.apply_linear(params["feature_linear"], h)
    h = jnp.concatenate([feat, emb_view], axis=-1)
    h = jax.nn.relu(fs.apply_linear(params["views_linear"], h))
    color = fs.apply_linear(params["rgb_linear"], h)
    return density, color


# --------------------------------------------------------------------------
# Deviation network: single global NeuS variance
# --------------------------------------------------------------------------

def init_deviation_network(init_val: float = 0.3) -> Params:
    return {"variance": jnp.asarray(init_val, dtype=jnp.float32)}


def deviation_inv_s(params: Params) -> jnp.ndarray:
    """inv_s = exp(10 * variance), clipped (neus/models/fields.py:262-268 and
    renderer.py:266)."""
    return jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6)

