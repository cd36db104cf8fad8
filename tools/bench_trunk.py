#!/usr/bin/env python
"""Microbenchmark + accuracy sweep for the FiLM-SIREN trunk matmul variants.

The trunk is the train step's hottest compute (8 layers x 327k points at the
flagship shapes). The default precision is 'high' (bf16_3x, 3 MXU passes per
matmul) because SIREN phase errors amplify ~3x per layer through the 8-layer
chain (sin is gamma~30-Lipschitz in the preactivation; a bf16 rounding error
in layer 0 grows ~3^8 by the head). This tool measures, at real shapes on the
real backend:

  time:      fwd  (the no-grad render path: coarse pass, D-step renders, eval)
             grad (the generator path: sdf + analytic normals via jax.grad)
  accuracy:  max |sdf - sdf_ref| and max normal angular error vs a 'highest'
             (bf16_6x ~ exact fp32) reference, through the FULL trunk.

Variants:
  high      current default: jnp.einsum(..., precision='high')  [3 passes]
  default   single bf16 pass (known-corrupt baseline)            [1 pass]
  split_w   x->bf16 once; W split hi/lo: x@w_hi + x@w_lo         [2 passes]
  split_x   W->bf16 once; x split hi/lo: x_hi@w + x_lo@w         [2 passes]
  graded<k> 'high' early layers, 'default' for the last k

Measured verdict (v5e, bs=2, n=327680, r3 — recorded in docs/DESIGN.md):
the trunk is VPU-bound on the sin polynomial, not matmul-bound ('default'
fwd is only ~10% faster than 'high'), so every cheaper-matmul variant buys
nothing and corrupts normals. 'high' stays the production setting.

Usage: python tools/bench_trunk.py [--n 327680] [--bs 1] [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# the axon sitecustomize force-selects the TPU regardless of JAX_PLATFORMS;
# an explicit --cpu (or OI_BACKEND=cpu) must override AFTER importing jax so
# this tool can never steal the chip from a live training run.
if os.environ.get("OI_BACKEND") == "cpu" or "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))

from object_intrinsics_tpu.ops import film_siren as fs
from object_intrinsics_tpu.models import fields


def split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def make_trunk_fn(variant: str):
    """Returns trunk(params, pts, w) -> (sdf, feat) for a matmul variant."""

    def film_matmul(x, w_g, b_g, mode="high"):
        # x: (bs, n, i), w_g: (bs, i, o), b_g: (bs, o)
        if mode in ("high", "default", "highest"):
            h = jnp.einsum("bni,bio->bno", x, w_g, precision=mode)
        elif mode == "split_w":
            xb = x.astype(jnp.bfloat16)
            w_hi, w_lo = split_bf16(w_g)
            h = jnp.einsum("bni,bio->bno", xb, w_hi,
                           preferred_element_type=jnp.float32)
            h = h + jnp.einsum("bni,bio->bno", xb, w_lo,
                               preferred_element_type=jnp.float32)
        elif mode == "split_x":
            wb = w_g.astype(jnp.bfloat16)
            x_hi, x_lo = split_bf16(x)
            h = jnp.einsum("bni,bio->bno", x_hi, wb,
                           preferred_element_type=jnp.float32)
            h = h + jnp.einsum("bni,bio->bno", x_lo, wb,
                               preferred_element_type=jnp.float32)
        else:
            raise ValueError(mode)
        return h + b_g[:, None, :]

    def trunk(params, pts, w):
        x = pts
        n_layers = len(params["pts_linears"])
        for i, p in enumerate(params["pts_linears"]):
            mode = variant
            if variant.startswith("graded"):
                # phase errors amplify ~3x per downstream layer, so only the
                # FIRST layers need the full bf16_3x; the tail can run single
                # pass. graded<k>: last k layers at 'default'.
                k = int(variant[len("graded"):] or 2)
                mode = "default" if i >= n_layers - k else "high"
            w_g, b_g = fs.fold_film(p, w)
            x = fs.fast_sin(film_matmul(x, w_g, b_g, mode=mode))
        sdf = fs.apply_linear(params["sigma_linear"], x)
        return sdf, x

    return trunk


def timed(fn, *args, iters=20):
    out = fn(*args)
    sync = jax.tree.leaves(out)[0]
    float(np.asarray(sync).ravel()[0])  # true completion (axon: fetch a value)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=327680)
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled pre-parse at import)")
    args = ap.parse_args()

    print(f"backend: {jax.devices()[0].platform}, n={args.n}, bs={args.bs}")
    key = jax.random.PRNGKey(0)
    params = fields.init_shape_network(key, D=8, W=128, style_dim=64)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (args.bs, args.n, 3),
                             minval=-1.0, maxval=1.0)
    z = jax.random.normal(jax.random.PRNGKey(2), (args.bs, 64))
    w = fields.shape_style(params, z)
    w = jax.block_until_ready(w)

    # reference: 'highest' through the full trunk
    ref_fn = jax.jit(make_trunk_fn("highest"))
    sdf_ref, _ = ref_fn(params, pts, w)

    def grad_fn_of(trunk):
        def sdf_grad(params, pts, w):
            def s(p):
                sdf, feat = trunk(params, p, w)
                return sdf.sum(), (sdf, feat)
            g, (sdf, feat) = jax.grad(s, has_aux=True)(pts)
            return sdf, g, feat
        return sdf_grad

    g_ref = jax.jit(grad_fn_of(make_trunk_fn("highest")))
    _, n_ref, _ = g_ref(params, pts, w)
    n_ref_u = n_ref / (jnp.linalg.norm(n_ref, axis=-1, keepdims=True) + 1e-12)

    for variant in ["high", "default", "split_w", "split_x", "graded1", "graded2", "graded3"]:
        trunk = make_trunk_fn(variant)
        f_fwd = jax.jit(trunk)
        f_grad = jax.jit(grad_fn_of(trunk))
        sdf, _ = f_fwd(params, pts, w)
        _, nrm, _ = f_grad(params, pts, w)
        nrm_u = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12)
        err_sdf = float(jnp.max(jnp.abs(sdf - sdf_ref)))
        cos = jnp.clip(jnp.sum(nrm_u * n_ref_u, -1), -1, 1)
        err_ang = float(jnp.max(jnp.arccos(cos))) * 180 / np.pi
        t_fwd = timed(f_fwd, params, pts, w, iters=args.iters)
        t_grad = timed(f_grad, params, pts, w, iters=args.iters)
        print(f"{variant:9s} fwd {t_fwd:7.2f} ms  grad {t_grad:7.2f} ms  "
              f"|sdf err| {err_sdf:.2e}  normal err {err_ang:.3f} deg")

if __name__ == "__main__":
    main()
