#!/usr/bin/env python
"""Regenerate the sphere-initialization checkpoint from scratch.

Distills the FiLM-SIREN shape network to the analytic sphere SDF
``sdf(x) = |x| - 0.5`` with an L1 objective over random latents — the same
target the reference's shipped ``sphere_init.pt`` encodes (its stored
'loss/l1' ~0.016; cf. the StyleSDF mlp_init_pass sphere target,
src/third_party/stylesdf/volume_renderer.py:322-349). Makes the framework
self-contained without the reference artifact.

Usage: python tools/make_sphere_init.py [out.npz] [--steps N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from object_intrinsics_tpu.models import fields
from object_intrinsics_tpu.utils.sphere_init import save_sphere_init_npz, shape_params_to_flat

RADIUS = 0.5
BOUND = 1.3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="checkpoints/sphere_init.npz")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--n-pts", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    key = jax.random.PRNGKey(args.seed)
    params = fields.init_shape_network(jax.random.fold_in(key, 0))
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, k):
        kz, kp = jax.random.split(k)
        z = jax.random.normal(kz, (args.bs, 64))
        pts = jax.random.uniform(kp, (args.bs, args.n_pts, 3), minval=-BOUND, maxval=BOUND)
        target = jnp.linalg.norm(pts, axis=-1) - RADIUS

        def loss_fn(p):
            w = fields.shape_style(p, z)
            sdf = fields.shape_sdf(p, pts, w)[..., 0]
            return jnp.mean(jnp.abs(sdf - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for i in range(args.steps):
        params, opt, loss = step(params, opt, jax.random.fold_in(key, i + 1))
        if i % 1000 == 0 or i == args.steps - 1:
            print(f"step {i:6d}  loss/l1 {float(loss):.4f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_sphere_init_npz(args.out, shape_params_to_flat(params))
    print(f"wrote {args.out} (final l1 {float(loss):.4f})")


if __name__ == "__main__":
    main()
