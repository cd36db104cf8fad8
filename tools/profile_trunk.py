#!/usr/bin/env python
"""Micro-benchmarks for the FiLM-SIREN trunk on the real chip.

Times (fetch-synced, tunnel-safe) the building blocks of one train step to
locate headroom: bare matmul chains at each precision, sin cost, trunk
forward, point-gradient, and the second-order params-gradient composition.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))

import object_intrinsics_tpu  # noqa: F401
from object_intrinsics_tpu.models import fields
from object_intrinsics_tpu.ops import film_siren as fs

N = 327_680  # 16384 rays x 20 samples (fine pass, bs=1)
W = 128
D = 8


def timeit(fn, *args, reps=20, warmup=3):
    f = jax.jit(fn)
    out = None
    for _ in range(warmup):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.time() - t0) / reps * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, N, W), dtype=jnp.float32)
    pts = jax.random.normal(key, (1, N, 3), dtype=jnp.float32) * 0.5
    w_style = jax.random.normal(key, (1, 64), dtype=jnp.float32)
    mats = [jax.random.normal(jax.random.fold_in(key, i), (W, W), dtype=jnp.float32) / 12
            for i in range(D)]

    sdf_p = fields.init_shape_network(key, D=8, W=128, style_dim=64)

    def chain(prec, with_sin):
        def f(x, mats):
            h = x
            for m in mats:
                h = jnp.matmul(h, m, precision=prec)
                if with_sin:
                    h = jnp.sin(h)
            return h
        return f

    for prec in ["default", "high", "highest"]:
        t_mm = timeit(chain(prec, False), x, mats, reps=args.reps)
        t_ms = timeit(chain(prec, True), x, mats, reps=args.reps)
        print(f"8-layer 327k x128x128 chain prec={prec:8s}: matmul-only {t_mm:7.2f} ms   +sin {t_ms:7.2f} ms")

    # pure sin on the same volume
    t_sin = timeit(lambda a: jnp.sin(a), jnp.broadcast_to(x, (D, 1, N, W)) + 0.0, reps=args.reps)
    print(f"8x standalone sin(327k x 128): {t_sin:7.2f} ms")

    # real trunk forward (fold_film + einsum + sin + heads)
    t_fwd = timeit(lambda p, q, s: fields.shape_forward(p, q, s)[0], sdf_p, pts, w_style, reps=args.reps)
    print(f"trunk fwd (sdf+feat):          {t_fwd:7.2f} ms")

    # fwd + point gradient (what each no-grad render pays)
    t_sg = timeit(lambda p, q, s: fields.shape_sdf_grad(p, q, s)[1], sdf_p, pts, w_style, reps=args.reps)
    print(f"trunk fwd+pts-grad:            {t_sg:7.2f} ms")

    # second-order: params-grad of a loss over (sdf, grad) — the G-step shape
    def loss_fn(p, q, s):
        sdf, grads, feat = fields.shape_sdf_grad(p, q, s)
        eik = jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
        return jnp.mean(sdf**2) + 10.0 * eik + 0.1 * jnp.mean(feat**2)

    t_2nd = timeit(jax.grad(loss_fn), sdf_p, pts, w_style, reps=args.reps)
    print(f"params-grad of (sdf,grad) loss:{t_2nd:7.2f} ms")

    # coarse-pass shape (262k pts, sdf only, no grad)
    pts_c = pts[:, : 16384 * 16]
    t_coarse = timeit(lambda p, q, s: fields.shape_sdf(p, q, s), sdf_p, pts_c, w_style, reps=args.reps)
    print(f"coarse sdf fwd (262k pts):     {t_coarse:7.2f} ms")


if __name__ == "__main__":
    main()
