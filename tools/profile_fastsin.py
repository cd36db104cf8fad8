#!/usr/bin/env python
"""Prototype: polynomial sin (Cody-Waite reduction + odd minimax poly) vs jnp.sin."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))

N = 327_680
W = 128
D = 8

# --- minimax-ish coefficients for sin on [-pi, pi]: fit sin(r)/r as poly in r^2
r = np.polynomial.chebyshev.chebpts1(2048) * np.pi
y = np.sin(r) / r
V = np.vander(r**2, 6, increasing=True)  # degree 10 in r -> 11 odd
coef, *_ = np.linalg.lstsq(V, y, rcond=None)
print("poly coef:", coef)
rr = np.linspace(-np.pi, np.pi, 400001)
approx = rr * sum(c * rr ** (2 * i) for i, c in enumerate(coef))
print("max abs err on [-pi,pi]:", np.abs(approx - np.sin(rr)).max())

C = [float(c) for c in coef]
INV_2PI = float(1.0 / (2 * np.pi))
C1 = float(np.float32(6.28125))
C2 = float(2 * np.pi - 6.28125)


def fast_sin(u):
    k = jnp.round(u * INV_2PI)
    r = (u - k * C1) - k * C2
    r2 = r * r
    p = C[5]
    for c in (C[4], C[3], C[2], C[1], C[0]):
        p = p * r2 + c
    return r * p


def timeit(fn, *args, reps=30, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.time() - t0) / reps * 1000.0


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (1, N, W), dtype=jnp.float32)
mats = [jax.random.normal(jax.random.fold_in(key, i), (W, W), dtype=jnp.float32) / 12
        for i in range(D)]
big = jnp.broadcast_to(x, (D, 1, N, W)) + 0.0

# accuracy on realistic SIREN phase range (gamma~30 => |u| up to ~200)
u = jax.random.uniform(key, (1_000_000,), minval=-200.0, maxval=200.0)
err = jnp.max(jnp.abs(fast_sin(u) - jnp.sin(u)))
print("fast_sin max abs err |u|<200:", float(err))
# derivative accuracy (the backward path uses AD of the poly)
du = jax.vmap(jax.grad(lambda t: fast_sin(t)))(u[:100_000])
err_d = jnp.max(jnp.abs(du - jnp.cos(u[:100_000])))
print("fast_sin AD-derivative vs cos:", float(err_d))

t_ref = timeit(lambda a: jnp.sin(a), big)
t_fast = timeit(lambda a: fast_sin(a), big)
print(f"8x 327k x 128 volume: jnp.sin {t_ref:.2f} ms   fast_sin {t_fast:.2f} ms")


def chain(sin_fn):
    def f(x, mats):
        h = x
        for m in mats:
            h = sin_fn(jnp.matmul(h, m, precision="high"))
        return h
    return f


t_c_ref = timeit(chain(jnp.sin), x, mats)
t_c_fast = timeit(chain(fast_sin), x, mats)
print(f"8-layer chain (high):  jnp.sin {t_c_ref:.2f} ms   fast_sin {t_c_fast:.2f} ms")

# fwd+bwd through the chain (the pts-grad shape)
def g(sin_fn):
    c = chain(sin_fn)
    return lambda x, mats: jax.grad(lambda q: jnp.sum(c(q, mats) ** 2))(x)

t_g_ref = timeit(g(jnp.sin), x, mats)
t_g_fast = timeit(g(fast_sin), x, mats)
print(f"chain fwd+bwd (high):  jnp.sin {t_g_ref:.2f} ms   fast_sin {t_g_fast:.2f} ms")
