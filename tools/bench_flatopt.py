#!/usr/bin/env python
"""Microbench: the optimizer/EMA tail in isolation, flat vs per-leaf.

Builds the real flagship-config param trees (via __graft_entry__'s module
configs at the training resolution), then times a jitted program containing
ONLY the three optax updates + both EMA lerps + the norm stats — the part of
the train step the flat-buffer path (trainers/gan_pose_trainer.py,
``flat_optim``) restructures. Isolates the ~25 ms/step small-fusion tail
measured at the parity config (docs/DESIGN.md) from render noise.

    python tools/bench_flatopt.py [--iters 200]

Timing uses value fetches (the axon tunnel's block_until_ready trap,
docs/DESIGN.md). Run serialized on an idle chip.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

import object_intrinsics_tpu  # noqa: F401  (registry)
from __graft_entry__ import _disc_cfg, _generator_cfg
from object_intrinsics_tpu.trainers.optim import build_optimizer
from object_intrinsics_tpu.utils.config import build_from_config
from object_intrinsics_tpu.utils.tree import children_grad_norms, ema_update, global_norm

OPTS = {
    "generator": {"__target__": "torch.optim.Adam", "kwargs": dict(lr=2e-5, betas=[0, 0.9])},
    "discriminator": {"__target__": "torch.optim.RMSprop", "kwargs": dict(lr=1e-4)},
    "mask_discriminator": {"__target__": "torch.optim.RMSprop", "kwargs": dict(lr=1e-4)},
}


def build_params():
    key = jax.random.PRNGKey(0)
    cfgs = {
        "generator": _generator_cfg(resolution=128, n_samples=16, n_importance=4),
        "discriminator": _disc_cfg(128, 3, 7, view=True),
        "mask_discriminator": _disc_cfg(128, 1, 1),
    }
    return {
        k: build_from_config(v).init(jax.random.fold_in(key, i))
        for i, (k, v) in enumerate(cfgs.items())
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    params = build_params()
    tx = {k: build_optimizer(OPTS[k], None) for k in OPTS}
    # pseudo-grads: params scaled (nonzero everywhere, stable magnitudes)
    grads = jax.tree.map(lambda p: 1e-3 * p + 1e-6, params)
    n = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"total params: {n}", file=sys.stderr)

    def tail_tree(state):
        params, opt, ema99, ema9 = state
        ret = dict(children_grad_norms(grads["generator"]))
        new_p, new_o = {}, {}
        for k in OPTS:
            upd, new_o[k] = tx[k].update(grads[k], opt[k], params[k])
            new_p[k] = jax.tree.map(lambda p, u: p + u, params[k], upd)
            ret[f"param_norm/{k}"] = global_norm(new_p[k])
        e99 = ema_update(new_p["generator"], ema99, 0.99)
        e9 = ema_update(new_p["generator"], ema9, 0.9)
        return (new_p, new_o, e99, e9), ret

    unravel = {k: ravel_pytree(params[k])[1] for k in OPTS}
    fgrads = {k: ravel_pytree(grads[k])[0] for k in OPTS}
    child_ranges, start = {}, 0
    for child in sorted(params["generator"]):
        sz = sum(int(x.size) for x in jax.tree.leaves(params["generator"][child]))
        child_ranges[child] = (start, start + sz)
        start += sz

    def tail_flat(state):
        # state params/EMAs stay TREES like the real trainer state — the
        # per-iteration ravel/unravel round trips are part of the cost
        params, opt, ema99, ema9 = state
        fg = fgrads["generator"]
        ret = {f"grad_stats/{c}": jnp.sqrt(jnp.sum(fg[a:b] ** 2))
               for c, (a, b) in child_ranges.items()}
        new_p, new_o, new_fp = {}, {}, {}
        for k in OPTS:
            fp = ravel_pytree(params[k])[0]
            upd, new_o[k] = tx[k].update(fgrads[k], opt[k], fp)
            new_fp[k] = fp + upd
            new_p[k] = unravel[k](new_fp[k])
            ret[f"param_norm/{k}"] = jnp.linalg.norm(new_fp[k])
        g = new_fp["generator"]
        unr = unravel["generator"]
        e99 = unr(g + 0.99 * (ravel_pytree(ema99)[0] - g))
        e9 = unr(g + 0.9 * (ravel_pytree(ema9)[0] - g))
        return (new_p, new_o, e99, e9), ret

    def bench(name, fn, state0):
        fn = jax.jit(fn, donate_argnums=(0,))
        state, ret = fn(state0)
        float(next(iter(ret.values())))  # force
        t0 = time.time()
        for _ in range(args.iters):
            state, ret = fn(state)
        float(next(iter(ret.values())))
        dt = (time.time() - t0) / args.iters
        print(f"{name}: {dt * 1e3:.3f} ms/iter")
        return dt

    copy = lambda t: jax.tree.map(jnp.copy, t)
    state_tree = (copy(params), {k: tx[k].init(params[k]) for k in OPTS},
                  copy(params["generator"]), copy(params["generator"]))
    dt_tree = bench("per-leaf tail", tail_tree, state_tree)

    fparams = {k: ravel_pytree(params[k])[0] for k in OPTS}
    state_flat = (copy(params), {k: tx[k].init(fparams[k]) for k in OPTS},
                  copy(params["generator"]), copy(params["generator"]))
    dt_flat = bench("flat tail", tail_flat, state_flat)
    print(f"speedup: {dt_tree / dt_flat:.2f}x "
          f"({(dt_tree - dt_flat) * 1e3:.3f} ms/step saved)")


if __name__ == "__main__":
    main()
