#!/usr/bin/env python
"""CPU-vs-TPU twin for the R1 (grad-of-grad) path through the ADA pipe.

Quantifies the residual axon-backend discrepancy documented in
docs/DESIGN.md: first-order D gradients match CPU exactly, but deep
grad-of-grad compositions show elementwise mismatches. This script measures

  1. one-step R1 param-gradient discrepancy (per-leaf max relative error,
     norm ratios) at the real configuration (128 px, ADA scale+xint, full DC
     stack, BCE real+fake + R1*10);
  2. an N-step discriminator-only twin training run (identical data, keys,
     RMSprop) on both backends — the measured *training impact* bound: loss
     trajectory gap and final parameter divergence.

Run on a machine with the TPU visible (CPU backend coexists in-process):
    python tools/twin_r1.py [--steps 300] [--res 128]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# honor an explicit CPU-only request (the sitecustomize force-selects axon)
_want = os.environ.get("JAX_PLATFORMS", "")
if "cpu" in _want and "axon" not in _want:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))

import object_intrinsics_tpu  # noqa: F401
from object_intrinsics_tpu.loss.gan import GANLoss
from object_intrinsics_tpu.models.discriminator import ADADiscriminatorView
from object_intrinsics_tpu.trainers.optim import rmsprop


def smooth_batch(bs, res, seed):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:res, 0:res] / res
    imgs = []
    for _ in range(bs):
        cx, cy, s = rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.7), rng.uniform(0.02, 0.08)
        base = np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / s)
        imgs.append(base[..., None] * rng.uniform(0.2, 1.0, 3))
    return np.stack(imgs).astype(np.float32)


def tree_relerr(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    mx, norm_a, norm_b = 0.0, 0.0, 0.0
    for x, y in zip(la, lb):
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        denom = np.maximum(np.abs(y), 1e-30)
        mask = np.abs(y) > 1e-6 * (np.abs(y).max() + 1e-30)
        if mask.any():
            mx = max(mx, float((np.abs(x - y) / denom)[mask].max()))
        norm_a += float((x**2).sum())
        norm_b += float((y**2).sum())
    return mx, np.sqrt(norm_a), np.sqrt(norm_b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--bs", type=int, default=2)
    args = ap.parse_args()

    disc = ADADiscriminatorView(
        out_dim_position=6, out_dim_latent=0, img_size=args.res, in_dim=3,
        out_dim=7, n_feat=512, last_bias=False, aug_p=1,
        aug={"kwargs": dict(scale=1, xint=1)},
    )
    params0 = disc.init(jax.random.PRNGKey(0))
    gan = GANLoss("bce")
    tx = rmsprop(lr=1e-4)(None)

    x_real = smooth_batch(args.bs, args.res, 1)
    x_fake = smooth_batch(args.bs, args.res, 2)

    def d_loss(d_params, xr, xf, k1, k2):
        fn = lambda x: disc.apply(d_params, x, k1)[:, :1]
        d_real, vjp_fn = jax.vjp(fn, xr)
        grad_x = vjp_fn(jnp.ones_like(d_real))[0]
        reg = jnp.mean(jnp.sum(grad_x.reshape(xr.shape[0], -1) ** 2, axis=1))
        d_fake = disc.apply(d_params, xf, k2)[:, :1]
        return gan(d_real, 1) + gan(d_fake, 0) + 10.0 * reg, reg

    grad_fn = jax.grad(d_loss, has_aux=True)

    def step(carry, k1, k2):
        p, opt = carry
        g, reg = grad_fn(p, jnp.asarray(x_real), jnp.asarray(x_fake), k1, k2)
        upd, opt = tx.update(g, opt, p)
        import optax

        return (optax.apply_updates(p, upd), opt), reg

    backends = {}
    for name in ["cpu"] + (["tpu"] if any(d.platform != "cpu" for d in jax.devices()) else []):
        dev = jax.devices("cpu")[0] if name == "cpu" else [
            d for d in jax.devices() if d.platform != "cpu"][0]
        run_grad = jax.jit(grad_fn, device=dev)
        g, _ = run_grad(params0, jnp.asarray(x_real), jnp.asarray(x_fake),
                        jax.random.PRNGKey(10), jax.random.PRNGKey(11))
        backends[name] = jax.device_get(g)
        print(f"[{name}] one-step R1 param-grad computed")

    if "tpu" in backends:
        mx, na, nb = tree_relerr(backends["tpu"], backends["cpu"])
        print(f"one-step grad-of-grad: max elementwise relerr (TPU vs CPU) = {mx:.3e}, "
              f"norm ratio = {na / nb:.6f}")

    # ---- N-step twin training ----
    results = {}
    for name in backends:
        dev = jax.devices("cpu")[0] if name == "cpu" else [
            d for d in jax.devices() if d.platform != "cpu"][0]
        jstep = jax.jit(step, device=dev)
        carry = (params0, tx.init(params0))
        regs = []
        for i in range(args.steps):
            carry, reg = jstep(carry, jax.random.PRNGKey(1000 + i), jax.random.PRNGKey(5000 + i))
            if i % 50 == 0 or i == args.steps - 1:
                regs.append((i, float(reg)))
        results[name] = (jax.device_get(carry[0]), regs)
        print(f"[{name}] {args.steps}-step twin: reg trajectory {regs}")

    if "tpu" in results:
        mx, na, nb = tree_relerr(results["tpu"][0], results["cpu"][0])
        print(f"after {args.steps} steps: param max relerr = {mx:.3e}, "
              f"norm ratio = {na / nb:.6f}")
        r_cpu = dict(results["cpu"][1])
        r_tpu = dict(results["tpu"][1])
        gaps = {i: abs(r_cpu[i] - r_tpu[i]) / (abs(r_cpu[i]) + 1e-12) for i in r_cpu}
        print(f"reg trajectory relative gaps: {gaps}")


if __name__ == "__main__":
    main()
