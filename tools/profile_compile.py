#!/usr/bin/env python
"""Where does the train-step compile time go?

BENCH warmup grew 51.6 s (r1) -> 122.6 s (r2) -> 206.8 s (r3) as the step
program grew (rank one-hot merges, static apron, 2D field chain). This tool
splits the cost for the flagship config: python trace -> StableHLO lowering
-> XLA backend compile, for the full step and for each player's
value_and_grad subprogram in isolation.

Usage: python tools/profile_compile.py [--bs 1] [--no-cache]
(--no-cache disables the persistent compilation cache so the numbers are
true cold-compile costs.)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--dataset", default="/root/reference/data/example")
    args = ap.parse_args()

    import jax

    if not args.no_cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np

    import object_intrinsics_tpu  # noqa: F401
    from object_intrinsics_tpu.utils.config import build_from_config
    from object_intrinsics_tpu.utils.train_setup import build_modules, get_cfg, get_parser

    train_args = get_parser().parse_args(["-d", args.dataset, "-o", "-t", "profc"])
    cfg = get_cfg(train_args, freeze=False)
    modules = build_modules(cfg, seed=0)
    trainer = build_from_config(cfg["trainer"], modules=modules, writer=None, mesh=None)

    bs = args.bs
    res = trainer.generator.resolution
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(bs, res, res, 3), dtype=jnp.float32),
        "mask": jnp.asarray((rng.rand(bs, res, res, 1) > 0.5), dtype=jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    def split_costs(name, fn, *fn_args):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*fn_args)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        cc = compiled.cost_analysis() or {}
        print(f"{name:28s} trace+lower {t_lower:7.1f}s   backend {t_compile:7.1f}s"
              f"   flops {cc.get('flops', float('nan')):.3g}")
        return compiled

    print(f"flagship config: {res}px bs={bs}  "
          f"(cache {'OFF' if args.no_cache else 'ON — rerun --no-cache for cold numbers'})")

    # full fused step
    step = trainer._make_step_body(bs)
    split_costs("full train step", step, trainer.state, batch, key)

    # per-player grad programs in isolation: rebuild the pieces the step
    # body uses, each as its own jit
    gen = trainer.generator
    disc = trainer.discriminator
    mdisc = trainer.mask_discriminator
    gan = trainer.loss_modules["gan"]
    params = trainer.state["params"]
    it = jnp.asarray(1, jnp.int32)

    def g_loss(g_params):
        out = gen.forward(g_params, key, bs, it, {}, train=True)["box"]
        d = disc.apply(params["discriminator"], out["render_out"]["image"], key)[:, :1]
        return gan(d, 1) + 10.0 * out["loss"]["eikonal"]

    split_costs("generator value_and_grad", lambda p: jax.value_and_grad(g_loss)(p),
                params["generator"])

    x_fake = batch["image"]

    def d_loss(d_params):
        d_real_fn = lambda x: disc.apply(d_params, x, key)[:, :1]
        d_real, vjp_fn = jax.vjp(d_real_fn, batch["image"])
        reg = jnp.mean(jnp.sum(vjp_fn(jnp.ones_like(d_real))[0].reshape(bs, -1) ** 2, axis=1))
        return gan(d_real, 1) + gan(disc.apply(d_params, x_fake, key)[:, :1], 0) + 10 * reg

    split_costs("image-D v&g (incl. R1)", lambda p: jax.value_and_grad(d_loss)(p),
                params["discriminator"])

    def md_loss(p):
        real_fn = lambda x: mdisc.apply(p, x, key)[:, :1]
        r, vjp_fn = jax.vjp(real_fn, batch["mask"])
        reg = jnp.mean(jnp.sum(vjp_fn(jnp.ones_like(r))[0].reshape(bs, -1) ** 2, axis=1))
        return gan(r, 1) + gan(mdisc.apply(p, batch["mask"], key), 0) + 10 * reg

    split_costs("mask-D v&g (incl. R1)", lambda p: jax.value_and_grad(md_loss)(p),
                params["mask_discriminator"])

    # no-grad fake render (the 2*bs fast render in the d-step)
    split_costs("no-grad 2bs render", lambda p: gen.forward(
        p, key, 2 * bs, it, {}, train=True, fast=True)["box"]["render_out"]["image"],
        params["generator"])


if __name__ == "__main__":
    main()
