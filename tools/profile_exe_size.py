#!/usr/bin/env python
"""What makes the train-step executable big?

The BENCH warmup floor is the axon tunnel's executable LOAD (~145 s for
42 MB at ~0.3 MB/s, docs/DESIGN.md) — so serialized-executable SIZE is the
warmup lever, not compile time. This tool lowers the exact flagship step
(single device, CPU backend — StableHLO is platform-independent) and
reports where the bytes are:

  * total StableHLO text size,
  * bytes held in inlined `stablehlo.constant` payloads (dense<...>),
    bucketed by tensor size — big constants mean "move it to an operand",
  * instruction-count histogram — a flat histogram dominated by a few op
    kinds repeated O(layers x renders) times means "the program is
    unrolled code; shrink with scan/loop".

Usage: python tools/profile_exe_size.py [--bs 1] [--serialize]
(--serialize also XLA-compiles on CPU and reports the serialized
executable size for a rough like-for-like trend measure.)
"""
import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--serialize", action="store_true")
    ap.add_argument("--dataset", default="/root/reference/data/example")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import object_intrinsics_tpu  # noqa: F401
    from object_intrinsics_tpu.utils.config import build_from_config
    from object_intrinsics_tpu.utils.train_setup import build_modules, get_cfg, get_parser

    train_args = get_parser().parse_args(["-d", args.dataset, "-o", "-t", "profsize"])
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

    step = trainer._build_step(bs)
    lowered = step.lower(trainer.state, batch, key)
    txt = lowered.as_text()
    print(f"StableHLO text: {len(txt)/1e6:.1f} MB, {txt.count(chr(10))} lines")

    # --- constant payloads -------------------------------------------------
    # stablehlo.constant dense<...> : tensor<SHAPExDTYPE>
    const_re = re.compile(r"stablehlo\.constant dense<(.*?)> : tensor<([^>]*)>")
    DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "i64": 8, "ui64": 8,
                   "i32": 4, "ui32": 4, "i16": 2, "ui16": 2, "i8": 1, "ui8": 1,
                   "i1": 1}
    buckets = collections.Counter()
    bucket_bytes = collections.Counter()
    top = []
    for m in const_re.finditer(txt):
        payload, ty = m.group(1), m.group(2)
        parts = ty.split("x")
        dt = parts[-1]
        dims = [int(p) for p in parts[:-1] if p.isdigit()]
        n = 1
        for d in dims:
            n *= d
        nbytes = n * DTYPE_BYTES.get(dt, 4)
        # splat constants (dense<0.0>) serialize tiny regardless of shape
        splat = "," not in payload and "[" not in payload
        eff = min(nbytes, 16) if splat else nbytes
        b = ("<1KB" if eff < 1024 else "<64KB" if eff < 65536
             else "<1MB" if eff < 2**20 else ">=1MB")
        buckets[b] += 1
        bucket_bytes[b] += eff
        if eff >= 65536:
            top.append((eff, ty, len(payload)))
    print("constants (effective serialized bytes; splats counted tiny):")
    for b in ["<1KB", "<64KB", "<1MB", ">=1MB"]:
        print(f"  {b:>6}: {buckets[b]:6d} consts, {bucket_bytes[b]/1e6:8.2f} MB")
    top.sort(reverse=True)
    for eff, ty, plen in top[:12]:
        print(f"    big: {eff/1e6:6.2f} MB  tensor<{ty}>  (payload {plen/1e6:.2f} MB text)")

    # --- instruction histogram --------------------------------------------
    op_re = re.compile(r"= \"?(stablehlo\.[a-z_.]+|func\.call)")
    ops = collections.Counter(m.group(1) for m in op_re.finditer(txt))
    total = sum(ops.values())
    print(f"instructions: {total} total; top 15:")
    for op, n in ops.most_common(15):
        print(f"  {op:32s} {n:7d}")

    if args.serialize:
        import time
        t0 = time.time()
        compiled = lowered.compile()
        t = time.time() - t0
        try:
            ser = compiled.runtime_executable().serialize()
            print(f"CPU-compiled serialized size: {len(ser)/1e6:.1f} MB ({t:.0f}s compile)")
        except Exception as e:  # noqa: BLE001
            print(f"CPU compile {t:.0f}s; serialize unavailable: {e}")


if __name__ == "__main__":
    main()
