#!/usr/bin/env python
"""Multi-process (DCN-analog) smoke run on CPU: one rank of a 2-process
training job over a global mesh.

Launch one copy per rank (the torchrun analog; tests/test_multihost.py does
this automatically):

    JAX_PLATFORMS=cpu python tools/multihost_smoke.py \
        --coordinator localhost:12345 --num-processes 2 --process-id {0,1}

Each process owns 2 virtual CPU devices (4 global); the full three-player
train step runs shard_mapped over the global mesh with each rank feeding its
local batch slice, then verifies finite losses and cross-process param
consistency.
"""
import argparse
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon otherwise

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    from object_intrinsics_tpu.parallel.distributed import initialize

    initialize(args.coordinator, args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes
    n_global = jax.device_count()
    n_local = jax.local_device_count()

    from __graft_entry__ import _build_trainer
    from object_intrinsics_tpu.parallel.mesh import consistency_check, make_mesh

    mesh = make_mesh(n_global)
    trainer = _build_trainer(mesh, resolution=16)

    rng = np.random.RandomState(args.process_id)
    for i in range(args.steps):
        batch = {
            "image": rng.rand(n_local, 16, 16, 3).astype(np.float32),
            "mask": (rng.rand(n_local, 16, 16, 1) > 0.5).astype(np.float32),
        }
        stats = trainer.train_step(batch, jax.random.PRNGKey(i))
    for k, v in stats.items():
        assert np.isfinite(np.asarray(v)).all(), (k, v)
    assert consistency_check(trainer.state["params"], mesh), "params diverged"
    print(f"multihost_smoke rank {args.process_id}/{args.num_processes}: "
          f"{args.steps} steps over {n_global} global devices OK", flush=True)


if __name__ == "__main__":
    main()
