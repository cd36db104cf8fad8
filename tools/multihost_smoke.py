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


def _flat(tree):
    return {
        "/".join(map(str, path)): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _pinned_batch(gen, bs, seed=11):
    """Deterministic global batch in the DDP-equivalence test's shape: one
    shared pose (equal eikonal mask counts), per-sample-distinct z/bg/real
    images so a dropped or duplicated rank contribution breaks the match
    (tests/test_ddp_equivalence.py)."""
    rng = np.random.RandomState(seed)
    b2w_one = np.asarray(gen.pose_prior(jax.random.PRNGKey(123), 1))
    return {
        "image": rng.rand(bs, 16, 16, 3).astype(np.float32),
        "mask": (rng.rand(bs, 16, 16, 1) > 0.5).astype(np.float32),
        "gen_b2w": np.tile(b2w_one, (bs, 1, 1)).astype(np.float32),
        "gen_z": rng.randn(bs, gen.z_dim).astype(np.float32),
        "gen_bg_color": rng.rand(bs, 3).astype(np.float32),
    }


def _run_pinned_equivalence(mesh, n_global, n_local, process_id):
    """Cross-PROCESS math equivalence: one pinned-input train step on the
    multi-process global mesh must produce the same parameter UPDATE as a
    single-device step on the full global batch — the DCN analog of the
    in-process DDP-equals-large-batch invariant. Same determinism recipe
    as tests/test_ddp_equivalence.py (aug_p=0, perturb=0, SGD, pinned
    gen_* inputs); tolerance is the measured per-sample-vs-batched noise
    floor (docs/DESIGN.md) — a mis-scaled cross-process grad sync (the
    lr-x-N class) misses by ~100%."""
    from __graft_entry__ import _build_trainer

    kw = dict(resolution=16, n_samples=4, n_importance=2, aug_p=0, perturb=0,
              sgd=True)
    t_mesh = _build_trainer(mesh, **kw)
    t_one = _build_trainer(None, **kw)  # every rank checks independently

    p0 = _flat(t_one.state["params"])
    for k, v in _flat(t_mesh.state["params"]).items():
        np.testing.assert_array_equal(v, p0[k], err_msg=k)

    batch_g = _pinned_batch(t_one.generator, n_global)
    lo = process_id * n_local
    batch_local = {k: v[lo:lo + n_local] for k, v in batch_g.items()}

    s_mesh = t_mesh.train_step(batch_local, jax.random.PRNGKey(7))
    s_one = t_one.train_step(batch_g, jax.random.PRNGKey(7))

    for k in s_one:
        if k.startswith(("grad_stats/", "param_norm/")):
            # grad/param-norm stats inherit the per-sample-vs-batched grad
            # noise floor (measured 0.17 rel on the near-zero deviation-grad
            # norm); the lr-x-N sync-bug class scales them by the mesh size
            rtol = 0.3
        else:
            rtol = 1e-2
        np.testing.assert_allclose(
            float(s_mesh[k]), float(s_one[k]), rtol=rtol, atol=1e-5,
            err_msg=f"stat {k}")

    # parameter UPDATES (after - before): SGD makes them inherit the grads'
    # tolerance; comparing deltas (not params) keeps the bound meaningful
    d_mesh = {k: v - p0[k] for k, v in _flat(t_mesh.state["params"]).items()}
    d_one = {k: v - p0[k] for k, v in _flat(t_one.state["params"]).items()}
    moved = 0
    for k in sorted(d_one):
        # 1e-9 absolute floor: near-zero-grad leaves carry float-dust
        # updates (~1e-10); real updates are lr-scale (>=1e-7)
        tol = 0.1 * np.abs(d_one[k]).max() + 1e-9
        np.testing.assert_allclose(d_mesh[k], d_one[k], rtol=0, atol=tol,
                                   err_msg=f"update {k}")
        moved += float(np.abs(d_one[k]).max()) > 0
    assert moved > 10, f"only {moved} leaves moved — degenerate comparison"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--pinned", action="store_true",
                    help="cross-process math-equivalence check instead of "
                         "the plain smoke")
    args = ap.parse_args()

    from object_intrinsics_tpu.parallel.distributed import initialize

    initialize(args.coordinator, args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes
    n_global = jax.device_count()
    n_local = jax.local_device_count()

    from __graft_entry__ import _build_trainer
    from object_intrinsics_tpu.parallel.mesh import consistency_check, make_mesh

    mesh = make_mesh(n_global)

    if args.pinned:
        _run_pinned_equivalence(mesh, n_global, n_local, args.process_id)
        print(f"multihost_smoke rank {args.process_id}/{args.num_processes}: "
              f"pinned-input equivalence over {n_global} global devices OK",
              flush=True)
        return

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
