"""Data parallelism over a device mesh: single-program SPMD via shard_map.

Replaces the reference's multi-process NCCL DDP stack (scripts/train.py:50-56
setup_ddp, DistributedDataParallel wrap :158, DistributedSampler :70,
tu/ddp.py collectives): here the jitted train step runs once across the mesh
with

  * the batch sharded over the 'data' axis (the DistributedSampler analog),
  * params / optimizer state / EMA replicated,
  * per-chip RNG (fold_in of the axis index — the per-rank-seed analog),
  * gradients mean-reduced over ICI (the DDP allreduce): the psum is the
    implicit pvary-transpose jax inserts for grads of replicated params,
    completed by the 1/axis_size scale in ``pmean_grads``.

``consistency_check`` is the check_ddp_consistency analog (tu/ddp.py:215-225):
it fingerprints the replicated state per chip and verifies all chips agree —
catching desync bugs without broadcasting full tensors.
"""
from __future__ import annotations

import functools
import logging
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

# HARD requirement, not a soft import preference: pmean_grads below relies
# on jax>=0.9 VMA semantics, where jax.grad of replicated params inside
# shard_map already psums across the mesh (pvary transpose) and the DDP
# mean is grads / axis_size. On older jax that implicit psum does NOT
# happen — the same division would leave gradients UNREDUCED and replicas
# would silently diverge. `from jax import shard_map` alone is NOT a valid
# proxy (the stable symbol predates 0.9), so check the version explicitly.
# Fail at import rather than train wrong; setup.py pins jax>=0.9 to match.
def _require_jax_09():
    ver = tuple(int(x) for x in jax.__version__.split(".")[:2] if x.isdigit())
    if ver < (0, 9):
        raise ImportError(
            f"object_intrinsics_tpu.parallel.mesh requires jax >= 0.9 "
            f"(found {jax.__version__}): pmean_grads' divide-by-axis_size "
            "gradient sync is only correct under 0.9's VMA grad semantics "
            "(implicit pvary-transpose psum); on older jax it would leave "
            "gradients cross-chip UNREDUCED."
        )


_require_jax_09()
from jax import shard_map as _shard_map  # noqa: E402


def shard_map(f, mesh, in_specs, out_specs):
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

logger = logging.getLogger(__name__)

DATA_AXIS = "data"


def make_mesh(n_devices: int = -1) -> Mesh:
    devs = jax.devices()
    if n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=(DATA_AXIS,))


def pmean_grads(grads):
    """Mean-reduce gradients over the data axis (the DDP allreduce).

    Under jax>=0.9 shard_map VMA semantics, ``jax.grad`` w.r.t. replicated
    (unvarying) params ALREADY returns the cross-chip psum: params enter the
    varying per-chip loss through an implicit ``pvary`` broadcast whose
    transpose is a psum. The per-chip gradient is therefore sum_i g_i, and
    the DDP mean is g / axis_size. The previous ``lax.pmean`` here was an
    identity on that already-replicated sum — every >=2-device run scaled
    the effective lr by the mesh size (caught by
    tests/test_ddp_equivalence.py, which pins grads against a single-device
    global-batch step)."""
    n = jax.lax.axis_size(DATA_AXIS)
    return jax.tree.map(lambda g: g / n, grads)


def data_parallel_step(step: Callable, mesh: Mesh):
    """Wrap a per-chip train step into an SPMD step over ``mesh``.

    ``step(state, batch, key, grad_sync)`` must apply ``grad_sync`` to every
    player's gradients before its optimizer update. The wrapped function
    takes (replicated state, globally-batched data, one key) and returns
    (replicated state, mesh-averaged stats).
    """

    def per_chip(state, batch, key):
        idx = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(key, idx)
        new_state, stats = step(state, batch, key, grad_sync=pmean_grads)
        stats = jax.tree.map(lambda x: jax.lax.pmean(x, DATA_AXIS), stats)
        return new_state, stats

    fn = shard_map(
        per_chip,
        mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(fn, donate_argnums=(0,))


def data_parallel_multi_step(step: Callable, mesh: Mesh):
    """SPMD version of the K-steps-per-dispatch scan (see
    Trainer._build_multi_step): batches arrive stacked (K, global_bs, ...)
    and shard over the 'data' axis at axis 1; each scan iteration re-derives
    the step key as fold_in(fold_in(root_key, it+1), chip_idx) — the exact
    key the one-dispatch-per-step path uses — then pmean-syncs grads."""

    def per_chip(state, batches, root_key):
        idx = jax.lax.axis_index(DATA_AXIS)

        def body(st, batch):
            k = jax.random.fold_in(jax.random.fold_in(root_key, st["it"] + 1), idx)
            return step(st, batch, k, grad_sync=pmean_grads)

        state, stats = jax.lax.scan(body, state, batches)
        stats = jax.tree.map(lambda x: jax.lax.pmean(x[-1], DATA_AXIS), stats)
        return state, stats

    fn = shard_map(
        per_chip,
        mesh,
        in_specs=(P(), P(None, DATA_AXIS), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(fn, donate_argnums=(0,))


def state_hash(state) -> jnp.ndarray:
    """Integer hash of a pytree's raw bit patterns: (2,) uint32.

    Bitcast-to-uint32 with position-dependent mixing and two mod-2^32
    accumulators — bitwise-sensitive, so diverging values cannot cancel the
    way a float-sum fingerprint could."""

    def leaf_hash(x):
        x = x.ravel()
        if jnp.issubdtype(x.dtype, jnp.floating):
            bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
        else:
            bits = x.astype(jnp.uint32)
        idx = jnp.arange(bits.shape[0], dtype=jnp.uint32)
        mixed = bits * jnp.uint32(2654435761) + idx * jnp.uint32(40503)
        return jnp.stack([jnp.sum(mixed), jnp.sum(mixed * mixed + bits)])

    return sum(leaf_hash(x) for x in jax.tree.leaves(state))


def consistency_check(state, mesh: Mesh) -> bool:
    """Verify the replicated state is bitwise-consistent across chips.

    The fingerprint is an integer hash over the raw bit patterns
    (bitcast-to-uint32, mixed with a position-dependent multiplier), so two
    diverged chips cannot cancel the way a float-sum fingerprint could — the
    integer analog of the reference's elementwise broadcast-and-compare
    (tu/ddp.py:215-225), without shipping full tensors across chips."""

    def fingerprint(s):
        return jax.lax.all_gather(state_hash(s), DATA_AXIS)

    fn = shard_map(fingerprint, mesh, in_specs=(P(),), out_specs=P(DATA_AXIS))
    out = jax.jit(fn)(state)
    # multi-process: only local shards are fetchable, but each local shard
    # already holds EVERY chip's hash (the in-program all_gather), so the
    # all-equal check still covers the whole mesh from any process.
    hashes = np.concatenate([np.asarray(s.data) for s in out.addressable_shards], axis=0)
    ok = bool(np.all(hashes == hashes[0]))
    if not ok:  # pragma: no cover
        logger.error("replicated state diverged across chips: %s", hashes)
    return ok
