"""Multi-process (multi-host / DCN) launch support.

The reference launches one process per GPU with torchrun and forms an NCCL
process group (setup_ddp, reference scripts/train.py:50-56). The JAX analog
is multi-controller SPMD: every process calls
``jax.distributed.initialize``, after which ``jax.devices()`` spans ALL
hosts and one ``shard_map`` program runs across the full mesh — gradient
psum rides ICI within a host and DCN across hosts. No per-module wrappers,
no explicit process groups.

Entry: ``scripts/train.py --multihost [--coordinator HOST:PORT
--num-processes N --process-id I]`` (flags fall back to the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars, and
to full auto-detection on TPU pods).

Data feeding: each process loads only its local slice of the global batch
(the DistributedSampler analog) and ``host_local_to_global`` assembles the
global jax.Array from per-process shards.
"""
from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

logger = logging.getLogger(__name__)


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process runtime (idempotent). With no arguments, JAX
    auto-detects TPU-pod metadata or the JAX_* env vars; explicit flags win."""
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    logger.info(
        "multihost: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def host_local_to_global(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """Assemble per-process local batch slices into global jax.Arrays sharded
    over the mesh's data axis (each process contributes
    ``global_bs / process_count`` rows)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
