#!/usr/bin/env python
"""Training CLI (rebuilds the reference's scripts/train.py for TPU).

    python scripts/train.py -d data/example [-c train] [-s SEED] [-o] \
        [--mesh N] [key.path=value ...]

Differences from the torch original: no torchrun/DDP process launch — data
parallelism is single-program SPMD over a jax.sharding.Mesh (--mesh N or all
visible devices via --mesh -1); per-chip RNG and psum gradient sync replace
DistributedSampler + NCCL allreduce (scripts/train.py:50-84 in the reference).
"""
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_intrinsics_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()

# Persistent compilation cache: the fused train step is a large XLA program
# (~minutes to compile); cache it across processes.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# Debug hooks: DEBUG=1 enables NaN checking (the torch.autograd.set_detect_anomaly
# analog, reference scripts/train.py:125-126); OI_GLOBAL_PRECISION overrides the
# matmul precision for ALL ops (including discriminator convs).
if os.environ.get("DEBUG") == "1":
    jax.config.update("jax_debug_nans", True)
if os.environ.get("OI_GLOBAL_PRECISION"):
    jax.config.update("jax_default_matmul_precision", os.environ["OI_GLOBAL_PRECISION"])

import object_intrinsics_tpu  # noqa: F401  (registry)
from object_intrinsics_tpu.utils.config import build_from_config, check_cfg_consistency
from object_intrinsics_tpu.utils.logging import ScalarWriter, init_logger
from object_intrinsics_tpu.utils.train_setup import (
    build_modules,
    get_cfg,
    get_parser,
    set_seed,
)

logger = logging.getLogger("train")


def main():
    init_logger()
    parser = get_parser()
    args = parser.parse_args()
    set_seed(args.seed)

    if args.multihost:
        # the torchrun + NCCL init_process_group analog (reference
        # scripts/train.py:50-56): after this, jax.devices() spans all hosts
        # and one shard_map program runs over ICI+DCN.
        from object_intrinsics_tpu.parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)
        if not args.mesh:
            args.mesh = -1

    cfg = get_cfg(args, freeze=jax.process_index() == 0)
    logger.info("log_dir: %s", cfg["log_dir"])
    if args.profile:
        os.environ["OI_PROFILE_DIR"] = args.profile

    mesh = None
    if args.mesh:
        from object_intrinsics_tpu.parallel.mesh import make_mesh

        n = args.mesh if args.mesh > 0 else len(jax.devices())
        mesh = make_mesh(n)
        logger.info("data-parallel mesh over %d devices", n)

    # ---------------------------------------------------------------- data
    dataset = build_from_config(cfg["data"])
    n_chips = 1 if mesh is None else mesh.size
    global_bs = cfg["training"]["batch_size"] * n_chips
    # each process loads only its slice of the global batch (the
    # DistributedSampler analog; per-rank seed like the reference's
    # set_seed_benchmark(seed + rank), scripts/train.py:136 there)
    local_bs = global_bs // jax.process_count()
    train_loader = dataset.batches(local_bs, seed=args.seed + jax.process_index())

    # -------------------------------------------------------------- models
    modules = build_modules(cfg, args.seed)

    writer = ScalarWriter(cfg["log_dir"]) if jax.process_index() == 0 else None
    if writer is not None:
        # rank-0 TensorBoard auto-launch (reference scripts/train.py:188);
        # OI_TB=0 disables.
        from object_intrinsics_tpu.utils.train_setup import open_tensorboard

        open_tensorboard(cfg["log_dir"])

    trainer = build_from_config(cfg["trainer"], modules=modules, writer=writer, mesh=mesh)

    # ------------------------------------------------------------- resume
    epoch = -1
    ckpt_dir = cfg["training"].get("checkpoint_dir")
    if ckpt_dir:
        cfg_json = os.path.abspath(os.path.join(ckpt_dir, "..", "..", "cfg.json"))
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                check_cfg_consistency(
                    cfg, json.load(f),
                    ignore_keys=["log_dir", "runtime*", "training*", "trainer*"],
                )
        meta = trainer.load_checkpoint(os.path.join(ckpt_dir, "model.npz"))
        epoch = meta.get("epoch", -1)

    # -------------------------------------------------------------- train
    build_from_config(
        cfg["training"]["train_loops_fn"],
        cfg=cfg,
        trainer=trainer,
        train_loader=train_loader,
        val_loader=None,
        epoch=epoch,
        seed=args.seed,
        # epoch boundaries for max_epoch termination (loader is an
        # infinite stream; drop_last semantics match dataset.batches).
        # Divide by the GLOBAL batch: each loop iteration consumes one
        # global batch across all processes, matching the reference's
        # DistributedSampler len(dataset)//world_bs batches per epoch —
        # dividing by local_bs would advance epochs process_count x too
        # slowly under --multihost.
        batches_per_epoch=len(dataset) // global_bs,
    )


if __name__ == "__main__":
    main()
