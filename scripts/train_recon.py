#!/usr/bin/env python
"""Generator-only reconstruction training (BASELINE staged config 2).

    python scripts/train_recon.py -d data/example [--max-it 1000] [--bs N]

Auto-decoder objective: learnable per-image latent + 9-d pose reconstruct
each crop photometrically (see trainers/recon_trainer.py; the reference's
RECON_OBJ branch is dead code, gan_pose_trainer.py:288-291 there).
"""
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))

import object_intrinsics_tpu  # noqa: F401
from object_intrinsics_tpu.trainers.recon_trainer import train_recon
from object_intrinsics_tpu.utils.config import build_from_config
from object_intrinsics_tpu.utils.logging import ScalarWriter, init_logger
from object_intrinsics_tpu.utils.train_setup import get_cfg, get_parser, set_seed
from object_intrinsics_tpu.utils.visualize import save_image_grid

logger = logging.getLogger("train_recon")


def main():
    init_logger()
    parser = get_parser()
    parser.add_argument("--max-it", type=int, default=1000)
    args = parser.parse_args()
    set_seed(args.seed)
    args.tag = (args.tag or "") + "_recon"
    cfg = get_cfg(args)

    dataset = build_from_config(cfg["data"])
    generator = build_from_config(cfg["model"]["generator"])
    params = generator.init(jax.random.PRNGKey(args.seed))
    writer = ScalarWriter(cfg["log_dir"])

    trainer = train_recon(
        generator, params, dataset,
        max_it=args.max_it, bs=cfg["training"]["batch_size"],
        writer=writer, seed=args.seed, print_every=100,
    )

    # reconstruction gallery: first few images vs their reconstructions
    import jax.numpy as jnp
    import numpy as np

    from object_intrinsics_tpu.utils.pose import d9_to_pose

    n = min(8, len(dataset))
    codes = trainer.state["params"]["codes"]
    data = {
        "z": codes["z"][:n],
        "b2w": d9_to_pose(codes["pose_d9"][:n]),
        "bg_color": jnp.ones((n, 3)),
    }
    out = generator.forward(
        trainer.state["params"]["gen"], jax.random.PRNGKey(0), n,
        trainer.state["it"], data, train=False, fast=True,
    )["box"]["render_out"]
    recon = np.asarray(out["image"])
    real = np.stack([dataset.get(i)["image"] for i in range(n)])
    save_image_grid(os.path.join(cfg["log_dir"], "recon_vs_real.png"),
                    np.concatenate([recon, real], axis=0), ncol=n)
    logger.info("wrote %s", os.path.join(cfg["log_dir"], "recon_vs_real.png"))


if __name__ == "__main__":
    main()
