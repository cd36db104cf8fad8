#!/usr/bin/env python
"""Inference CLI: render camera-walk and latent-walk sequences from a trained
run, decomposed into appearance / normal / shading maps.

Rebuilds the reference's scripts/test.py with the same flags:

    python scripts/test.py -p <run_dir_or_ckpt> [-t TAG] [-res N] [-depth K]
                           [-ema {0.9,0.99}] [-dry] [--force-update]
"""
import argparse
import glob
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_intrinsics_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np
from pathlib import Path
from scipy.spatial.transform import Rotation as R

import object_intrinsics_tpu  # noqa: F401
from object_intrinsics_tpu.utils.pose import (
    get_tip_from_spherical_coord,
    look_at,
    mat_33_to_44_np,
)
from object_intrinsics_tpu.utils.test import run
from object_intrinsics_tpu.utils.train_setup import set_seed

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def get_canonical(cfg, model) -> np.ndarray:
    """Per-dataset canonical display pose (scripts/test.py:23-43)."""
    folder = cfg["data"]["kwargs"]["dataset_folder"]
    prior = model["generator"].pose_prior
    if "rose" in folder:
        p = get_tip_from_spherical_coord(elev=np.pi / 4, azim=0.0)
        mat = look_at(eye=(0, 0, 0), center=p)
        roll = R.from_rotvec(prior.canonical_vec * (np.pi / 2 * 3)).as_matrix()
        return mat_33_to_44_np(mat @ roll)
    if "tulip" in folder:
        p = get_tip_from_spherical_coord(elev=np.pi / 6, azim=0.0)
        return mat_33_to_44_np(look_at(eye=(0, 0, 0), center=p))
    if "green_crane" in folder:
        base = prior.canonical
        p = get_tip_from_spherical_coord(elev=np.pi / 3, azim=0.0)
        return base @ mat_33_to_44_np(look_at(eye=p))
    return prior.canonical


def get_data_iter_camera_walk(cfg, model):
    """Latent fixed, pose rolls 360 deg about the prior's canonical axis
    (scripts/test.py:231-244)."""
    import jax.numpy as jnp

    n_frames = 128 if os.getenv("DEBUG") != "1" else 16
    gen = model["generator"]
    z = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (1, gen.z_dim), dtype=jnp.float32)
    )
    mat_base = get_canonical(cfg, model)
    rot = np.linspace(0, 360, n_frames, endpoint=False) * np.pi / 180
    rotvec = gen.pose_prior.canonical_vec[None, :] * rot[:, None]
    rolls = R.from_rotvec(rotvec).as_matrix()
    mats = mat_base @ mat_33_to_44_np(rolls)
    for i in range(n_frames):
        yield {"z": z, "b2w": mats[i : i + 1].astype(np.float32)}


def get_data_iter_latent_walk(cfg, model):
    """Pose fixed at canonical, cubic interpolation through 16 style anchors
    in w-space (scripts/test.py:90-112)."""
    import scipy.interpolate

    from object_intrinsics_tpu.models import fields

    gen = model["generator"]
    params = model["params"]
    num_keyframes = 16
    z = np.array(jax.random.normal(jax.random.PRNGKey(3), (num_keyframes, gen.z_dim)))
    z[-1] = z[0]  # closed loop
    w = np.asarray(fields.shape_style(params["sdf_network"], z))
    interp = scipy.interpolate.interp1d(
        np.linspace(0.0, 1.0, num_keyframes), w, kind="cubic", axis=0
    )
    b2w = get_canonical(cfg, model)[None].astype(np.float32)
    n_frames = 256 if os.getenv("DEBUG") != "1" else 32
    for i in range(n_frames):
        yield {
            "z": np.zeros((1, gen.z_dim), dtype=np.float32),
            "w": interp(i / n_frames)[None].astype(np.float32),
            "b2w": b2w,
        }


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-p", "--path", nargs="+", type=str, required=True)
    parser.add_argument("-t", "--tag", type=str, default="default")
    parser.add_argument("-res", "--resolution", default=None, type=int)
    parser.add_argument("-depth", "--depth-multiplier", default=None, type=int)
    parser.add_argument("-ema", "--ema", type=float, default=None, choices=[0.9, 0.99])
    parser.add_argument("-dry", "--dry", action="store_true")
    parser.add_argument("--force-update", action="store_true")
    return parser.parse_args()


def main_fn(run_fn, get_data_iter_fn, default_log_dir):
    args = parse_args()
    set_seed(0)

    paths = list(reversed(sorted(args.path, key=os.path.getmtime)))
    for path in paths:
        if os.path.isfile(path):
            out_dir = os.path.abspath(os.path.join(path, os.pardir, os.pardir))
            checkpoint_paths = [path]
        else:
            out_dir = path
            from object_intrinsics_tpu.utils.checkpoint import resolve_checkpoint

            cand = resolve_checkpoint(os.path.join(out_dir, "checkpoints", "model.npz"))
            checkpoint_paths = [cand] if os.path.exists(cand) else []
        cfg_path = os.path.join(out_dir, "cfg.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
        else:
            cfg = {"runtime": {"slurm_job_id": "dummy"}}

        for checkpoint_path in reversed(sorted(checkpoint_paths, key=os.path.getmtime)):
            if args.dry:
                logger.info("dry: would render %s", checkpoint_path)
                continue
            html_basename = Path(checkpoint_path).stem
            if args.ema is not None:
                html_basename += f"_ema_{str(args.ema).split('.')[-1]}"
            # the tag separates galleries for different render settings
            # (-depth/-res) — the reference reuses one dir and overwrites
            job = str(cfg["runtime"].get("slurm_job_id", "local"))
            if args.tag and args.tag != "default":
                job += f"_{args.tag}"
            html_dir = os.path.join(default_log_dir, job, html_basename)
            run_fn(
                log_dir=checkpoint_path,
                get_data_iter_fn=get_data_iter_fn,
                vi=html_dir,
                test_resolution=args.resolution,
                depth_multiplier=args.depth_multiplier,
                ema=args.ema,
                force_update=args.force_update,
            )


def main():
    main_fn(run_fn=run, get_data_iter_fn=get_data_iter_camera_walk,
            default_log_dir="logs/test_view")
    main_fn(run_fn=run, get_data_iter_fn=get_data_iter_latent_walk,
            default_log_dir="logs/test_latent")


if __name__ == "__main__":
    main()
