"""Training-run assembly: CLI parser, dataset-derived render geometry, log
dirs, model/optimizer construction.

Rebuilds scripts/train.py:25-115 + tu/train/setup.py:17-90: the per-dataset
``cfg.yaml`` supplies the scene geometry prior (pose sampler, fov, crop
sizes); ``scene_fov`` and ``cam_dist`` are derived from the crop ratio when
absent, and ``scene_resolution`` scales the training resolution by the
scene/crop size ratio.
"""
from __future__ import annotations

import argparse
import datetime
import json
import logging
import os
import sys
from typing import Dict, Optional

import numpy as np

from .config import (
    build_from_config,
    load_cfg_from_dict,
    load_cfg_from_path,
    overwrite_cfg,
    overwrite_cfg_from_dotlist,
    resolve_with_omegaconf,
)

logger = logging.getLogger(__name__)


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--overwrite", action="store_true", help="overwrite output dir")
    parser.add_argument("-s", "--seed", type=int, default=0, help="seed")
    parser.add_argument("-t", "--tag", default=None, type=str, help="tag appended to output dir")
    parser.add_argument("-d", "--dataset", type=str, required=True, help="dataset directory")
    parser.add_argument("-c", "--config", type=str, default="train", help="config name or path")
    parser.add_argument("--log-unique", action="store_true", help="append timestamp to log dir")
    parser.add_argument("--mesh", type=int, default=0,
                        help="data-parallel over N devices (0 = single device, -1 = all)")
    parser.add_argument("--multihost", action="store_true",
                        help="join a multi-process run via jax.distributed.initialize "
                             "(the torchrun/NCCL setup_ddp analog); implies --mesh -1")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator host:port (default: JAX_COORDINATOR_ADDRESS / auto)")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="total process count (default: JAX_NUM_PROCESSES / auto)")
    parser.add_argument("--process-id", type=int, default=None,
                        help="this process's rank (default: JAX_PROCESS_ID / auto)")
    parser.add_argument("--profile", type=str, default=None,
                        help="capture a jax.profiler trace of train steps 10-15 into this dir")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser


def read_render_config(cfg_path: str) -> Dict:
    """Load a dataset's cfg.yaml and complete derived fields
    (scripts/train.py:25-47):

      scene_fov = 2*atan(tan(fov/2) / crop_ratio),  crop_ratio = img/scene
      cam_dist  = 1/tan(fov/2)   (object at identity pose has scale 1)
    """
    rc = load_cfg_from_dict(load_cfg_from_path(cfg_path), os.path.dirname(cfg_path))
    if rc.get("fov") is None:
        raise ValueError(f"{cfg_path} must specify fov")
    if rc.get("scene_fov") is None:
        scene = rc["img_size_scene"]
        scene0 = scene[0] if isinstance(scene, (list, tuple)) else scene
        crop_ratio = rc["img_size"] / scene0
        fov = rc["fov"]
        scene_fov = float(
            2 * np.arctan(np.tan(0.5 * fov * np.pi / 180) / crop_ratio) * 180 / np.pi
        )
        overwrite_cfg(rc, "scene_fov", scene_fov, check_exists=False)
    if rc.get("cam_dist") is None:
        cam_dist = float(1.0 / np.tan(0.5 * rc["fov"] * np.pi / 180))
        overwrite_cfg(rc, "cam_dist", cam_dist, check_exists=False)
    rc = resolve_with_omegaconf(rc)
    return rc


def overwrite_from_dataset(cfg: Dict) -> None:
    """Merge the dataset's render config into the train config
    (scripts/train.py:88-115)."""
    path = cfg["dataset"]
    rc = read_render_config(os.path.join(path, "cfg.yaml"))

    scene_fov = rc["scene_fov"][0] if isinstance(rc["scene_fov"], list) else rc["scene_fov"]
    overwrite_cfg(cfg["data_info"], "scene_fov", scene_fov)
    overwrite_cfg(cfg["data_info"], "fov", rc["fov"])
    overwrite_cfg(cfg["data_info"], "cam_dist", rc["cam_dist"])
    overwrite_cfg(cfg["data_info"], "pose_prior", rc["b2w_scene_prior"])

    if "l2w_scene_prior" in rc:
        overwrite_cfg(cfg["data_info"], "cam_loc", rc["l2w_scene_prior"]["cam_loc"])
        overwrite_cfg(cfg["data_info"], "light_loc", rc["l2w_scene_prior"]["light_loc"])
    else:
        logger.warning("no l2w_scene_prior in render config; using collocated light")

    scene = rc["img_size_scene"]
    scene0 = scene[0] if isinstance(scene, (list, tuple)) else scene
    scene_res = int(cfg["resolution"] * scene0 / rc["img_size"])
    overwrite_cfg(cfg, "scene_resolution", scene_res)
    if "opts" in rc:
        overwrite_cfg_from_dotlist(cfg, rc["opts"])


def get_log_dir(args) -> str:
    tag = f"_{args.dataset}".replace("/", "_")
    tag += "_" + os.path.basename(args.config).removesuffix(".yaml")
    if args.tag is not None:
        tag += f"_{args.tag}"
    if os.environ.get("DEBUG") == "1":
        tag += "_debug"
    if args.log_unique:
        tag += f"_{datetime.datetime.now().strftime('%Y%m%d_%H%M%S')}"
    return os.path.join("logs", tag)


def _check_log_dir_collision(log_dir: str, overwrite: bool, freeze: bool) -> None:
    """Abort (on every rank) when the log dir already exists and -o wasn't
    passed (tu/train/setup.py:67-69 in the reference).

    The decision is made ONCE, by process 0, *before* it creates the dir,
    and broadcast to the other processes — if every rank ran its own
    os.path.exists a slower rank could observe the directory process 0 just
    created and exit alone, leaving process 0 hung in the first cross-mesh
    collective. Single-process runs with ``freeze=False`` (bench.py) skip
    the check entirely: nothing is written, so nothing can collide."""
    import jax

    if jax.process_count() > 1:
        import numpy as _np
        from jax.experimental import multihost_utils

        local = 0
        if jax.process_index() == 0:
            local = int(os.path.exists(log_dir) and not overwrite)
        collision = int(multihost_utils.broadcast_one_to_all(_np.int32(local)))
    elif freeze:
        collision = int(os.path.exists(log_dir) and not overwrite)
    else:
        collision = 0
    if collision:
        logger.error("%s exists (pass -o to overwrite)", log_dir)
        sys.exit(1)


def get_cfg(args, freeze: bool = True) -> Dict:
    """Assemble, resolve, and freeze the training config (tu/train/setup.py:53-90).

    ``freeze=False`` resolves the same config without touching the
    filesystem (no log-dir collision check in single-process runs, no
    cfg.json dump) — used by bench.py so the benched program is provably
    the trained program."""
    cfg_path = args.config if os.path.exists(args.config) else f"configs/{args.config}.yaml"
    cfg = load_cfg_from_path(cfg_path)
    cfg = load_cfg_from_dict(cfg, os.path.dirname(cfg_path))
    overwrite_cfg(cfg, "dataset", args.dataset)

    log_dir = get_log_dir(args)
    _check_log_dir_collision(log_dir, args.overwrite, freeze)
    overwrite_cfg(cfg, "log_dir", log_dir, check_exists=False)

    overwrite_from_dataset(cfg)
    overwrite_cfg_from_dotlist(cfg, args.opts)
    cfg = resolve_with_omegaconf(cfg)

    cfg.setdefault("runtime", {})
    cfg["runtime"]["args"] = vars(args)
    cfg["runtime"]["argv"] = sys.argv
    cfg["runtime"]["slurm_job_id"] = os.environ.get("SLURM_JOB_ID", "local")
    cfg["runtime"]["slurm_job_name"] = os.environ.get("SLURM_JOB_NAME", "local")

    if freeze:
        os.makedirs(log_dir, exist_ok=True)
        with open(os.path.join(log_dir, "args.json"), "w") as f:
            json.dump(vars(args), f, sort_keys=True, indent=4)
        with open(os.path.join(log_dir, "cfg.json"), "w") as f:
            json.dump(cfg, f, sort_keys=True, indent=4, default=str)
    return cfg


def build_modules(cfg: Dict, seed: int) -> Dict:
    """Construct the three players + param trees + optimizers from a resolved
    config (the get_model closures, reference scripts/train.py:149-179)."""
    import jax

    from ..trainers.optim import build_optimizer
    from .tree import count_params

    key = jax.random.PRNGKey(seed)
    modules: Dict = {}
    for i, name in enumerate(["generator", "discriminator", "mask_discriminator"]):
        model = build_from_config(cfg["model"][name])
        if name == "generator":
            # training.remat: rematerialized field evaluation — fits
            # bs>=4/chip within 16 G HBM at ~3% step cost (docs/DESIGN.md
            # scaling table). OI_REMAT env overrides; the trainer also
            # flips this automatically on a compile-time OOM.
            model.remat = bool(cfg["training"].get("remat", False))
        params = model.init(jax.random.fold_in(key, i))
        tx = build_optimizer(
            cfg["training"][f"opt_{name}"], cfg["training"].get(f"sch_{name}")
        )
        modules[name] = model
        modules[f"params_{name}"] = params
        modules[f"opt_{name}"] = tx
        logger.info("%s params: %d", name, count_params(params))
    return modules


def set_seed(seed: int) -> None:
    np.random.seed(seed)


def open_tensorboard(log_dir: str):
    """Launch a TensorBoard server over the run dir and kill it at exit
    (reference tu/train_setup.py:78-86, called on rank 0 from
    scripts/train.py:188 there). Opt out with OI_TB=0; skipped silently when
    tensorboard isn't importable (no hard dependency). The launch is
    fire-and-forget: in minimal images where the server can't boot the
    child exits immediately and training proceeds unaffected."""
    if os.environ.get("OI_TB", "1") == "0":
        return None
    import importlib.util
    if importlib.util.find_spec("tensorboard") is None:
        return None
    import atexit
    import signal
    import subprocess
    cmd = [sys.executable, "-m", "tensorboard.main", "--logdir", log_dir,
           "--bind_all", "--reload_multifile", "True", "--load_fast", "false"]
    try:
        proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
    except OSError:  # no python executable / fork failure — never fatal
        return None
    logger.info("tensorboard --bind_all --logdir %s (pid %d)",
                os.path.abspath(log_dir), proc.pid)

    def _kill():
        if proc.poll() is None:
            try:
                proc.send_signal(signal.SIGTERM)
            except OSError:
                pass

    atexit.register(_kill)
    return proc
