"""Inference runner: checkpoint -> model reconstruction -> frame rendering.

Rebuilds src/utils/test.py: loads the frozen cfg.json, applies test-time
resolution/depth multipliers (update_config, test.py:55-66), rebuilds the
generator, restores weights (optionally an EMA snapshot), forces a white
background, renders each frame of a data iterator into appearance / normal /
shading maps, and dumps GIF+MP4 tables to an HTML gallery.
"""
from __future__ import annotations

import glob
import json
import logging
import os
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import load_pytree
from .config import build_from_config, overwrite_cfg
from .html import HTMLVisualizer

logger = logging.getLogger(__name__)


def update_config(cfg: dict, test_resolution: Optional[int] = None,
                  depth_multiplier: Optional[int] = None) -> None:
    """-depth k multiplies samples/ray; -res changes the crop resolution
    (src/utils/test.py:55-66)."""
    rk = cfg["model"]["generator"]["kwargs"]["renderer"]["kwargs"]
    if depth_multiplier is not None:
        overwrite_cfg(rk, "n_importance", rk["n_importance"] * depth_multiplier)
        overwrite_cfg(rk, "n_samples", rk["n_samples"] * depth_multiplier)
    if test_resolution is not None:
        overwrite_cfg(cfg, "resolution", int(test_resolution))
        overwrite_cfg(cfg["model"]["generator"]["kwargs"], "resolution", int(test_resolution))


def inference_setup(log_dir: str, test_resolution=None, depth_multiplier=None,
                    ema: Optional[float] = None, load_model: bool = True):
    """Load cfg.json + checkpoints/model.npz from a training run directory (or
    a direct checkpoint path), rebuild the generator, restore params
    (src/utils/test.py:88-128)."""
    log_dir = Path(log_dir)
    if log_dir.is_file():
        path_to_cfg = log_dir.parent.parent / "cfg.json"
        path_to_checkpoint = log_dir
    else:
        path_to_cfg = log_dir / "cfg.json"
        from .checkpoint import resolve_checkpoint

        # newest of model.npz / model.oipk (native-pack runs)
        path_to_checkpoint = Path(resolve_checkpoint(str(log_dir / "checkpoints" / "model.npz")))

    with open(path_to_cfg) as f:
        cfg = json.load(f)
    update_config(cfg, test_resolution=test_resolution, depth_multiplier=depth_multiplier)
    if not load_model:
        return cfg, None, None

    if not os.path.exists(path_to_checkpoint):
        logger.error("checkpoint not found: %s", path_to_checkpoint)
        return cfg, None, None

    state, meta = load_pytree(str(path_to_checkpoint))
    it = int(np.asarray(state["it"]))
    if it == 0:
        return cfg, None, None

    generator = build_from_config(cfg["model"]["generator"])
    template = generator.init(jax.random.PRNGKey(0))
    from .checkpoint import restore_like

    if ema is not None:
        g_state = state["ema"][f"ema@{ema}"]
    else:
        g_state = state["params"]["generator"]
    g_params = restore_like(template, g_state)

    model = {"generator": generator, "params": g_params, "it": it}
    model_info = {"it": it, "epoch": (meta or {}).get("epoch", -1),
                  "checkpoint_path": str(path_to_checkpoint)}
    return cfg, model, model_info


MAX_RAY_BATCH_SIZE = 128 * 128  # rays per render tile (src/models/generator.py:14)


def run_for_model(model: Dict, data_iter, fps: int = 25,
                  max_ray_batch: int = MAX_RAY_BATCH_SIZE):
    """Render each frame; returns {'image','normal','shading'} -> list of maps
    (src/utils/test.py:131-155). White background at test time.

    Frames whose ray x sample volume exceeds one tile (``-res``/``-depth``
    beyond the training configuration) render through the memory-bounded
    chunked/sharded path (parallel/ray_sharding.chunked_eval_render) instead
    of one monolithic jit region — the reference's MAX_RAY_BATCH_SIZE
    chunking (src/models/generator.py:286-305, scripts/test.py:278-281)."""
    gen = model["generator"]
    params = model["params"]
    it = jnp.asarray(model["it"], dtype=jnp.int32)

    chunked = gen.resolution * gen.resolution > max_ray_batch
    if chunked:
        from ..parallel.ray_sharding import chunked_eval_render

        logger.info(
            "rendering %dx%d in ray tiles of %d (memory-bounded eval path)",
            gen.resolution, gen.resolution, max_ray_batch,
        )
    else:
        fwd = jax.jit(
            lambda p, key, data: gen.forward(p, key, 1, it, data, train=False, return_raw=True, fast=True)
        )

    rearrange_fn = None
    maps_all = {"image": [], "normal": [], "shading": []}
    key = jax.random.PRNGKey(0)

    def _fetch(ro):
        # the only blocking point: device->host of one frame's three maps
        maps_all["image"].append(np.asarray(ro["image"][0]))
        maps_all["normal"].append(np.asarray(ro["normal_map"][0, ..., ::-1]) * 0.5 + 0.5)
        maps_all["shading"].append(np.asarray(ro["shading_map"][0]))

    # double-buffered walk: dispatch frame i+1, then fetch frame i while the
    # device renders — overlaps the host transfer/conversion with compute
    # (frames are independent; dispatch is async until a value is read)
    pending = None
    for i, data in enumerate(data_iter):
        if not isinstance(data, dict):
            if pending is not None:  # frame order matters to rearrange_fn
                _fetch(pending)
                pending = None
            rearrange_fn = data  # frame-order protocol (scripts/test.py:191-208)
            continue
        data = dict(data)
        data["bg_color"] = np.ones((1, 3), dtype=np.float32)  # white bg
        if chunked:
            ro = chunked_eval_render(
                gen, params, data, it=model["it"],
                key=jax.random.fold_in(key, i), max_ray_batch=max_ray_batch,
            )
        else:
            ro = fwd(params, jax.random.fold_in(key, i), data)["box"]["render_out"]
        if pending is not None:
            _fetch(pending)
        pending = ro
    if pending is not None:
        _fetch(pending)

    if rearrange_fn is not None:
        maps_all = {k: rearrange_fn(v) for k, v in maps_all.items()}
    return maps_all


def run(log_dir: str, get_data_iter_fn: Callable, vi: str, save_frames: bool = False,
        test_resolution=None, depth_multiplier=None, ema=None, force_update=False,
        max_ray_batch: Optional[int] = None):
    """Full inference entry (src/utils/test.py:21-48)."""
    cfg, model, model_info = inference_setup(
        log_dir, test_resolution, depth_multiplier, ema=ema
    )
    html_dir = vi
    existing = glob.glob(os.path.join(html_dir, "assets", "*.mp4")) + glob.glob(
        os.path.join(html_dir, "assets", "*.gif")
    )
    if not force_update and existing:
        logger.info("found existing output: %s", html_dir)
        return cfg, model
    if model is None:
        logger.warning(
            "nothing to render for %s (missing checkpoint or it=0)", log_dir
        )
        return None, None

    viz = HTMLVisualizer(html_dir, title=os.path.basename(html_dir))
    data_iter = iter(get_data_iter_fn(cfg, model))
    # -depth k multiplies samples/ray, so it divides the rays-per-tile budget
    # (the reference shrinks MAX_RAY_BATCH_SIZE the same way, scripts/test.py:278-281)
    if max_ray_batch is None:
        max_ray_batch = max(MAX_RAY_BATCH_SIZE // (depth_multiplier or 1), 1)
    maps_all = run_for_model(model, data_iter, max_ray_batch=max_ray_batch)

    row = [viz.add_video_cell(maps_all[k], fps=25, fmt="mp4") for k in maps_all]
    row_gif = [viz.add_video_cell(maps_all[k], fps=25, fmt="gif") for k in maps_all]
    viz.dump_table([row, row_gif], col_names=list(maps_all.keys()), table_name="generator")
    render_settings = (
        f"depth_multiplier {depth_multiplier or 1}, "
        f"resolution {test_resolution or 'train'}, "
        f"weights {'EMA ' + str(ema) if ema is not None else 'raw'}, "
        f"rays/tile {max_ray_batch}"
    )
    viz.dump_table(
        [[cfg["log_dir"]],
         [str(cfg.get("runtime", {}).get("slurm_job_id", "local"))],
         [f"epoch {model_info['epoch']}, it {model_info['it']}, {model_info['checkpoint_path']}"],
         [render_settings]],
        table_name="",
    )
    logger.info("wrote %s", os.path.join(html_dir, "index.html"))
    return cfg, model
