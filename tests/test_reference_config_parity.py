"""Strongest parity check: the PyTorch reference's own YAML configs drive
this framework verbatim — every __target__ resolves through the registry, the
dataset cfg.yaml merge reproduces the derived scene geometry, and all three
models + trainer build and step."""
import os

import jax
import numpy as np
import pytest

import object_intrinsics_tpu  # noqa: F401
from object_intrinsics_tpu.trainers.optim import build_optimizer
from object_intrinsics_tpu.utils.config import (
    build_from_config,
    load_cfg_from_dict,
    load_cfg_from_path,
    overwrite_cfg,
    resolve_with_omegaconf,
)
from object_intrinsics_tpu.utils.train_setup import overwrite_from_dataset

REF_CFG = "/root/reference/configs/train.yaml"
REF_DATA = "/root/reference/data/example"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CFG), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_cfg():
    cfg = load_cfg_from_dict(load_cfg_from_path(REF_CFG), os.path.dirname(REF_CFG))
    overwrite_cfg(cfg, "dataset", REF_DATA)
    overwrite_cfg(cfg, "log_dir", "/tmp/ref_parity", check_exists=False)
    # shrink for test speed (dotlist-style edits, schema untouched)
    cfg["resolution"] = 32
    overwrite_from_dataset(cfg)
    cfg = resolve_with_omegaconf(cfg)
    return cfg


def test_reference_yaml_derives_scene_geometry(ref_cfg):
    # crop ratio 256/1588 at fov 10 (data/example/cfg.yaml)
    assert ref_cfg["data_info"]["fov"] == 10
    assert abs(ref_cfg["data_info"]["scene_fov"] - 56.9) < 1.0
    assert abs(ref_cfg["data_info"]["cam_dist"] - 11.430) < 1e-2
    assert ref_cfg["scene_resolution"] == int(32 * 1588 / 256)
    assert ref_cfg["data_info"]["pose_prior"]["__target__"] == "src.utils.pose_sampler.Plane"


def test_reference_yaml_builds_and_steps(ref_cfg):
    import copy

    cfg = copy.deepcopy(ref_cfg)
    # keep sample counts tiny for CPU
    rk = cfg["model"]["generator"]["kwargs"]["renderer"]["kwargs"]
    rk["n_samples"], rk["n_importance"] = 4, 2
    for name in ["discriminator", "mask_discriminator"]:
        cfg["model"][name]["kwargs"]["img_size"] = 32

    key = jax.random.PRNGKey(0)
    modules = {}
    for i, name in enumerate(["generator", "discriminator", "mask_discriminator"]):
        model = build_from_config(cfg["model"][name])
        modules[name] = model
        modules[f"params_{name}"] = model.init(jax.random.fold_in(key, i))
        modules[f"opt_{name}"] = build_optimizer(
            cfg["training"][f"opt_{name}"], cfg["training"].get(f"sch_{name}")
        )

    trainer = build_from_config(cfg["trainer"], modules=modules, writer=None, mesh=None)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(1, 32, 32, 3).astype(np.float32),
        "mask": (rng.rand(1, 32, 32, 1) > 0.5).astype(np.float32),
    }
    stats = trainer.train_step(batch, jax.random.PRNGKey(1))
    for k, v in stats.items():
        assert np.isfinite(np.asarray(v)).all(), (k, v)
    assert trainer.it == 0


def test_reference_dataset_loads(ref_cfg):
    ds = build_from_config(ref_cfg["data"])
    assert len(ds) == 28
    item = ds.get(0)
    assert item["image"].shape == (32, 32, 3)
