"""End-to-end forward interop: a REFERENCE experiment directory (its frozen
cfg.json with `src.*` targets + a torch checkpoints/model.pt) imports into a
run directory our inference CLI consumes, and the restored generator renders.

No trained reference run ships, so the fixture fabricates one: the
reference's own configs/train.yaml (resolved through our config system,
targets left as the reference's dotted paths) + a model.pt written with the
reference's state_dict conventions via tools/export_torch_checkpoint's
mapping functions.
"""
import json
import os

import jax
import numpy as np
import pytest

import object_intrinsics_tpu  # noqa: F401 - registry
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
def reference_exp_dir(tmp_path_factory):
    import torch

    from tools.export_torch_checkpoint import generator_state_dict

    cfg = load_cfg_from_dict(load_cfg_from_path(REF_CFG), os.path.dirname(REF_CFG))
    overwrite_cfg(cfg, "dataset", REF_DATA)
    overwrite_cfg(cfg, "log_dir", "/tmp/ref_import", check_exists=False)
    cfg["resolution"] = 32  # shrink for test speed; schema untouched
    overwrite_from_dataset(cfg)
    cfg = resolve_with_omegaconf(cfg)
    # the reference's frozen cfg points at its torch sphere init; our
    # builder reads the .pt directly (utils/sphere_init)
    cfg["model"]["generator"]["kwargs"]["sdf_network"]["kwargs"]["checkpoint_path"] = (
        "/root/reference/checkpoints/sphere_init.pt"
    )

    gen = build_from_config(cfg["model"]["generator"])
    params = gen.init(jax.random.PRNGKey(3))
    camera = build_from_config(cfg["model"]["generator"]["kwargs"]["camera"])

    exp_dir = tmp_path_factory.mktemp("reference_exp")
    (exp_dir / "checkpoints").mkdir()
    sd = generator_state_dict(params, camera, it=777)
    torch.save(
        {
            "generator": sd,
            "it": 777,
            "epoch": 5,
            "ema@0.99": {"state_dict": sd, "beta": 0.99},
            "ema@0.9": {"state_dict": sd, "beta": 0.9},
        },
        exp_dir / "checkpoints" / "model.pt",
    )
    with open(exp_dir / "cfg.json", "w") as f:
        json.dump(cfg, f)
    return str(exp_dir), gen, params


def test_reference_run_imports_and_renders(reference_exp_dir, tmp_path):
    from object_intrinsics_tpu.utils.test import inference_setup
    from tools.import_torch_checkpoint import import_checkpoint

    exp_dir, gen, params = reference_exp_dir
    out_dir = str(tmp_path / "imported_run")
    import_checkpoint(
        os.path.join(exp_dir, "checkpoints", "model.pt"),
        out_dir,
        cfg_path=os.path.join(exp_dir, "cfg.json"),
    )

    cfg, model, info = inference_setup(out_dir)  # builds via src.* targets
    assert model is not None and info["it"] == 777

    for a, b in zip(jax.tree.leaves(model["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out = model["generator"].forward(
        model["params"], jax.random.PRNGKey(0), bs=1,
        it=np.asarray(777, dtype=np.int32), data={}, train=False,
    )["box"]
    img = np.asarray(out["render_out"]["image"])
    assert img.shape[1:] == (32, 32, 3) and np.isfinite(img).all()

    # EMA selection path over the imported blobs
    _, model_ema, _ = inference_setup(out_dir, ema=0.99)
    for a, b in zip(jax.tree.leaves(model_ema["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
