import json
import os

import numpy as np
import pytest

from object_intrinsics_tpu.utils.generic import (
    AttrDict,
    dict_of_lists__to__list_of_dicts,
    list_of_dicts__to__dict_of_lists,
)
from object_intrinsics_tpu.utils.html import HTMLVisualizer
from object_intrinsics_tpu.utils.plot import dump_histogram, plot_camera_scene
from object_intrinsics_tpu.utils.slerp import get_interpfn, lerp, slerp
from object_intrinsics_tpu.utils.timer import ThroughputMeter, named_timeit, print_time
from object_intrinsics_tpu.utils.test import update_config
from object_intrinsics_tpu.utils.visualize import make_grid, save_video


def test_attrdict_and_transposes():
    d = AttrDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    lst = [{"x": 1, "y": 2}, {"x": 3, "y": 4}]
    dct = list_of_dicts__to__dict_of_lists(lst)
    assert dct == {"x": [1, 3], "y": [2, 4]}
    assert dict_of_lists__to__list_of_dicts(dct) == lst


def test_slerp_endpoints_and_norm():
    rng = np.random.RandomState(0)
    a, b = rng.randn(8), rng.randn(8)
    assert np.allclose(slerp(0.0, a, b), a)
    assert np.allclose(slerp(1.0, a, b), b)
    mid = slerp(0.5, a, b)
    assert np.isfinite(mid).all()
    assert get_interpfn(False, False) is lerp


def test_update_config_depth_and_res():
    cfg = {
        "resolution": 128,
        "model": {"generator": {"kwargs": {
            "resolution": 128,
            "renderer": {"kwargs": {"n_samples": 16, "n_importance": 4}},
        }}},
    }
    update_config(cfg, test_resolution=256, depth_multiplier=4)
    rk = cfg["model"]["generator"]["kwargs"]["renderer"]["kwargs"]
    assert rk["n_samples"] == 64 and rk["n_importance"] == 16
    assert cfg["model"]["generator"]["kwargs"]["resolution"] == 256


def test_html_visualizer(tmp_path):
    viz = HTMLVisualizer(str(tmp_path), title="t")
    rng = np.random.RandomState(0)
    img_cell = viz.add_image_cell(rng.rand(8, 8, 3))
    vid_cell = viz.add_video_cell([rng.rand(8, 8, 3) for _ in range(3)], fmt="gif")
    viz.dump_table([[img_cell, vid_cell]], col_names=["img", "vid"], table_name="demo")
    html = (tmp_path / "index.html").read_text()
    assert "<table" in html and "asset_00001" in html and "asset_00002" in html


def test_video_mp4_fallback(tmp_path):
    frames = [np.zeros((8, 8, 3)) for _ in range(3)]
    out = save_video(str(tmp_path / "x.mp4"), frames)
    assert os.path.exists(out)  # mp4 or gif depending on backend


def test_make_grid_shapes():
    g = make_grid(np.zeros((5, 8, 8, 1)))
    assert g.shape[-1] == 3
    assert g.shape[0] >= 8 and g.shape[1] >= 8


def test_plots(tmp_path):
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    poses[:, 2, 3] = np.linspace(1, 2, 4)
    p = plot_camera_scene(poses, str(tmp_path / "cams.png"), title="test")
    assert os.path.exists(p)
    p2 = dump_histogram(np.random.randn(100), str(tmp_path / "h.png"))
    assert os.path.exists(p2)


def test_timers():
    store = {}
    with named_timeit("a", store):
        pass
    assert "a" in store
    m = ThroughputMeter(rays_per_iter=10)
    m.tick(5)
    rep = m.report()
    assert rep["rays_per_sec"] > 0


def test_open_tensorboard(monkeypatch):
    """Rank-0 TB auto-launch (reference tu/train_setup.py:78-86): spawns a
    server process unless OI_TB=0 or tensorboard is missing."""
    from object_intrinsics_tpu.utils import train_setup

    monkeypatch.setenv("OI_TB", "0")
    assert train_setup.open_tensorboard("/tmp/nope") is None

    monkeypatch.setenv("OI_TB", "1")
    calls = {}

    class FakeProc:
        pid = 1234

        def poll(self):
            return 0  # already exited: atexit hook is a no-op

    import subprocess

    def fake_popen(cmd, **kw):
        calls["cmd"] = cmd
        return FakeProc()

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    proc = train_setup.open_tensorboard("/tmp/tbdir")
    import importlib.util
    if importlib.util.find_spec("tensorboard") is None:
        assert proc is None and "cmd" not in calls
    else:
        assert proc is not None
        assert "--logdir" in calls["cmd"] and "/tmp/tbdir" in calls["cmd"]
