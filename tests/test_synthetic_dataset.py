"""Second-dataset readiness: the pipeline must not be example-folder-shaped.

Generates a synthetic multi-instance RGBA crops folder + cfg.yaml (analytic
rounded-box SDF rendered through our own NeuS renderer at Plane-prior poses,
tools/make_synthetic_dataset.py) with the same schema as the only shipped
dataset (/root/reference/data/example/cfg.yaml), then drives the REAL train
CLI end-to-end on it: cfg.yaml merge, pose-prior plumbing, scene-geometry
derivation, dataset loading, a few optimizer steps, checkpointing.
"""
import os
import runpy
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("data") / "synth_box"
    argv = sys.argv
    sys.argv = ["make_synthetic_dataset.py", "-o", str(out), "-n", "6",
                "--size", "64"]
    try:
        import make_synthetic_dataset

        make_synthetic_dataset.main()
    finally:
        sys.argv = argv
    return out


def test_fixture_is_a_valid_crops_folder(synth_dir):
    from object_intrinsics_tpu.data.dataset import Dataset

    ds = Dataset(resolution=32, dataset_folder=str(synth_dir))
    assert len(ds) == 6
    # pose-revealing content: silhouettes differ across instances
    fills = ds.alpha[..., 0].reshape(6, -1).mean(-1)
    assert fills.min() > 0.02 and fills.max() < 0.9
    assert np.ptp(fills) > 0.01, fills
    batch = next(ds.batches(2, seed=0))
    assert batch["image"].shape == (2, 32, 32, 3)
    assert np.isfinite(batch["image"]).all()


def test_train_cli_end_to_end_on_synth(synth_dir, tmp_path, monkeypatch):
    """The real scripts/train.py, 3 iterations at toy shapes, on the
    synthetic dataset: cfg merge + build + train + checkpoint."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["train.py", "-d", str(synth_dir), "-o", "-t", "synthsmoke",
         "-c", os.path.join(REPO, "configs", "train.yaml"),
         "resolution=16",
         "model.discriminator.kwargs.img_size=16",
         "model.mask_discriminator.kwargs.img_size=16",
         "model.generator.kwargs.sdf_network.kwargs.checkpoint_path=null",
         "model.generator.kwargs.renderer.kwargs.n_samples=4",
         "model.generator.kwargs.renderer.kwargs.n_importance=2",
         "training.train_loops_fn.kwargs.max_it=3",
         "training.train_loops_fn.kwargs.print_every=1",
         "training.train_loops_fn.kwargs.eval_every=0",
         "training.train_loops_fn.kwargs.visualize_every=0",
         "training.train_loops_fn.kwargs.checkpoint_every=2",
         "training.train_loops_fn.kwargs.checkpoint_overwrite=true",
         ],
    )
    runpy.run_path(os.path.join(REPO, "scripts", "train.py"), run_name="__main__")

    runs = [d for d in (tmp_path / "logs").iterdir() if "synthsmoke" in d.name]
    assert len(runs) == 1
    run = runs[0]
    assert (run / "cfg.json").exists()
    ckpt = run / "checkpoints" / "model.npz"
    assert ckpt.exists()

    from object_intrinsics_tpu.utils.checkpoint import load_pytree

    state, meta = load_pytree(str(ckpt))
    assert int(np.asarray(state["it"])) >= 3
    for leaf in __import__("jax").tree.leaves(state["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("prior", ["hemisphere", "sphere"])
def test_fixture_generates_for_every_prior_family(tmp_path, prior):
    """--prior hemisphere/sphere (the non-default families, both trained
    end-to-end on the chip: release/synth_hemi and the sphere30k run) keep
    producing valid crops + a cfg.yaml whose reference-dotted target
    resolves through our registry."""
    import yaml

    out = tmp_path / f"synth_{prior}"
    argv = sys.argv
    sys.argv = ["make_synthetic_dataset.py", "-o", str(out), "-n", "4",
                "--size", "32", "--prior", prior]
    try:
        import make_synthetic_dataset

        make_synthetic_dataset.main()
    finally:
        sys.argv = argv

    from object_intrinsics_tpu.data.dataset import Dataset
    from object_intrinsics_tpu.utils.config import build_from_config

    ds = Dataset(resolution=32, dataset_folder=str(out))
    assert len(ds) == 4
    fills = ds.alpha[..., 0].reshape(4, -1).mean(-1)
    assert fills.min() > 0.02 and fills.max() < 0.9
    assert np.ptp(fills) > 0.005, fills  # poses differ across instances

    with open(out / "cfg.yaml") as f:
        cfg = yaml.safe_load(f)
    target = cfg["b2w_scene_prior"]["__target__"]
    assert target == f"src.utils.pose_sampler.{prior.capitalize()}"
    sampler = build_from_config(cfg["b2w_scene_prior"])  # src.* alias resolves
    import jax

    b2w = np.asarray(sampler(jax.random.PRNGKey(0), 3))
    assert b2w.shape == (3, 4, 4)
    R = b2w[:, :3, :3]
    np.testing.assert_allclose(R @ np.swapaxes(R, 1, 2),
                               np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-5)


def test_recovery_eval_gt_matches_fixture_sdf():
    """tools/eval_synth_recovery duplicates the fixture's GT constants in
    numpy; pin them to the jax box_fns so they can't drift apart."""
    import jax.numpy as jnp
    from eval_synth_recovery import gt_sdf_np
    from make_synthetic_dataset import box_fns

    fns = box_fns()
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(512, 3)).astype(np.float32)
    ours = gt_sdf_np(pts)
    ref = np.asarray(fns.sdf(jnp.asarray(pts)))[..., 0]
    np.testing.assert_allclose(ours, ref, atol=2e-6)
