"""Release-weights gate (r4 verdict ask #1).

Loads the in-tree release (release/example — final flagship inference
weights packaged by tools/make_release.py), renders through the standard
inference path, and asserts the committed parity thresholds
(release/example/parity_thresholds.json, derived from the full-N metrics in
docs/results/). A code change that breaks the render trips this test; a
fresh clone can run scripts/test.py / serve.py / parity_score.py against
the same weights. Skips when the release or the reference dataset is absent.

The reduced-N pass here (few renders, CPU) is noisier than the full
parity_score run, so the committed thresholds carry explicit slack; the
full gate is `python tools/parity_score.py -p release/example
--assert-thresholds release/example/parity_thresholds.json` on the chip.
"""
import json
import os
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
RELEASE = os.path.join(REPO, "release", "example")
sys.path.insert(0, os.path.join(REPO, "tools"))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(RELEASE, "checkpoints", "model.npz"))
    or not os.path.exists("/root/reference/data/example"),
    reason="release/example weights or reference dataset not present",
)


@pytest.fixture(scope="module")
def gate():
    with open(os.path.join(RELEASE, "parity_thresholds.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def metrics():
    from parity_score import compute_metrics

    # reduced-N: 8 prior-sampled renders, 8 crops/fakes for the logit gap —
    # enough to catch a broken render, cheap enough for the CPU suite
    return compute_metrics(RELEASE, n_renders=8, bs=4, n_disc=8)


def test_release_renders_and_passes_gate(gate, metrics):
    from parity_score import check_thresholds

    violations = check_thresholds(metrics, gate)
    assert not violations, "release gate violations:\n" + "\n".join(violations)


def test_release_is_trained_state(metrics):
    # a fresh/sphere-init model fails these immediately: it has ~0 silhouette
    # agreement with the crops and an untrained D
    assert metrics["provenance"]["it"] >= 100000
    assert metrics["provenance"]["weights"] == "raw"


def test_release_ema_variant_loads():
    """The EMA@0.99 weights (the gallery default) restore and render."""
    import jax

    from object_intrinsics_tpu.utils.test import inference_setup

    cfg, model, info = inference_setup(RELEASE, ema=0.99)
    assert model is not None
    out = model["generator"].forward(
        model["params"], jax.random.PRNGKey(0), 1,
        jax.numpy.asarray(model["it"], dtype=jax.numpy.int32), {},
        train=False, fast=True,
    )["box"]
    img = out["render_out"]["image"]
    assert img.shape[-1] == 3
    import numpy as np

    img = np.asarray(img)
    assert np.isfinite(img).all() and 0.0 <= img.min() and img.max() <= 1.0
