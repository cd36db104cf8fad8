"""Exact golden test: our FiLM-SIREN trunk vs the reference's torch modules
(src/third_party/stylesdf/volume_renderer.py, importable on CPU) loaded with
the same sphere-init weights."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
SPHERE = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "sphere_init.npz")
pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and os.path.exists(SPHERE)), reason="reference/ckpt missing"
)


def test_trunk_forward_matches_reference_modules():
    import torch

    sys.path.insert(0, REF)
    from src.third_party.stylesdf.volume_renderer import FiLMSiren, LinearLayer

    from object_intrinsics_tpu.models import fields
    from object_intrinsics_tpu.utils.sphere_init import load_sphere_init_flat

    flat = load_sphere_init_flat(SPHERE)

    # build the reference's 8-layer trunk + sdf head and load the weights
    layers = [FiLMSiren(3, 128, style_dim=64, is_first=True)] + [
        FiLMSiren(128, 128, style_dim=64) for _ in range(7)
    ]
    head = LinearLayer(128, 1, freq_init=True)
    with torch.no_grad():
        for i, m in enumerate(layers):
            m.weight.copy_(torch.tensor(flat[f"pts_linears.{i}.weight"]))
            m.bias.copy_(torch.tensor(flat[f"pts_linears.{i}.bias"]))
            m.gamma.weight.copy_(torch.tensor(flat[f"pts_linears.{i}.gamma.weight"]))
            m.gamma.bias.copy_(torch.tensor(flat[f"pts_linears.{i}.gamma.bias"]))
            m.beta.weight.copy_(torch.tensor(flat[f"pts_linears.{i}.beta.weight"]))
            m.beta.bias.copy_(torch.tensor(flat[f"pts_linears.{i}.beta.bias"]))
        head.weight.copy_(torch.tensor(flat["sigma_linear.weight"]))
        head.bias.copy_(torch.tensor(flat["sigma_linear.bias"]))

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(2, 64, 3)).astype(np.float32)
    w = rng.randn(2, 64).astype(np.float32)

    # reference forward (their (bs, n, 1, 1, c) FiLM broadcast shape)
    with torch.no_grad():
        x = torch.tensor(pts).reshape(2, 64, 1, 1, 3)
        s = torch.tensor(w)
        for m in layers:
            x = m(x, s)
        ref_sdf = head(x).reshape(2, 64, 1).numpy()

    params = fields.init_shape_network(jax.random.PRNGKey(0), checkpoint_path=SPHERE)
    ours = np.asarray(fields.shape_sdf(params, jnp.asarray(pts), jnp.asarray(w)))
    assert np.abs(ours - ref_sdf).max() < 1e-4, np.abs(ours - ref_sdf).max()
