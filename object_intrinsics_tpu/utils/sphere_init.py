"""Sphere-initialization checkpoint for the shape network.

The reference's ShapeNetwork loads ``checkpoints/sphere_init.pt`` at
construction (src/models/fields.py:25-38): an SDF MLP pretrained so that
sdf(x) ~ |x| - 0.5 for any latent. This module

  * loads either that exact torch pickle (via torch-cpu, transposing
    (out,in) weights to our (in,out) layout), or our native ``.npz`` dump;
  * converts .pt -> .npz (tools/convert_sphere_init.py);
  * can regenerate the checkpoint from scratch by distilling the MLP to the
    analytic sphere SDF (tools/make_sphere_init.py), so the framework is
    self-contained without the reference artifact.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _flat_from_torch(path: str) -> Dict[str, np.ndarray]:
    import torch  # CPU-only; used solely as a pickle reader

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["sdf_network"] if "sdf_network" in state else state
    return {k: v.detach().numpy() for k, v in sd.items()}


def _flat_from_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


def load_sphere_init_flat(path: str) -> Dict[str, np.ndarray]:
    """Load by extension; a missing ``.pt`` falls back to the pre-converted
    sibling ``.npz`` so reference configs (checkpoint_path: ...sphere_init.pt)
    work without the torch artifact present."""
    base, _ = os.path.splitext(path)
    if path.endswith(".npz") and os.path.exists(path):
        return _flat_from_npz(path)
    if path.endswith(".pt") and os.path.exists(path):
        return _flat_from_torch(path)
    if os.path.exists(base + ".npz"):
        return _flat_from_npz(base + ".npz")
    if os.path.exists(base + ".pt"):
        return _flat_from_torch(base + ".pt")
    raise FileNotFoundError(path)


def load_sphere_init(path: str, params: Params) -> Params:
    """Overwrite a freshly-initialized shape-network param tree with the
    sphere-init weights (torch state-dict key schema, SURVEY §3.5)."""
    flat = load_sphere_init_flat(path)
    params = dict(params)

    style = [dict(layer) for layer in params["style"]]
    for i in range(len(style)):
        style[i]["w"] = jnp.asarray(flat[f"style.{i}.weight"].T)
        style[i]["b"] = jnp.asarray(flat[f"style.{i}.bias"])
    params["style"] = style

    trunk = [dict(layer) for layer in params["pts_linears"]]
    for i in range(len(trunk)):
        trunk[i]["w"] = jnp.asarray(flat[f"pts_linears.{i}.weight"].T)
        trunk[i]["b"] = jnp.asarray(flat[f"pts_linears.{i}.bias"])
        trunk[i]["gamma"] = {
            "w": jnp.asarray(flat[f"pts_linears.{i}.gamma.weight"].T),
            "b": jnp.asarray(flat[f"pts_linears.{i}.gamma.bias"]),
        }
        trunk[i]["beta"] = {
            "w": jnp.asarray(flat[f"pts_linears.{i}.beta.weight"].T),
            "b": jnp.asarray(flat[f"pts_linears.{i}.beta.bias"]),
        }
    params["pts_linears"] = trunk

    params["sigma_linear"] = {
        "w": jnp.asarray(flat["sigma_linear.weight"].T),
        "b": jnp.asarray(flat["sigma_linear.bias"]),
    }
    return params


def save_sphere_init_npz(path: str, flat: Dict[str, np.ndarray]) -> None:
    np.savez(path, **flat)


def shape_params_to_flat(params: Params) -> Dict[str, np.ndarray]:
    """Inverse of load_sphere_init: our tree -> torch-schema flat dict."""
    flat: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params["style"]):
        flat[f"style.{i}.weight"] = np.asarray(layer["w"]).T
        flat[f"style.{i}.bias"] = np.asarray(layer["b"])
    for i, layer in enumerate(params["pts_linears"]):
        flat[f"pts_linears.{i}.weight"] = np.asarray(layer["w"]).T
        flat[f"pts_linears.{i}.bias"] = np.asarray(layer["b"])
        flat[f"pts_linears.{i}.gamma.weight"] = np.asarray(layer["gamma"]["w"]).T
        flat[f"pts_linears.{i}.gamma.bias"] = np.asarray(layer["gamma"]["b"])
        flat[f"pts_linears.{i}.beta.weight"] = np.asarray(layer["beta"]["w"]).T
        flat[f"pts_linears.{i}.beta.bias"] = np.asarray(layer["beta"]["b"])
    flat["sigma_linear.weight"] = np.asarray(params["sigma_linear"]["w"]).T
    flat["sigma_linear.bias"] = np.asarray(params["sigma_linear"]["b"])
    return flat
