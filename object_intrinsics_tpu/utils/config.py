"""YAML config system with inheritance, interpolation and reflective builds.

Re-implements the reference's config stack (tu/train/setup.py, tu/train/utils.py,
tu/utils/config.py) without OmegaConf:

  * ``_BASE_`` recursive inheritance with ``__overwrite__`` / ``__allow_new_key__``
    merge markers (tu/train/setup.py:108-151).
  * ``_ENV_VARS_`` injection into ``os.environ`` (tu/train/setup.py:124-131).
  * ``${a.b.c}`` interpolation plus arithmetic resolvers
    ``${div:...} ${sub:...} ${add:...} ${mult:...} ${int:...} ${not:...}
    ${isnan:...}`` (tu/train/utils.py:51-62).
  * dotlist CLI overrides ``a.b.c=value`` (tu/train/utils.py:12).
  * reflective object construction from ``__target__``/``kwargs`` nodes
    (tu/utils/config.py:19-47), resolved through a registry so that configs
    written against the PyTorch reference's dotted paths keep working.
  * ``check_cfg_consistency`` with fnmatch ignore patterns
    (tu/utils/config.py:50-85).
"""
from __future__ import annotations

import copy
import fnmatch
import importlib
import json
import logging
import math
import os
import re
from typing import Any, Callable, Dict, List, Optional

import yaml

logger = logging.getLogger(__name__)

# --------------------------------------------------------------------------
# Target registry
# --------------------------------------------------------------------------

# Maps dotted `__target__` strings to callables. Both the reference repo's
# module paths (``src.models...``, ``torch.optim...``) and this package's
# paths are registered so reference YAML configs run unmodified.
TARGET_REGISTRY: Dict[str, Callable] = {}


def register_target(*names: str):
    """Decorator registering a callable under one or more dotted names."""

    def deco(fn):
        for name in names:
            TARGET_REGISTRY[name] = fn
        return fn

    return deco


def resolve_target(name: str) -> Callable:
    if name in TARGET_REGISTRY:
        return TARGET_REGISTRY[name]
    # Fallback: import the dotted path directly.
    module_name, _, attr = name.rpartition(".")
    try:
        module = importlib.import_module(module_name)
        return getattr(module, attr)
    except Exception as e:  # pragma: no cover - error path
        raise KeyError(
            f"cannot resolve __target__ {name!r}: not in registry "
            f"({sorted(TARGET_REGISTRY)}) and import failed: {e}"
        ) from e


def build_from_config(node: Optional[dict], **kwargs) -> Any:
    """Instantiate ``node['__target__']`` with ``node['kwargs'] | kwargs``.

    Mirrors tu/utils/config.py:19-25. A bare string is resolved to the target
    callable itself (used for e.g. ``reg: src.loss.gan.compute_grad2``).
    The parameter is named ``node`` (not ``cfg``) so callers can forward a
    ``cfg=...`` keyword to the target, as train_loops does.
    """
    if node is None:
        return None
    if isinstance(node, str):
        return resolve_target(node)
    target = resolve_target(node["__target__"])
    merged = dict(node.get("kwargs", {}) or {})
    merged.update(kwargs)
    return target(**merged)


# --------------------------------------------------------------------------
# YAML load + _BASE_ inheritance
# --------------------------------------------------------------------------

OVERWRITE_KEY = "__overwrite__"
ALLOW_NEW_KEY = "__allow_new_key__"


def update_recursive(dict1: dict, dict2: dict) -> None:
    """Merge dict2 into dict1 (dict2 wins), honoring merge markers.

    Mirrors tu/train/setup.py:135-151: a sub-dict carrying ``__overwrite__``
    replaces the target wholesale; ``__allow_new_key__`` permits introducing
    keys absent from the base.
    """
    allow_new = dict2.get(ALLOW_NEW_KEY, False)
    for k, v in dict2.items():
        if k in (OVERWRITE_KEY, ALLOW_NEW_KEY):
            continue
        if k not in dict1:
            if not allow_new and dict1:  # empty base accepts anything
                dict1[k] = v
                continue
            dict1[k] = v
            continue
        if isinstance(v, dict) and isinstance(dict1[k], dict):
            if v.get(OVERWRITE_KEY, False):
                vv = {kk: val for kk, val in v.items() if kk not in (OVERWRITE_KEY, ALLOW_NEW_KEY)}
                dict1[k] = vv
            else:
                update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_cfg_from_path(path: str) -> dict:
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    return cfg if cfg is not None else {}


def load_cfg_from_dict(cfg: dict, base_dir: str = ".") -> dict:
    """Expand ``_BASE_`` inheritance and ``_ENV_VARS_`` (tu/train/setup.py:108-131)."""
    cfg = copy.deepcopy(cfg)
    base_path = cfg.pop("_BASE_", None)
    env_vars = cfg.pop("_ENV_VARS_", None) or {}
    if base_path:
        if not os.path.isabs(base_path):
            base_path = os.path.join(base_dir, base_path)
        base = load_cfg_from_dict(load_cfg_from_path(base_path), os.path.dirname(base_path))
        update_recursive(base, cfg)
        cfg = base
    for k, v in env_vars.items():
        os.environ[k] = str(v)
    return cfg


# --------------------------------------------------------------------------
# ${...} interpolation with resolvers
# --------------------------------------------------------------------------

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")

_RESOLVERS: Dict[str, Callable] = {
    "div": lambda x, y: x / y,
    "sub": lambda x, y: x - y,
    "add": lambda x, y: x + y,
    "mult": lambda x, y: x * y,
    "int": lambda x: int(x),
    "not": lambda x: not x,
    "isnan": lambda x: isinstance(x, float) and math.isnan(x),
}


def _lookup(root: dict, dotted: str) -> Any:
    node: Any = root
    for part in dotted.split("."):
        if isinstance(node, list):
            node = node[int(part)]
        else:
            node = node[part]
    return node


def _resolve_value(root: dict, expr: str, depth: int) -> Any:
    expr = expr.strip()
    if ":" in expr:
        name, _, argstr = expr.partition(":")
        if name in _RESOLVERS:
            args = [
                _resolve_node(root, yaml.safe_load(a.strip()), depth + 1)
                for a in argstr.split(",")
            ]
            return _RESOLVERS[name](*args)
    return _resolve_node(root, _lookup(root, expr), depth + 1)


def _resolve_node(root: dict, node: Any, depth: int = 0) -> Any:
    if depth > 50:
        raise RecursionError("config interpolation too deep (cycle?)")
    if isinstance(node, dict):
        return {k: _resolve_node(root, v, depth + 1) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_node(root, v, depth + 1) for v in node]
    if isinstance(node, str):
        # Resolve innermost-first so nested forms like ${div:${a},2} work.
        while isinstance(node, str) and "${" in node:
            if depth > 50:
                raise RecursionError("config interpolation too deep (cycle?)")
            m = _INTERP_RE.fullmatch(node.strip())
            if m:  # whole-string interpolation preserves type
                node = _resolve_value(root, m.group(1), depth)
            else:  # partial interpolation -> string substitution of inner refs
                node = _INTERP_RE.sub(
                    lambda match: str(_resolve_value(root, match.group(1), depth)), node
                )
            depth += 1
        return node
    return node


def resolve_with_omegaconf(cfg: dict) -> dict:
    """Resolve all ``${...}`` references (named after tu/train/utils.py:51)."""
    return _resolve_node(cfg, cfg)


# --------------------------------------------------------------------------
# Dotlist overrides & helpers
# --------------------------------------------------------------------------

def overwrite_cfg(cfg: dict, key: str, value: Any, check_exists: bool = True) -> None:
    if check_exists and key not in cfg:
        raise KeyError(f"key {key!r} not in cfg ({sorted(cfg)})")
    cfg[key] = value


def overwrite_cfg_from_dotlist(cfg: dict, dotlist: List[str]) -> None:
    """Apply ``a.b.c=value`` overrides; values parsed as YAML."""
    for item in dotlist:
        key, _, raw = item.partition("=")
        value = yaml.safe_load(raw)
        if isinstance(value, str):
            # YAML 1.1 rejects floats like "2e-5" (no dot); accept them anyway
            try:
                value = float(value)
            except ValueError:
                pass
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = {}
            node = node[part]
        node[parts[-1]] = value


def check_cfg_consistency(cfg1: dict, cfg2: dict, ignore_keys=()) -> bool:
    """Compare two configs, ignoring fnmatch patterns (tu/utils/config.py:50)."""
    diffs: List[str] = []

    def walk(a, b, prefix):
        if any(fnmatch.fnmatch(prefix, pat) for pat in ignore_keys):
            return
        if isinstance(a, dict) and isinstance(b, dict):
            for k in sorted(set(a) | set(b)):
                p = f"{prefix}.{k}" if prefix else str(k)
                if any(fnmatch.fnmatch(p, pat) for pat in ignore_keys):
                    continue
                if k not in a:
                    diffs.append(f"+{p}")
                elif k not in b:
                    diffs.append(f"-{p}")
                else:
                    walk(a[k], b[k], p)
        elif a != b:
            diffs.append(f"{prefix}: {a!r} != {b!r}")

    walk(cfg1, cfg2, "")
    if diffs:
        logger.warning("config inconsistency: %s", diffs)
    return not diffs


# --------------------------------------------------------------------------
# Top-level cfg assembly (tu/train/setup.py:53-106)
# --------------------------------------------------------------------------

def get_log_dir(config_name: str, dataset: Optional[str], seed: int, root: str = "logs") -> str:
    parts = []
    if dataset:
        parts.append(dataset.strip("/").replace("/", "_"))
    parts.append(config_name)
    parts.append(f"seed{seed}")
    return os.path.join(root, "_".join(parts))


def get_cfg(
    config_path: str,
    dataset: Optional[str] = None,
    seed: int = 0,
    log_dir: Optional[str] = None,
    dotlist: Optional[List[str]] = None,
    overwrite_fn_before_resolve: Optional[Callable[[dict], None]] = None,
) -> dict:
    """Load, inherit, override, resolve and freeze a training config."""
    cfg = load_cfg_from_dict(load_cfg_from_path(config_path), os.path.dirname(config_path))
    if dataset is not None:
        overwrite_cfg(cfg, "dataset", dataset)
    if log_dir is None:
        config_name = os.path.splitext(os.path.basename(config_path))[0]
        log_dir = get_log_dir(config_name, dataset, seed)
    overwrite_cfg(cfg, "log_dir", log_dir, check_exists=False)
    if dotlist:
        overwrite_cfg_from_dotlist(cfg, dotlist)
    if overwrite_fn_before_resolve is not None:
        overwrite_fn_before_resolve(cfg)
    cfg = resolve_with_omegaconf(cfg)
    return cfg


def dump_cfg_json(cfg: dict, log_dir: str) -> str:
    """Freeze the resolved config to ``log_dir/cfg.json`` — the contract for
    resume and inference (tu/train/setup.py:87-90)."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, "cfg.json")
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2, default=str)
    return path
