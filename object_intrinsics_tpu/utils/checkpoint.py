"""Checkpoint IO: whole-training-state snapshots as flat .npz archives.

Rebuilds src/utils/checkpoint.py (CheckpointIO) without torch pickles: the
state is a pytree flattened to '/'-joined keys in one compressed .npz plus a
JSON sidecar for scalars (it, epoch, beta values). Single-file, atomic
(write-to-temp + rename), and readable without JAX.

Layout compatibility: like the reference's model.pt, one archive carries
generator/discriminator/mask_discriminator params, optimizer states, and the
EMA snapshots ('ema@0.99', 'ema@0.9').
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

SEP = "/"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{SEP}"))
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}__seq__"] = np.asarray(
            [len(tree), 1 if isinstance(tree, tuple) else 0], dtype=np.int64
        )
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{SEP}"))
    elif tree is None:
        out[f"{prefix}__none__"] = np.zeros((), dtype=np.int8)
    else:
        out[prefix.rstrip(SEP)] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    # group keys by first path segment
    if "__none__" in flat and len(flat) == 1:
        return None
    if "" in flat and len(flat) == 1:
        return flat[""]
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    leaf = None
    seq_meta = None
    for k, v in flat.items():
        if k == "__seq__":
            seq_meta = v
            continue
        if SEP in k:
            head, rest = k.split(SEP, 1)
            groups.setdefault(head, {})[rest] = v
        else:
            if k == "__none__":
                return None
            groups.setdefault(k, {})[""] = v
    if seq_meta is not None:
        n, is_tuple = int(seq_meta[0]), bool(seq_meta[1])
        items = [_unflatten(groups[str(i)]) for i in range(n)]
        return tuple(items) if is_tuple else items
    out = {}
    for k, sub in groups.items():
        if list(sub.keys()) == [""]:
            out[k] = sub[""]
        else:
            out[k] = _unflatten(sub)
    return out


def save_pytree(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    """Atomic single-file save: <path> (.npz or .oipk) + <path>.json sidecar.

    The ``.oipk`` extension routes through the native checkpoint pack
    (native/ckptpack.cpp): a single C write pass (tmp+fsync+rename atomic),
    mmap zero-copy reads —
    the torch.save/C++-pickling analog. ``.npz`` stays the portable default."""
    flat = _flatten(jax.device_get(tree))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".oipk"):
        from . import ckpt_native

        ckpt_native.write_pack(path, flat, meta)  # atomic inside
    else:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
        os.close(fd)
        try:
            with open(tmp, "wb") as f:
                np.savez(f, **flat)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_pytree(path: str) -> Tuple[Any, Optional[dict]]:
    if path.endswith(".oipk"):
        from . import ckpt_native

        flat, meta_pack = ckpt_native.read_pack(path)
        return _unflatten(flat), (meta_pack or None)
    with np.load(path, allow_pickle=False) as f:
        flat = {k: f[k] for k in f.files}
    meta = None
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return _unflatten(flat), meta


def restore_like(template: Any, loaded: Any) -> Any:
    """Map loaded leaves back onto ``template``'s pytree structure.

    Optax states are NamedTuples; they serialize as plain tuples (same leaf
    order), so a freshly-initialized state serves as the structure template.

    Shape mismatches are hard errors: a checkpoint from a different
    architecture must fail loudly, never be silently reshaped into the
    template (scalars stored as size-1 arrays are the one tolerated case).
    """
    leaves = jax.tree.leaves(loaded)
    treedef = jax.tree.structure(template)
    t_leaves = jax.tree.leaves(template)
    assert len(leaves) == len(t_leaves), (len(leaves), len(t_leaves))
    out = []
    for i, (l, t) in enumerate(zip(leaves, t_leaves)):
        if not hasattr(t, "shape"):
            out.append(l)
            continue
        arr = np.asarray(l)
        if tuple(arr.shape) != tuple(t.shape) and not (
            arr.size == 1 and int(np.prod(t.shape, dtype=np.int64)) == 1
        ):
            raise ValueError(
                f"checkpoint/template shape mismatch at leaf {i}: "
                f"loaded {arr.shape} vs expected {tuple(t.shape)} — refusing "
                f"to reshape (wrong architecture?)"
            )
        out.append(arr.astype(t.dtype).reshape(t.shape))
    return jax.tree.unflatten(treedef, out)


def coerce_leaf_stream(template: Any, loaded: Any) -> Any:
    """Re-slice ``loaded``'s leaves onto ``template``'s leaf shapes,
    preserving element order.

    Optimizer state saved under one leaf layout must restore under another:
    the trainer's flat-buffer optimizer (trainers/gan_pose_trainer.py,
    ``flat_optim``) keeps each player's optax state as ONE raveled vector,
    while older checkpoints store one leaf per param. Both layouts traverse
    the same elements in the same order (ravel_pytree and tree.leaves share
    dict-key-sorted traversal), so a cursor re-slicing converts either
    direction. Integer leaves (optax step counts) must align exactly with an
    integer leaf boundary — a misalignment means the structures are NOT
    stream-compatible, and that is a hard error, never a silent cast.
    """
    t_leaves, treedef = jax.tree.flatten(template)
    l_leaves = [np.asarray(x) for x in jax.tree.leaves(loaded)]
    n_have = sum(int(x.size) for x in l_leaves)
    n_want = sum(int(np.prod(t.shape, dtype=np.int64)) if hasattr(t, "shape") else 1
                 for t in t_leaves)
    if n_have != n_want:
        raise ValueError(
            f"cannot coerce optimizer state: {n_have} loaded elements vs "
            f"{n_want} expected (different optimizer or architecture?)"
        )
    out, li, off = [], 0, 0
    for i, t in enumerate(t_leaves):
        if not hasattr(t, "shape"):
            if off != 0:
                raise ValueError(
                    f"shapeless leaf {i} lands mid-way through a loaded "
                    f"leaf — layouts are not stream-compatible"
                )
            out.append(l_leaves[li])
            li += 1
            continue
        n = int(np.prod(t.shape, dtype=np.int64))
        if np.issubdtype(np.dtype(t.dtype), np.integer):
            cur = l_leaves[li]
            if off != 0 or cur.size != n or not np.issubdtype(cur.dtype, np.integer):
                raise ValueError(
                    f"integer leaf {i} ({t.dtype}, size {n}) does not align "
                    f"with a loaded integer leaf — refusing to cast"
                )
            out.append(cur.astype(t.dtype).reshape(t.shape))
            li += 1
            continue
        if n == 0:
            out.append(np.zeros(t.shape, dtype=t.dtype))
            continue
        chunks, need = [], n
        while need:
            cur = l_leaves[li].reshape(-1)
            if not np.issubdtype(cur.dtype, np.floating):
                raise ValueError(
                    f"float leaf {i} would consume a {cur.dtype} loaded leaf "
                    f"— layouts are not stream-compatible"
                )
            take = min(need, int(cur.size) - off)
            chunks.append(cur[off:off + take])
            off += take
            need -= take
            if off == cur.size:
                li, off = li + 1, 0
        arr = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
        out.append(arr.astype(t.dtype).reshape(t.shape))
    assert li == len(l_leaves) and off == 0, (li, len(l_leaves), off)
    return jax.tree.unflatten(treedef, out)


def resolve_checkpoint(path: str) -> str:
    """Resolve a checkpoint path across the two on-disk formats: given
    ``.../model`` / ``.../model.npz`` / ``.../model.oipk``, return the
    NEWEST existing variant (a format switch mid-project must not silently
    resume from the stale file)."""
    base = path
    for ext in (".npz", ".oipk"):
        if base.endswith(ext):
            base = base[: -len(ext)]
            break
    cands = [base + ext for ext in (".npz", ".oipk")]
    cands = [c for c in cands if os.path.exists(c)]
    if not cands:
        return path
    return max(cands, key=os.path.getmtime)


class CheckpointIO:
    """Directory-scoped checkpoint manager (src/utils/checkpoint.py:16-147).

    ``save('model', **state)`` writes <dir>/model.npz (+ .json); ``load``
    returns (state, meta)."""

    def __init__(self, checkpoint_dir: Optional[str]):
        self.checkpoint_dir = checkpoint_dir
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)

    def path(self, name: str) -> str:
        assert self.checkpoint_dir is not None
        if not (name.endswith(".npz") or name.endswith(".oipk")):
            # OI_CKPT_FORMAT=oipk selects the native mmap pack — but only
            # when the shared library actually built on this host; a broken
            # toolchain must degrade to .npz, not kill the run at its first
            # checkpoint.
            ext = ".npz"
            if os.environ.get("OI_CKPT_FORMAT") == "oipk":
                from . import ckpt_native

                if ckpt_native.available():
                    ext = ".oipk"
                else:
                    import logging

                    logging.getLogger(__name__).warning(
                        "OI_CKPT_FORMAT=oipk requested but the native pack "
                        "is unavailable; falling back to .npz"
                    )
            name = name + ext
        return os.path.join(self.checkpoint_dir, name)

    def save(self, name: str, state: Any, meta: Optional[dict] = None) -> str:
        p = self.path(name)
        save_pytree(p, state, meta)
        return p

    def load(self, name_or_path: str) -> Tuple[Any, Optional[dict]]:
        # Bare names resolve inside checkpoint_dir FIRST: a stray
        # model.npz in the CWD must never shadow the run's checkpoint.
        # Explicit paths (absolute, or containing a separator) resolve
        # as given.
        if self.checkpoint_dir and not os.path.isabs(name_or_path) and (
            os.sep not in name_or_path
        ):
            p = resolve_checkpoint(self.path(name_or_path))
            if not os.path.exists(p):
                p = resolve_checkpoint(name_or_path)
        else:
            p = resolve_checkpoint(name_or_path)
            if not os.path.exists(p) and self.checkpoint_dir:
                p = resolve_checkpoint(self.path(name_or_path))
        return load_pytree(p)
