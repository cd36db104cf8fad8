#!/usr/bin/env python
"""Convert the reference's torch ``sphere_init.pt`` to our native ``.npz``.

Usage: python tools/convert_sphere_init.py [src.pt] [dst.npz]

Defaults to the mounted reference checkpoint and ``checkpoints/sphere_init.npz``.
The .npz keeps the torch state-dict key schema (SURVEY §3.5) with (out, in)
weight layout; the loader transposes to our (in, out) layout.
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from object_intrinsics_tpu.utils.sphere_init import (  # noqa: E402
    load_sphere_init_flat,
    save_sphere_init_npz,
)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/checkpoints/sphere_init.pt"
    dst = sys.argv[2] if len(sys.argv) > 2 else "checkpoints/sphere_init.npz"
    flat = load_sphere_init_flat(src)
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    save_sphere_init_npz(dst, flat)
    print(f"wrote {dst} with {len(flat)} tensors")


if __name__ == "__main__":
    main()
