#!/usr/bin/env python
"""Serve a trained run over HTTP: on-demand renders from the checkpoint.

A deployment surface the reference never had (its only inference path is the
offline gallery walk, scripts/test.py): load a run once — params restored,
render program jit-compiled and warmed — then answer render requests from
the resident executable. Stdlib HTTP only; no server dependencies.

    python scripts/serve.py -p logs/<run> [--port 8760] [-ema 0.99]
                            [-res N] [-depth K]

Endpoints:
  GET  /health            -> {"it": ..., "resolution": ..., "ema": ...}
  POST /render            -> image/png
      JSON body (all optional):
        "z":    [z_dim floats]   latent; sampled from "seed" when absent
        "b2w":  4x4 nested list  object pose; sampled from the pose prior
                                 when absent
        "map":  "image" | "normal" | "shading"   (default "image")
        "seed": int              RNG seed for anything unspecified
  POST /mesh              -> binary PLY (watertight marching cubes, with
                             per-vertex SDF-gradient normals + learned
                             albedo unless "vertex_attrs" is false)
      JSON body (all optional):
        "z" / "seed"             as above
        "resolution": int        SDF grid, default 97 (capped at 257)
        "vertex_attrs": bool     default true

Device work is serialized behind one lock (one chip, one program); the
HTTP layer is threaded so health checks never queue behind renders.
"""
import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from object_intrinsics_tpu.utils.platform import honor_jax_platforms  # noqa: E402

honor_jax_platforms()
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np  # noqa: E402


class RenderService:
    """Checkpoint -> a warmed, lock-serialized render callable."""

    def __init__(self, log_dir, ema=None, test_resolution=None, depth_multiplier=None):
        import object_intrinsics_tpu  # noqa: F401 - registry
        from object_intrinsics_tpu.utils.test import inference_setup

        cfg, model, info = inference_setup(
            log_dir, test_resolution=test_resolution,
            depth_multiplier=depth_multiplier, ema=ema)
        if model is None:
            raise SystemExit(f"no loadable checkpoint under {log_dir}")
        self.gen = model["generator"]
        self.params = model["params"]
        self.it = model["it"]
        self.ema = ema
        self.z_dim = self.gen.z_dim
        self.lock = threading.Lock()
        self._sdf_fn = None  # lazily jitted on the first /mesh request
        it = np.asarray(self.it, dtype=np.int32)
        self._fwd = jax.jit(
            lambda p, key, data: self.gen.forward(
                p, key, 1, it, data, train=False, return_raw=True, fast=True
            )["box"]["render_out"]
        )
        self.render(seed=0)  # warm: pays the one-time jit before serving

    def render(self, z=None, b2w=None, map_name="image", seed=0):
        data = {"bg_color": np.ones((1, 3), dtype=np.float32)}
        if z is not None:
            z = np.asarray(z, dtype=np.float32).reshape(1, self.z_dim)
            data["z"] = z
        if b2w is not None:
            data["b2w"] = np.asarray(b2w, dtype=np.float32).reshape(1, 4, 4)
        key = jax.random.PRNGKey(int(seed))
        with self.lock:
            ro = self._fwd(self.params, key, data)
            if map_name == "normal":
                img = np.asarray(ro["normal_map"][0, ..., ::-1]) * 0.5 + 0.5
            elif map_name == "shading":
                img = np.asarray(ro["shading_map"][0])
            else:
                img = np.asarray(ro["image"][0])
        return np.clip(img, 0.0, 1.0)

    def mesh_ply(
        self, z=None, seed=0, resolution=97, vertex_attrs=True, bound=1.0
    ) -> bytes:
        """Watertight marching-cubes PLY of the latent's SDF (sparse field
        evaluation; normals + albedo baked in unless vertex_attrs=False)."""
        import jax.numpy as jnp

        from object_intrinsics_tpu.models import fields
        from object_intrinsics_tpu.ops.marching_cubes import extract_geometry, ply_bytes
        from object_intrinsics_tpu.utils.mesh import vertex_attributes

        resolution = int(min(max(int(resolution), 17), 257))
        if z is None:
            z = jax.random.normal(jax.random.PRNGKey(int(seed)), (1, self.z_dim))
        else:
            z = jnp.asarray(np.asarray(z, dtype=np.float32).reshape(1, self.z_dim))
        if self._sdf_fn is None:
            self._sdf_fn = jax.jit(
                lambda p, pts, w: fields.shape_sdf(p, pts[None], w)[0, :, 0]
            )
        sdf_p = self.params["sdf_network"]
        w = fields.shape_style(sdf_p, z)
        ch = 32768  # fixed-shape chunks: one compile serves every request

        def query(pts_np):
            out = np.empty(len(pts_np), dtype=np.float32)
            for i in range(0, len(pts_np), ch):
                blk = pts_np[i : i + ch].astype(np.float32)
                pad = ch - len(blk)
                v = np.asarray(
                    self._sdf_fn(sdf_p, jnp.asarray(np.pad(blk, ((0, pad), (0, 0)))), w)
                )
                out[i : i + ch] = v[: len(blk)]
            return -out  # the reference's -sdf convention

        with self.lock:
            verts, faces = extract_geometry(
                [-bound] * 3, [bound] * 3, resolution, 0.0, query
            )
            normals = colors = None
            if vertex_attrs and len(verts):
                normals, colors = vertex_attributes(self.params, w, verts)
        return ply_bytes(verts, faces, colors=colors, normals=normals)

    def png(self, **kwargs) -> bytes:
        from PIL import Image

        img = (self.render(**kwargs) * 255).astype(np.uint8)
        if img.shape[-1] == 1:
            img = img[..., 0]
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        return buf.getvalue()


def make_handler(service: RenderService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            if os.environ.get("OI_SERVE_VERBOSE") == "1":
                super().log_message(fmt, *args)

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/health", "/"):
                self._json(200, {
                    "it": int(service.it),
                    "resolution": int(service.gen.resolution),
                    "z_dim": int(service.z_dim),
                    "ema": service.ema,
                })
            else:
                self._json(404, {"error": "unknown path; POST /render or GET /health"})

        def do_POST(self):
            if self.path not in ("/render", "/mesh"):
                return self._json(404, {"error": "POST /render or /mesh"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/mesh":
                    body = service.mesh_ply(
                        z=req.get("z"), seed=req.get("seed", 0),
                        resolution=req.get("resolution", 97),
                        vertex_attrs=req.get("vertex_attrs", True),
                    )
                    ctype = "application/octet-stream"
                    extra = [("Content-Disposition", 'attachment; filename="mesh.ply"')]
                else:
                    body = service.png(
                        z=req.get("z"), b2w=req.get("b2w"),
                        map_name=req.get("map", "image"),
                        seed=req.get("seed", 0),
                    )
                    ctype = "image/png"
                    extra = []
            except Exception as e:  # noqa: BLE001 - report, don't crash the server
                return self._json(400, {"error": f"{type(e).__name__}: {e}"})
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

    return Handler


def create_server(log_dir, port=0, **service_kwargs):
    """Build (server, service); server.server_address[1] is the bound port."""
    service = RenderService(log_dir, **service_kwargs)
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))
    return server, service


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", required=True, help="run dir (cfg.json + checkpoints/)")
    ap.add_argument("--port", type=int, default=8760)
    ap.add_argument("-ema", "--ema", type=float, default=None, choices=[0.9, 0.99])
    ap.add_argument("-res", "--resolution", type=int, default=None)
    ap.add_argument("-depth", "--depth-multiplier", type=int, default=None)
    args = ap.parse_args()
    server, service = create_server(
        args.path, port=args.port, ema=args.ema,
        test_resolution=args.resolution, depth_multiplier=args.depth_multiplier)
    print(f"serving {args.path} (it={int(service.it)}, "
          f"{service.gen.resolution}px) on http://127.0.0.1:{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
