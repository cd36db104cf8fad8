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
With --batch-sizes 1,2,4 concurrent render requests coalesce into one
batched dispatch (the worker drains whatever queued while the chip was
busy), trading a longer startup (one precompile per bucket) for
multi-client throughput.
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
    """Checkpoint -> a warmed, lock-serialized render callable.

    Concurrent /render requests coalesce into one batched device dispatch
    (``batch_sizes`` buckets, each precompiled at startup): the worker
    drains whatever is queued while the chip was busy and runs it as one
    bs=N program — the TPU serving pattern for static-shape executables.
    Every request's stochastic inputs presample on the host with the same
    key splits the generator uses internally, so responses are independent
    of batch composition (bit-exact within a bucket; across buckets XLA
    may differ in the last ulp)."""

    def __init__(self, log_dir, ema=None, test_resolution=None,
                 depth_multiplier=None, batch_sizes=(1,)):
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
        self.buckets = sorted(set(int(b) for b in batch_sizes) | {1})
        key0 = jax.random.PRNGKey(0)

        def fwd(p, key, data, bs):
            return self.gen.forward(
                p, key, bs, it, data, train=False, return_raw=True, fast=True
            )["box"]["render_out"]

        self._fwd = {
            b: jax.jit(lambda p, key, data, _b=b: fwd(p, key, data, _b))
            for b in self.buckets
        }
        # warm every bucket before serving (pays each one-time jit)
        for b in self.buckets:
            data = {
                "z": np.zeros((b, self.z_dim), np.float32),
                "b2w": np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
                "bg_color": np.ones((b, 3), np.float32),
            }
            jax.block_until_ready(self._fwd[b](self.params, key0, data))

        self._queue = []
        self._cond = threading.Condition()
        self._worker = threading.Thread(target=self._batch_loop, daemon=True)
        self._worker.start()
        self.render(seed=0)  # end-to-end warm through the batcher

    def _pin_inputs(self, z, b2w, seed):
        """Presample whatever the request left unspecified, with the same
        key splits forward() uses internally (generator.py:400), so a
        seed-only request renders the exact image the unbatched path did."""
        k_pose, k_z, _, _ = jax.random.split(jax.random.PRNGKey(int(seed)), 4)
        if z is None:
            z = np.asarray(jax.random.normal(k_z, (1, self.z_dim)))
        else:
            z = np.asarray(z, dtype=np.float32).reshape(1, self.z_dim)
        if b2w is None:
            b2w = np.asarray(self.gen.pose_prior(k_pose, 1))
        else:
            b2w = np.asarray(b2w, dtype=np.float32).reshape(1, 4, 4)
        return z.astype(np.float32), b2w.astype(np.float32)

    def _batch_loop(self):
        while True:
            with self._cond:
                while not self._queue:
                    self._cond.wait()
                take = min(len(self._queue), self.buckets[-1])
                batch, self._queue = self._queue[:take], self._queue[take:]
            bucket = next(b for b in self.buckets if b >= len(batch))
            z = np.concatenate(
                [r["z"] for r in batch]
                + [batch[-1]["z"]] * (bucket - len(batch)), axis=0)
            b2w = np.concatenate(
                [r["b2w"] for r in batch]
                + [batch[-1]["b2w"]] * (bucket - len(batch)), axis=0)
            data = {"z": z, "b2w": b2w,
                    "bg_color": np.ones((bucket, 3), np.float32)}
            try:
                with self.lock:
                    ro = self._fwd[bucket](self.params, jax.random.PRNGKey(0), data)
                    maps = {k: np.asarray(ro[k])
                            for k in ("image", "normal_map", "shading_map")}
            except Exception as e:  # noqa: BLE001 - deliver, don't kill the worker
                for r in batch:
                    r["error"] = e
                    r["event"].set()
                continue
            for i, r in enumerate(batch):
                r["out"] = {k: v[i] for k, v in maps.items()}
                r["event"].set()

    def render(self, z=None, b2w=None, map_name="image", seed=0):
        z, b2w = self._pin_inputs(z, b2w, seed)
        req = {"z": z, "b2w": b2w, "event": threading.Event()}
        with self._cond:
            self._queue.append(req)
            self._cond.notify()
        req["event"].wait()
        if "error" in req:
            raise req["error"]
        out = req["out"]
        if map_name == "normal":
            img = out["normal_map"][..., ::-1] * 0.5 + 0.5
        elif map_name == "shading":
            img = out["shading_map"]
        else:
            img = out["image"]
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
    ap.add_argument(
        "--batch-sizes", default="1",
        help="comma-separated request-coalescing buckets, e.g. 1,2,4 — "
        "concurrent /render requests batch into one device dispatch "
        "(each bucket precompiles at startup)")
    args = ap.parse_args()
    server, service = create_server(
        args.path, port=args.port, ema=args.ema,
        test_resolution=args.resolution, depth_multiplier=args.depth_multiplier,
        batch_sizes=tuple(int(b) for b in args.batch_sizes.split(",")))
    print(f"serving {args.path} (it={int(service.it)}, "
          f"{service.gen.resolution}px) on http://127.0.0.1:{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
