#!/usr/bin/env python
"""Measure warm /render latency of the HTTP serving endpoint.

The endpoint's point is "on-demand renders from a resident warmed
executable" — a latency claim that r4 shipped unmeasured (verdict weak #6).
This starts scripts/serve.py's server in-process against a run/release dir,
then reports:

  * sequential warm latency: p50/p95 over N requests (one client);
  * concurrent latency: p50/p95 per-request wall time with C clients
    issuing requests simultaneously — device work serializes behind the
    service lock (one chip, one program), so this is the number a
    multi-client deployment actually sees.

Usage:
    python tools/bench_serve.py -p release/example [-n 20] [-c 4] [--ema 0.99]

Prints one summary JSON line; paste into README/DESIGN next to the endpoint
docs.
"""
import argparse
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _request(port, body, path="/render", magic=b"\x89PNG\r\n\x1a\n"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    t0 = time.time()
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    dt = time.time() - t0
    assert resp.status == 200, (resp.status, data[:200])
    assert data[: len(magic)] == magic, f"wrong magic for {path}"
    conn.close()
    return dt


def _pcts(xs):
    import numpy as np

    xs = np.asarray(xs) * 1e3
    return {"p50_ms": round(float(np.percentile(xs, 50)), 1),
            "p95_ms": round(float(np.percentile(xs, 95)), 1),
            "min_ms": round(float(xs.min()), 1),
            "max_ms": round(float(xs.max()), 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", required=True)
    ap.add_argument("-n", "--num", type=int, default=20)
    ap.add_argument("-c", "--clients", type=int, default=4)
    ap.add_argument("--ema", type=float, default=None)
    ap.add_argument("--mesh-res", type=int, default=97,
                    help="grid resolution for the /mesh latency rows")
    ap.add_argument("--mesh-n", type=int, default=5,
                    help="warm /mesh requests to time (0 disables)")
    args = ap.parse_args()

    import jax

    from object_intrinsics_tpu.utils.platform import honor_jax_platforms

    honor_jax_platforms()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from serve import create_server

    t0 = time.time()
    server, service = create_server(args.path, port=0, ema=args.ema)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    startup_s = time.time() - t0  # includes restore + jit warm

    # one more warm request so timing never includes a first-dispatch tail
    _request(port, {"seed": 123})

    seq = [_request(port, {"seed": i}) for i in range(args.num)]

    conc, errs = [], []
    barrier = threading.Barrier(args.clients)

    def client(cid):
        try:
            barrier.wait()
            for i in range(max(1, args.num // args.clients)):
                conc.append(_request(port, {"seed": 10_000 + cid * 1000 + i}))
        except Exception as e:  # noqa: BLE001
            errs.append(repr(e))

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs

    mesh_rows = {}
    if args.mesh_n:
        # first request pays the SDF-query jit; report it separately
        cold = _request(port, {"seed": 0, "resolution": args.mesh_res},
                        path="/mesh", magic=b"ply\n")
        warm = [_request(port, {"seed": 1 + i, "resolution": args.mesh_res},
                         path="/mesh", magic=b"ply\n")
                for i in range(args.mesh_n)]
        mesh_rows = {
            f"mesh_res{args.mesh_res}_first_s": round(cold, 1),
            f"mesh_res{args.mesh_res}_warm": _pcts(warm),
        }

    server.shutdown()
    summary = {
        "run": os.path.abspath(args.path),
        "resolution": int(service.gen.resolution),
        "device_kind": jax.devices()[0].device_kind,
        "startup_s": round(startup_s, 1),
        "sequential": _pcts(seq),
        f"concurrent_x{args.clients}": _pcts(conc),
        "n_requests": len(seq) + len(conc),
        **mesh_rows,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
