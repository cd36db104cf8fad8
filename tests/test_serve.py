"""Serving endpoint (scripts/serve.py): load a run once, answer renders.

Drives the real HTTP stack end-to-end on an ephemeral port: health check,
default render, pinned-latent/pose render, map selection, malformed-request
error path, and determinism across identical requests.
"""
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from __graft_entry__ import _build_trainer, _disc_cfg, _generator_cfg

    run_dir = tmp_path_factory.mktemp("serve_run")
    trainer = _build_trainer(mesh=None, resolution=16)
    # inference_setup treats it==0 as "not trained"; bump without stepping
    trainer.state["it"] = jnp.asarray(5, dtype=jnp.int32)
    (run_dir / "checkpoints").mkdir()
    trainer.checkpoint_io.checkpoint_dir = str(run_dir / "checkpoints")
    trainer.save_checkpoint(blocking=True, epoch=0)
    cfg = {"model": {
        "generator": _generator_cfg(resolution=16, n_samples=4, n_importance=2),
        "discriminator": _disc_cfg(16, 3, 7, view=True),
        "mask_discriminator": _disc_cfg(16, 1, 1),
    }}
    with open(run_dir / "cfg.json", "w") as f:
        json.dump(cfg, f)

    from scripts.serve import create_server

    srv, service = create_server(str(run_dir), port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", service
    srv.shutdown()


def _post(url, body):
    req = urllib.request.Request(
        url + "/render", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_health(server):
    url, service = server
    with urllib.request.urlopen(url + "/health", timeout=30) as r:
        info = json.loads(r.read())
    assert info == {"it": 5, "resolution": 16, "z_dim": 64, "ema": None}


def test_render_default_and_maps(server):
    url, _ = server
    for map_name in ("image", "normal", "shading"):
        status, ctype, body = _post(url, {"map": map_name, "seed": 3})
        assert status == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_render_pinned_inputs_deterministic(server):
    url, service = server
    z = np.linspace(-1, 1, 64).tolist()
    b2w = np.eye(4).tolist()
    body = {"z": z, "b2w": b2w, "seed": 11}
    _, _, png1 = _post(url, body)
    _, _, png2 = _post(url, body)
    assert png1 == png2  # same request -> same bytes (resident executable)
    # pinned inputs actually take effect: a different z changes the image
    body2 = {"z": (np.asarray(z) * -1).tolist(), "b2w": b2w, "seed": 11}
    _, _, png3 = _post(url, body2)
    assert png3 != png1


def test_mesh_endpoint(server):
    url, _ = server
    import re
    import urllib.error

    req = urllib.request.Request(
        url + "/mesh",
        data=json.dumps({"seed": 0, "resolution": 33}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.status == 200
        assert r.headers.get("Content-Type") == "application/octet-stream"
        assert 'filename="mesh.ply"' in r.headers.get("Content-Disposition", "")
        raw = r.read()
    header, _, body = raw.partition(b"end_header\n")
    assert raw.startswith(b"ply\nformat binary_little_endian 1.0\n")
    nv = int(re.search(rb"element vertex (\d+)", header).group(1))
    nf = int(re.search(rb"element face (\d+)", header).group(1))
    if nv:  # the 5-it fixture model may or may not cross zero in the box
        assert b"property uchar red" in header and b"property float nx" in header
        assert len(body) == nv * 27 + nf * 13
        frec = np.frombuffer(
            body[nv * 27 :], dtype=np.dtype([("k", "u1"), ("idx", "<i4", 3)])
        )
        assert (frec["k"] == 3).all() and frec["idx"].max() < nv
    # identical request -> identical bytes (resident executable, pinned seed)
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.read() == raw


def test_render_bad_request(server):
    url, _ = server
    status, ctype, body = _post(url, {"z": [1.0, 2.0]})  # wrong z length
    assert status == 400 and ctype == "application/json"
    assert "error" in json.loads(body)


@pytest.fixture(scope="module")
def batched_server(tmp_path_factory):
    """Same tiny run served with request-coalescing buckets 1,2,4."""
    from __graft_entry__ import _build_trainer, _disc_cfg, _generator_cfg

    run_dir = tmp_path_factory.mktemp("serve_run_batched")
    trainer = _build_trainer(mesh=None, resolution=16)
    trainer.state["it"] = jnp.asarray(5, dtype=jnp.int32)
    (run_dir / "checkpoints").mkdir()
    trainer.checkpoint_io.checkpoint_dir = str(run_dir / "checkpoints")
    trainer.save_checkpoint(blocking=True, epoch=0)
    cfg = {"model": {
        "generator": _generator_cfg(resolution=16, n_samples=4, n_importance=2),
        "discriminator": _disc_cfg(16, 3, 7, view=True),
        "mask_discriminator": _disc_cfg(16, 1, 1),
    }}
    with open(run_dir / "cfg.json", "w") as f:
        json.dump(cfg, f)

    from scripts.serve import create_server

    srv, service = create_server(str(run_dir), port=0, batch_sizes=(1, 2, 4))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", service
    srv.shutdown()


def test_batched_concurrent_requests(batched_server):
    """8 concurrent distinct requests through the coalescing worker: all
    succeed, each response is the request's own latent (distinct z ->
    distinct PNGs), and identical requests stay deterministic."""
    url, service = batched_server
    assert service.buckets == [1, 2, 4]
    results = {}

    def client(i):
        z = (np.linspace(-1, 1, 64) * (0.2 + 0.1 * i)).tolist()
        body = {"z": z, "b2w": np.eye(4).tolist()}
        results[i] = _post(url, body)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 8
    pngs = []
    for i, (status, ctype, body) in sorted(results.items()):
        assert status == 200 and ctype == "image/png", (i, status)
        pngs.append(body)
    assert len({p for p in pngs}) == 8  # distinct latents -> distinct images
    # sequential repeat of one request reproduces its bytes (bucket 1)
    z0 = (np.linspace(-1, 1, 64) * 0.2).tolist()
    body = {"z": z0, "b2w": np.eye(4).tolist()}
    _, _, a = _post(url, body)
    _, _, b = _post(url, body)
    assert a == b


def test_batched_seed_matches_unbatched(server, batched_server):
    """A seed-only request renders the same image whether the service
    batches or not: the host presample uses the generator's own key
    splits."""
    url1, _ = server
    url2, _ = batched_server
    _, _, png1 = _post(url1, {"seed": 77})
    _, _, png2 = _post(url2, {"seed": 77})
    assert png1 == png2


def test_unknown_path(server):
    url, _ = server
    req = urllib.request.Request(url + "/nope", data=b"{}")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
