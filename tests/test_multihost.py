"""Multi-process (multi-host / DCN analog) smoke test: two OS processes form
one jax.distributed runtime over 4 virtual CPU devices and run the full
three-player train step shard_mapped across the global mesh.

This is the capability the reference reaches with torchrun + NCCL
(scripts/train.py:50-56 there) and never tests without a cluster; here it
runs in CI."""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port



def _run_two_process(extra_args=()):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # the child sets its own device count

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py"),
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i), *extra_args],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-4000:]}"
        assert "OK" in out, f"rank {i} produced no OK:\n{out[-2000:]}"


def test_two_process_training_smoke():
    _run_two_process()


def test_two_process_pinned_equivalence():
    """Cross-process math: a pinned-input step on the 2-process global mesh
    must produce the same parameter update as a single-device step on the
    full global batch — the DCN analog of tests/test_ddp_equivalence.py,
    verified independently by each rank inside multihost_smoke.py."""
    _run_two_process(("--pinned",))
