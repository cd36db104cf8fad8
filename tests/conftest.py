"""Force tests onto a virtual 8-device CPU mesh (no TPU needed in CI).

The container's sitecustomize registers the `axon` TPU-tunnel PJRT plugin and
force-sets ``jax_platforms="axon,cpu"`` (overriding the JAX_PLATFORMS env
var), so we must counter-override through jax.config *after* importing jax.
XLA_FLAGS must still be set before the CPU backend initializes.
"""
import os

# CLI-smoke tests exec scripts/train.py; don't spawn TensorBoard servers in CI.
os.environ.setdefault("OI_TB", "0")

# The container EXPORTS JAX_PLATFORMS=axon ambiently. Any test that imports a
# CLI entry point re-applies that env var through honor_jax_platforms() —
# which would flip the whole suite from the conftest's CPU mesh back onto the
# TPU tunnel mid-run (observed: the phase-guard test taking the axon NaN
# branch after test_eval_chunking exec'd scripts/test.py). Scrub the env var
# itself so both in-process honor() calls and subprocess CLI smokes see cpu.
os.environ["JAX_PLATFORMS"] = "cpu"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()} devices: {jax.device_count()}"
