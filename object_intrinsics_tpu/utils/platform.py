"""Backend-selection helper for CLI entry points.

The axon environment's sitecustomize force-selects ``jax_platforms="axon,cpu"``
and IGNORES the ``JAX_PLATFORMS`` env var, so a user asking for an off-chip
run (``JAX_PLATFORMS=cpu python scripts/test.py ...``) silently lands on the
TPU tunnel — and contends with whatever training job owns it. Every CLI
calls :func:`honor_jax_platforms` right after ``import jax`` (before first
device use) to re-apply the env var the way stock JAX would have.
"""
import os


def honor_jax_platforms() -> None:
    """Re-apply ``JAX_PLATFORMS`` over the sitecustomize's forced choice.

    Must run before the backend initializes (first device/array use);
    a no-op when the env var is unset or jax is already configured to it.

    Footgun: the container EXPORTS ``JAX_PLATFORMS=axon`` ambiently, so in a
    process that counter-overrode the config directly (the test suite's
    conftest forces cpu), calling this re-applies *axon* and flips the
    process back onto the tunnel. Such processes must scrub the env var
    itself (``os.environ["JAX_PLATFORMS"] = "cpu"``, as tests/conftest.py
    does), not just update the config.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
