"""object_intrinsics_tpu — a TPU-native JAX framework for learning generative
models of object intrinsics from a single image of multiple object instances.

Re-designed from scratch for TPU (jit / shard_map / profiler-driven XLA
tuning) with the same capabilities as the PyTorch/CUDA reference "Seeing a
Rose in Five Thousand Ways" (zzyunzhi/object-intrinsics): a
latent-conditioned neural-SDF + albedo field, a learnable directional light
with Phong specular, a pose-distribution prior, a NeuS volume renderer, and
an adversarial (ADA-augmented) trainer.

Layout:
  utils/     config system, pose math, pose samplers, checkpointing, logging
  ops/       TPU compute primitives: FiLM-SIREN stacks, NeuS renderer,
             upfirdn2d, grid_sample, sample_pdf
  models/    generator, fields, lighting, camera, discriminator, ADA augment
  loss/      GAN losses, R1, pose-regression aux loss
  trainers/  three-player adversarial train step + loops
  parallel/  device-mesh data parallelism (shard_map + psum)
  data/      multi-instance RGBA dataset
"""
import os as _os

__version__ = "0.1.0"

# DEBUG=1 semantics are package-wide (every entry point documents them):
# NaN checking + the fast_sin phase guard. The guard's axon-backend fallback
# NaN-poisons out-of-range phases, so debug_nans must be on for it to be
# loud from ANY entry point (scripts/test.py, bench.py), not just train.py.
if _os.environ.get("DEBUG") == "1":
    import jax as _jax

    _jax.config.update("jax_debug_nans", True)

from . import _registry  # noqa: E402,F401  (populates the __target__ registry)
