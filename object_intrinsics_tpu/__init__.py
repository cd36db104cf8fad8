"""object_intrinsics_tpu — a TPU-native JAX framework for learning generative
models of object intrinsics from a single image of multiple object instances.

Re-designed from scratch for TPU (jit / shard_map / Pallas) with the same
capabilities as the PyTorch/CUDA reference "Seeing a Rose in Five Thousand
Ways" (zzyunzhi/object-intrinsics): a latent-conditioned neural-SDF + albedo
field, a learnable directional light with Phong specular, a pose-distribution
prior, a NeuS volume renderer, and an adversarial (ADA-augmented) trainer.

Layout:
  utils/     config system, pose math, pose samplers, checkpointing, logging
  ops/       TPU compute primitives: FiLM-SIREN stacks, NeuS renderer,
             upfirdn2d, grid_sample, sample_pdf (+ Pallas fused kernels)
  models/    generator, fields, lighting, camera, discriminator, ADA augment
  loss/      GAN losses, R1, pose-regression aux loss
  trainers/  three-player adversarial train step + loops
  parallel/  device-mesh data parallelism (shard_map + psum)
  data/      multi-instance RGBA dataset
"""

__version__ = "0.1.0"

from . import _registry  # noqa: E402,F401  (populates the __target__ registry)
