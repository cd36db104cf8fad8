from setuptools import find_packages, setup

setup(
    name="object_intrinsics_tpu",
    version="0.1.0",
    description="TPU-native framework for generative models of object intrinsics",
    packages=find_packages(include=["object_intrinsics_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax>=0.9", "numpy", "pyyaml", "scipy", "optax", "einops", "pillow"],
)
