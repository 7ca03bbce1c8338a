"""dvae_tpu — a TPU-native framework for coupled mixture-VAE training.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
AllenInstitute/distributed-vae (MMIDAS) PyTorch+FSDP codebase: multi-arm
coupled mixture VAEs for single-cell RNA-seq, VAE-GAN augmentation,
consensus-based evaluation, category pruning, and a full sharding-strategy
matrix over `jax.sharding.Mesh` device meshes.
"""

__version__ = "0.1.0"

from dvae_tpu.config import (  # noqa: F401
    MeshConfig,
    ReparamNoise,
    ShardingStrategy,
    TrainConfig,
    VAEConfig,
)
