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

_LAZY = {
    "CplMixVAE": ("dvae_tpu.train.cpl_mixvae", "CplMixVAE"),
    "mixvae_loss": ("dvae_tpu.models.losses", "mixvae_loss"),
    "LossOutputs": ("dvae_tpu.models.losses", "LossOutputs"),
    "MixVAEOutputs": ("dvae_tpu.models.mixvae", "MixVAEOutputs"),
    "apply": ("dvae_tpu.models.mixvae", "apply"),
    "init_params": ("dvae_tpu.models.mixvae", "init_params"),
    "init_bn_state": ("dvae_tpu.models.mixvae", "init_bn_state"),
    "generate": ("dvae_tpu.models.api", "generate"),
    "load_vae": ("dvae_tpu.models.api", "load_vae"),
}


def __getattr__(name):  # lazy imports keep `import dvae_tpu` light
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
