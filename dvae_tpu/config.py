"""Configuration trees for the TPU-native coupled-mixture-VAE framework.

One dataclass config tree replaces the reference's per-entry-point argparse
duplication (reference: train.py:172-267, dist/train_smartseq.py:530-572) and
mirrors the hyperparameter set of ``VAEConfig`` (reference: mmidas/nn_model.py:14-36).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from enum import Enum
from typing import Optional


class ShardingStrategy(str, Enum):
    """Parity with the reference FSDP sharding-strategy matrix.

    Reference: fsdp_mnist.py:215-228 maps the CLI strings
    {full, grad-op, no, hybrid, hybrid-zero2, ddp} onto torch FSDP strategies.
    On TPU these become sharding rules over a ``jax.sharding.Mesh`` — see
    dvae_tpu/parallel/sharding.py for the exact mapping.
    """

    FULL_SHARD = "full"            # ZeRO-3: params + grads + opt state sharded
    SHARD_GRAD_OP = "grad-op"      # ZeRO-2: grads + opt state sharded, params replicated
    NO_SHARD = "no"                # pure data parallel (FSDP NO_SHARD)
    HYBRID_SHARD = "hybrid"        # shard within ICI slice, replicate across slices
    HYBRID_SHARD_ZERO2 = "hybrid-zero2"
    DDP = "ddp"                    # plain DDP: replicate everything, shard batch


class ReparamNoise(str, Enum):
    """Noise distribution for the state-variable reparameterization.

    The reference draws *uniform* noise in ``reparameterize``
    (mmidas/nn_model.py:427 uses ``torch.rand_like``) while its augmenter uses
    Gaussian (mmidas/augmentation/aug_utils.py:64).  We default to Gaussian
    (the statistically-correct VAE) and keep ``UNIFORM`` as a bit-faithful
    compatibility flag.
    """

    GAUSSIAN = "gaussian"
    UNIFORM = "uniform"


@dataclass(frozen=True)
class VAEConfig:
    """Hyperparameters of the multi-arm mixVAE.

    Field names and defaults mirror the reference ``VAEConfig``
    (mmidas/nn_model.py:14-36) so that a reference user can carry their
    config over unchanged.
    """

    n_categories: int = 92          # C: number of latent categories (cell types)
    state_dim: int = 2              # S: continuous state dimension
    input_dim: int = 5032           # D: number of genes
    fc_dim: int = 100               # F: hidden width
    lowD_dim: int = 10              # L: latent representation width
    x_drop: float = 0.5             # input dropout probability
    s_drop: float = 0.2             # state dropout probability
    lr: float = 0.001
    lam: float = 1.0                # coupling factor
    lam_pc: float = 1.0             # coupling factor for the reference prior
    n_arm: int = 2                  # A: number of arms
    temp: float = 1.0               # Gumbel-softmax temperature
    tau: float = 0.005              # softmax sharpening temperature
    beta: float = 1.0               # KL regularizer
    hard: bool = False              # straight-through Gumbel-softmax
    variational: bool = True
    ref_prior: bool = False
    trained_model: Optional[str] = None
    n_pr: int = 0                   # number of pruned categories at init
    momentum: float = 0.01          # batch-norm running-stats momentum
    mode: str = "MSE"               # reconstruction loss: "MSE" or "ZINB"
    eps: float = 1e-8               # numerical-stability constant
    # --- TPU-build extensions (not present in the reference) ---
    reparam_noise: ReparamNoise = ReparamNoise.GAUSSIAN
    dtype: str = "float32"          # compute dtype for activations
    use_pallas: bool = False        # fused gumbel-softmax sampling kernel
                                    # AND the fused coupling-distance
                                    # kernel — both measured SLOWER than
                                    # XLA at the production shape: the
                                    # bundle 3.14 vs 2.66 ms/step (v5e-1
                                    # 2026-08-17); the coupling kernel
                                    # ALONE 0.77x fwd / 0.98x grad vs the
                                    # XLA Gram path at (5,5000,92) f32
                                    # (scripts/bench_coupling.py, v5e-1
                                    # 2026-08-20).  Keep off; kernels stay
                                    # oracle-tested for the day shapes
                                    # change (much larger C would revisit)
    recon_bce_metric: bool = True   # include the zero-gradient binarized-BCE
                                    # term in the recon loss VALUE (reference
                                    # nn_model.py:544-545); costs ~14% step
                                    # time at production shape when on
    fused_recon: bool = False       # MSE mode only: fuse decoder output layer
                                    # + ReLU + recon loss (and its backward)
                                    # into one Pallas kernel — the (A, B, D)
                                    # reconstruction never touches HBM (see
                                    # ops/recon_pallas.py); the binarized-BCE
                                    # metric term becomes free when on
    fused_encoder: bool = False     # fuse input dropout + fc1 into one Pallas
                                    # kernel with on-chip PRNG — the dropped
                                    # (A, B, D) input views never touch HBM
                                    # (ops/encoder_pallas.py); different
                                    # dropout bitstream, same distribution
    fused_decoder: bool = False     # MSE mode only: extend the fused recon
                                    # kernel upward through the whole decoder
                                    # trunk fc6..fc10 — the (A, B, F) trunk
                                    # activations stay in VMEM, forward AND
                                    # backward (ops/decoder_pallas.py);
                                    # single-device / arm-sharded meshes only
                                    # (batch-sharded SPMD falls back to
                                    # fused_recon).  OPT-IN, off even on TPU:
                                    # at the production shape (F=100) it
                                    # measured 3.62 vs 2.60 ms/step — the
                                    # 100-wide trunk matmuls are too small to
                                    # beat XLA's own fusions and the resident
                                    # all-arm weight/accumulator blocks choke
                                    # the kernel pipeline.  May win at much
                                    # larger fc_dim; benchmark before use.
    bn_groups: int = 1              # ghost-batch-norm group count: train-mode
                                    # BN statistics computed per contiguous
                                    # row-block of the batch.  Set to the
                                    # data-parallel device count (the
                                    # trainer's local_bn_stats flag) to
                                    # reproduce the reference's NEVER-synced
                                    # per-rank DDP BatchNorm statistics
                                    # (mmidas/nn_model.py:208-255 under
                                    # train.py:141-143 DDP wrapping) for
                                    # bit-faithful multi-device loss-curve
                                    # comparison.  1 = global (SyncBatchNorm-
                                    # style) statistics, the default and the
                                    # statistically cleaner choice (see
                                    # models/mixvae._batch_norm).

    def replace(self, **kw) -> "VAEConfig":
        return dataclasses.replace(self, **kw)

    @property
    def n_pairs(self) -> int:
        """Number of distinct arm pairs; min 1 to match ``arm_combs``
        (reference: mmidas/nn_model.py:47-50)."""
        return max(self.n_arm * (self.n_arm - 1) // 2, 1)


@dataclass(frozen=True)
class MeshConfig:
    """Logical device-mesh shape.

    Axes:
      * ``data``: batch-axis data parallelism (reference DDP / DistributedSampler)
      * ``arm``:  arm parallelism — the A structurally-identical VAEs are free
        parallelism (the reference runs them in a sequential python loop,
        mmidas/nn_model.py:329, and was probing toward batching them in
        dist/vmapping.py and dist/conv.ipynb)
      * ``fsdp``: parameter sharding (ZeRO-style, reference fsdp_mnist.py:215-228)

    ``data × arm × fsdp`` must equal the total device count.  A hybrid
    (multi-slice) layout maps ``fsdp`` to ICI-connected devices and ``data``
    across slices/DCN (reference HYBRID_SHARD, fsdp_mnist.py:223-226).
    """

    data: int = 1
    arm: int = 1
    fsdp: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.arm * self.fsdp


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration (reference: train.py:172-267 defaults)."""

    n_epoch: int = 50000
    n_epoch_p: int = 0              # pruning-phase epochs
    batch_size: int = 5000
    min_con: float = 0.99           # pruning consensus threshold
    max_prun_it: int = 0
    good_enuf_consensus: float = 0.75  # early-stop (reference cpl_mixvae.py:336)
    seed: int = 546                    # reference train.py:27
    optimizer: str = "adam"            # "adam" | "adamw"
    # TPU-build extensions:
    epochs_per_jit: int = 10        # epochs fused into one on-device lax.scan
    eval_every: int = 10            # host-side val/consensus cadence (epochs)
    ckpt_every: int = 10            # checkpoint cadence (reference cpl_mixvae.py:777)
    sharding: ShardingStrategy = ShardingStrategy.NO_SHARD
    mesh: MeshConfig = field(default_factory=MeshConfig)
    bf16: bool = False              # bfloat16 activations/params compute
    aug_noise: float = 0.1          # augmenter noise scale (reference cpl_mixvae.py:423)
    rng_impl: str = "threefry2x32"  # "rbg" uses the TPU hardware RNG for all
                                    # dropout/gumbel/reparam draws (faster,
                                    # different bitstream, same distributions)
    halt_on_nan: bool = True        # stop a phase when the epoch loss goes
                                    # non-finite (Adam never recovers from
                                    # NaN; the checkpoint trail preserves
                                    # the last good state for debugging).
                                    # False = reference behavior: keep
                                    # stepping on NaN.
    stream: bool = False            # host→device streaming batches instead
                                    # of committing the dataset to HBM —
                                    # for datasets larger than device
                                    # memory (data/stream.py; the
                                    # reference's DataLoader-per-batch
                                    # semantics, dataloader.py:123-132)
    align_arms_every: int = 0       # cadence (epochs) of Hungarian cross-arm
                                    # category alignment (train/alignment.py):
                                    # permutes each arm's category-indexed
                                    # params (+ Adam moments) to match arm 0's
                                    # labeling — per-arm loss-neutral, collapses
                                    # the index-search part of consensus
                                    # convergence that SGD does glacially.
                                    # 0 = off (reference semantics); ignored
                                    # under ref_prior or a pruned mask.
    shuffle_block: int = 1          # epoch-shuffle granularity in rows: 1 =
                                    # exact per-row reshuffle every epoch
                                    # (reference DataLoader semantics); >1
                                    # permutes blocks of rows — the batch
                                    # gather moves large contiguous slices
                                    # at HBM bandwidth instead of single
                                    # rows (rows within a block co-travel)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
