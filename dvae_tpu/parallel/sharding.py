"""Device-mesh construction and the FSDP sharding-strategy matrix.

Equivalent capability to the reference's distributed layer — PyTorch FSDP
with strategies {full, grad-op, no, hybrid, hybrid-zero2, ddp}
(fsdp_mnist.py:215-228), DDP (fsdp_mnist.py:407-410), DistributedSampler
batch sharding, and NCCL bootstrap (mmidas/_dist_utils.py) — re-designed for
TPU:

  * One logical ``Mesh`` with axes ``('data', 'arm', 'fsdp')`` replaces
    process-group plumbing.  There is no rendezvous code: on multi-host TPU,
    ``jax.distributed.initialize()`` + the TPU runtime do what
    MASTER_ADDR/PORT + NCCL init did (reference mmidas/_dist_utils.py:12-48).
  * Sharding strategies are **pytree sharding rules**, not module wrappers —
    the auto-wrap policy machinery (fsdp_mnist.py:239-240) has no analogue
    because XLA shards at the array level.
  * Collectives (all-gather of sharded params into the matmuls,
    reduce-scatter of grads, psum of metrics) are emitted by the XLA
    partitioner from the shardings; they ride ICI within a slice.  The
    hybrid strategies map the ``fsdp`` axis to ICI-connected devices within
    a slice and ``data`` across slices/DCN — the reference's
    HYBRID_SHARD/_HYBRID_SHARD_ZERO2 (fsdp_mnist.py:223-226).
  * The ``arm`` axis is new capability: the A structurally-identical VAE
    arms are stacked on a leading axis (models/mixvae.py) and can be sharded
    across devices — true "ensemble parallelism" the reference only probed
    at (dist/vmapping.py, dist/conv.ipynb).

Strategy → placement:

  | strategy      | params      | grads/opt state | batch                |
  |---------------|-------------|-----------------|----------------------|
  | ddp / no      | replicated  | replicated      | sharded (all axes)   |
  | full (ZeRO-3) | fsdp-sharded| fsdp-sharded    | sharded (all axes)   |
  | grad-op (Z-2) | replicated  | fsdp-sharded    | sharded (all axes)   |
  | hybrid        | fsdp-sharded (per slice), replicated across data | same | sharded |
  | hybrid-zero2  | replicated  | fsdp-sharded per slice | sharded       |

With pjit + NamedSharding the distinction between hybrid and full is purely
which devices the ``fsdp`` axis spans (ICI slice vs whole mesh): callers
control that through ``MeshConfig``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dvae_tpu.config import MeshConfig, ShardingStrategy

AXES = ("data", "arm", "fsdp")
BATCH_AXES = ("data", "fsdp")  # every device computes a distinct micro-batch


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build the logical device mesh.

    With ``cfg=None``, use all local devices on the ``data`` axis (pure DP).
    ``data × arm × fsdp`` must equal the device count.  For multi-slice
    hybrids, pass devices ordered so that the trailing ``fsdp`` axis walks
    ICI neighbors (jax's default device order does this on TPU).
    """
    if devices is None:
        devices = jax.devices()
    cfg = cfg or MeshConfig(data=len(devices))
    n = cfg.n_devices
    if n != len(devices):
        raise ValueError(
            f"mesh {cfg} needs {n} devices, got {len(devices)}")
    arr = np.asarray(devices).reshape(cfg.data, cfg.arm, cfg.fsdp)
    return Mesh(arr, AXES)


def _leaf_pspec(path_leaf_shape, mesh: Mesh, shard_fsdp: bool,
                shard_arm: bool) -> P:
    """PartitionSpec for one stacked-arm leaf of shape (A, ...).

    Rule: the leading A axis shards over ``arm`` when divisible; under an
    fsdp strategy the *largest* remaining dim divisible by the fsdp axis
    size shards over ``fsdp``.  Layers too small to shard stay replicated —
    the TPU answer to the reference's size_based(20000) auto-wrap policy
    (train.py:141-143): tiny 100×100 layers are latency-bound to shard, the
    big D×F input/output layers are what matters (SURVEY.md §7.3).
    """
    shape = path_leaf_shape
    arm_size = mesh.shape["arm"]
    fsdp_size = mesh.shape["fsdp"]
    spec = [None] * len(shape)
    if shard_arm and arm_size > 1 and shape[0] % arm_size == 0:
        spec[0] = "arm"
    if shard_fsdp and fsdp_size > 1 and len(shape) > 1:
        # pick the largest non-arm dim divisible by the fsdp axis
        cands = [(shape[i], i) for i in range(1, len(shape))
                 if shape[i] % fsdp_size == 0]
        if cands:
            _, i = max(cands)
            spec[i] = "fsdp"
    return P(*spec)


def param_shardings(params, mesh: Mesh, strategy: ShardingStrategy):
    """NamedSharding pytree for the stacked-arm parameters."""
    shard_fsdp = strategy in (ShardingStrategy.FULL_SHARD,
                              ShardingStrategy.HYBRID_SHARD)
    return jax.tree_util.tree_map(
        lambda p: NamedSharding(
            mesh, _leaf_pspec(p.shape, mesh, shard_fsdp, shard_arm=True)),
        params)


def opt_state_shardings(opt_state, mesh: Mesh,
                        strategy: ShardingStrategy,
                        offload_host: bool = False):
    """NamedSharding pytree for the optax state.

    ZeRO-2 strategies (grad-op, hybrid-zero2) shard the optimizer moments
    even when params are replicated (reference fsdp_mnist.py:219-220); ZeRO-3
    states follow the param shardings; DDP/no replicate everything.
    Moment tensors mirror param shapes, so applying the same per-leaf rule
    to the opt-state leaves yields placements consistent with the params
    by construction (no params argument needed).

    ``offload_host=True`` places the state in host memory
    (``memory_kind='pinned_host'``) — the TPU analogue of the reference's
    FSDP CPUOffload (dist/fsdp.py:276-286).  XLA streams it in/out around
    the update; use only when HBM-bound.
    """
    shard_opt = strategy in (
        ShardingStrategy.FULL_SHARD, ShardingStrategy.HYBRID_SHARD,
        ShardingStrategy.SHARD_GRAD_OP, ShardingStrategy.HYBRID_SHARD_ZERO2)

    replicated = NamedSharding(mesh, P())

    def _mem(s: NamedSharding) -> NamedSharding:
        if not offload_host:
            return s
        return NamedSharding(mesh, s.spec, memory_kind="pinned_host")

    def rule(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return _mem(replicated)
        if not shard_opt:
            return _mem(replicated)
        # moment tensors mirror param shapes; shard them with the param rule
        return _mem(NamedSharding(
            mesh, _leaf_pspec(leaf.shape, mesh, shard_fsdp=True,
                              shard_arm=True)))

    return jax.tree_util.tree_map(rule, opt_state)


def batch_sharding(mesh: Mesh, batch_axis: int = 1, ndim: int = 3,
                   arm_axis: Optional[int] = 0) -> NamedSharding:
    """Sharding for an (A, B, D) input batch: arms over ``arm``, batch over
    ``data``×``fsdp`` (every device computes a distinct micro-batch — FSDP
    and DDP semantics alike)."""
    spec = [None] * ndim
    if arm_axis is not None and mesh.shape["arm"] > 1:
        spec[arm_axis] = "arm"
    spec[batch_axis] = BATCH_AXES
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_dataset(x, dtype=None, sharding=None):
    """Commit a host dataset to device, row-major, cast on host.

    ``jnp.asarray(np_f32, bf16)`` runs the dtype convert *on device* with
    auto output layout, and on v5e XLA picks a column-major
    (major_to_minor=(1, 0)) layout for large bf16 matrices.  Every epoch-
    runner call then pays a full-dataset layout copy before the batch
    gather (~0.64 ms for 20k×5032 bf16 — measured 5.8% of the MSE step).
    Casting on host and pinning the layout commits the array directly in
    the row-major form the runner consumes.

    ``sharding=None`` → the default device.  Non-numpy inputs fall back to
    a plain device_put of the already-committed array.
    """
    if dtype is not None and isinstance(x, np.ndarray):
        x = np.asarray(x, np.dtype(dtype))  # bf16 via ml_dtypes
    elif dtype is not None:
        x = x.astype(dtype)
    try:
        from jax.experimental.layout import Format, Layout
        if sharding is None:
            sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        fmt = Format(Layout(tuple(range(np.ndim(x)))), sharding)
        return jax.device_put(x, fmt)
    except Exception:  # layout API unavailable / backend rejects layouts
        return jax.device_put(x, sharding)


def constrain(x, mesh: Optional[Mesh], *spec):
    """``with_sharding_constraint`` that no-ops without a mesh.

    Used to pin activations at the fused-kernel boundaries: the sharding
    propagator otherwise prefers feature-sharded layouts there (pressure
    from the fsdp-sharded dense weights next door), which conflicts with
    the kernels' batch-sharded specs and degenerates into
    replicate-then-repartition ("involuntary full rematerialization")
    inside the manual subgroup modules."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def bn_shardings(bn_state, mesh: Mesh):
    """Batch-norm running stats: shard over ``arm`` only (they are per-arm
    vectors; the reference never syncs them across ranks — no SyncBatchNorm
    anywhere in the repo — and our batch-axis mean/var *is* global within
    the jitted step, which is strictly more correct)."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(
            mesh, _leaf_pspec(s.shape, mesh, shard_fsdp=False,
                              shard_arm=True)),
        bn_state)


def strategy_shardings(strategy: ShardingStrategy, mesh: Mesh, params,
                       bn_state, opt_state):
    """One-call bundle: (param_sh, bn_sh, opt_sh) for a strategy."""
    return (param_shardings(params, mesh, strategy),
            bn_shardings(bn_state, mesh),
            opt_state_shardings(opt_state, mesh, strategy))
