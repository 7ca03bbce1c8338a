"""FSDP-on-TPU tutorial: shard a classifier over a device mesh.

Equivalent capability to the reference's flagship pedagogical artifact
(``fsdp_tutorial.py``: ShallowNet/DeepNet :25-81, distributed setup
:100-105, train/test with loss/accuracy all_reduce :116-174, FSDP wrap +
epoch loop :177-254) and the systematic benchmark harness
(``fsdp_mnist.py``: Net ≈1.2M / DeepNet ≈93M params :94-170, sharding
matrix :215-228, mixed precision :231-236, timing :401-452, run-artifact
dump :477-495) — re-taught TPU-first:

  * No process groups, no rendezvous, no wrapping: a ``Mesh`` + param
    ``NamedSharding``s replace ``mp.spawn`` + NCCL + ``FSDP(...)``.
  * The metric all_reduce is implicit: global batch mean under pjit IS the
    cross-device reduction.
  * Mixed precision = a compute-dtype cast (params stay fp32 master).

Runs on anything: real TPU slice, single chip, or the 8-device CPU mesh.
MNIST images are synthesized when no dataset file is available (this
environment has no egress); pass ``data=(x, y)`` arrays to use real MNIST.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dvae_tpu.config import ShardingStrategy


# ---------------------------------------------------------------------------
# Models (reference fsdp_tutorial.py:25-81, fsdp_mnist.py:94-170)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MLPConfig:
    """ShallowNet ≈1.2M params (widths [128, 128]); DeepNet ≈93M
    (widths [4096]*5) — matching the reference benchmark scales."""

    input_dim: int = 784
    n_classes: int = 10
    widths: tuple = (128, 128)

    @staticmethod
    def shallow() -> "MLPConfig":
        return MLPConfig(widths=(1024, 128))           # ≈0.95M params

    @staticmethod
    def deep() -> "MLPConfig":
        # 6×4096 hidden ≈ 87M params (reference DeepNet ≈93M)
        return MLPConfig(widths=(4096,) * 6)


def init_mlp(key: jax.Array, cfg: MLPConfig, dtype=jnp.float32):
    dims = (cfg.input_dim,) + cfg.widths + (cfg.n_classes,)
    params = []
    keys = jax.random.split(key, len(dims) - 1)
    for k, fi, fo in zip(keys, dims[:-1], dims[1:]):
        bound = 1.0 / np.sqrt(fi)
        kw, kb = jax.random.split(k)
        params.append({
            "w": jax.random.uniform(kw, (fi, fo), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (fo,), dtype, -bound, bound)})
    return params


def apply_mlp(params, x, compute_dtype=None):
    h = x.reshape(x.shape[0], -1)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype), params)
    for layer in params[:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    logits = h @ params[-1]["w"] + params[-1]["b"]
    return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Sharding (the tutorial's core lesson)
# ---------------------------------------------------------------------------

def make_mesh_1d(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), ("dp",))


def mlp_shardings(params, mesh: Mesh, strategy: ShardingStrategy):
    """FULL_SHARD/HYBRID shard each weight's largest divisible dim over the
    mesh; DDP/NO_SHARD replicate (the ZeRO-2 flavors shard only opt state,
    handled by the caller)."""
    shard = strategy in (ShardingStrategy.FULL_SHARD,
                         ShardingStrategy.HYBRID_SHARD)
    n = mesh.devices.size

    def rule(p):
        if shard and p.ndim == 2:
            if p.shape[1] % n == 0:
                return NamedSharding(mesh, P(None, "dp"))
            if p.shape[0] % n == 0:
                return NamedSharding(mesh, P("dp", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------

def synthetic_mnist(n: int = 60_000, seed: int = 0, proto_seed: int = 1234):
    """Class-conditional blobs with MNIST's shape (N, 784) / labels 0-9.

    The class prototypes come from ``proto_seed`` (fixed) so different
    ``seed`` values give train/test splits of the SAME distribution."""
    protos = np.random.default_rng(proto_seed).random((10, 784))
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 10, n)
    x = protos[y] + 0.3 * rng.normal(0, 1, (n, 784))
    return x.astype(np.float32), y.astype(np.int32)


# ---------------------------------------------------------------------------
# Train / eval
# ---------------------------------------------------------------------------

class RunResult(NamedTuple):
    """The run-artifact dict of the reference benchmark
    (fsdp_mnist.py:477-495), structured."""

    strategy: str
    precision: str
    n_devices: int
    n_params: int
    epoch_times_s: list
    train_losses: list
    test_accs: list


def train_mnist_fsdp(model: str = "shallow",
                     strategy: ShardingStrategy = ShardingStrategy.FULL_SHARD,
                     n_epochs: int = 2, batch_size: int = 512,
                     lr: float = 1e-3, precision: str = "fp32",
                     n_devices: Optional[int] = None,
                     data=None, test_data=None, seed: int = 0,
                     verbose: bool = True) -> RunResult:
    """The whole tutorial in one function; returns the benchmark artifact."""
    strategy = ShardingStrategy(strategy)
    mesh = make_mesh_1d(n_devices)
    cfg = MLPConfig.shallow() if model == "shallow" else MLPConfig.deep()
    compute_dtype = {"fp32": None, "bf16": jnp.bfloat16,
                     "fp16": jnp.float16}[precision]

    x, y = data if data is not None else synthetic_mnist(8192, seed)
    xt, yt = test_data if test_data is not None else synthetic_mnist(2048,
                                                                     seed + 1)

    params = init_mlp(jax.random.key(seed), cfg)
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    p_sh = mlp_shardings(params, mesh, strategy)
    shard_opt = strategy in (
        ShardingStrategy.FULL_SHARD, ShardingStrategy.HYBRID_SHARD,
        ShardingStrategy.SHARD_GRAD_OP, ShardingStrategy.HYBRID_SHARD_ZERO2)
    n = mesh.devices.size
    replicated = NamedSharding(mesh, P())

    def opt_rule(leaf):
        """Shard optimizer moments like ZeRO-2/3; replicate otherwise."""
        if not (shard_opt and hasattr(leaf, "ndim") and leaf.ndim == 2):
            return replicated
        if leaf.shape[1] % n == 0:
            return NamedSharding(mesh, P(None, "dp"))
        if leaf.shape[0] % n == 0:
            return NamedSharding(mesh, P("dp", None))
        return replicated

    o_sh = jax.tree_util.tree_map(opt_rule, opt_state)
    params = jax.device_put(params, p_sh)
    opt_state = jax.device_put(opt_state, o_sh)
    batch_sh = NamedSharding(mesh, P("dp"))

    def loss_fn(params, xb, yb):
        logits = apply_mlp(params, xb, compute_dtype)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()
        return loss

    @jax.jit
    def train_step(params, opt_state, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
        grads = jax.tree_util.tree_map(lambda g, p: g.astype(p.dtype),
                                       grads, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def test_step(params, xb, yb):
        logits = apply_mlp(params, xb, compute_dtype)
        return jnp.mean((jnp.argmax(logits, -1) == yb).astype(jnp.float32))

    n = x.shape[0]
    steps = n // batch_size
    rng = np.random.default_rng(seed)
    epoch_times, losses, accs = [], [], []
    for e in range(n_epochs):
        order = rng.permutation(n)[: steps * batch_size]
        t0 = time.perf_counter()
        step_losses = []
        for i in range(steps):
            sel = order[i * batch_size: (i + 1) * batch_size]
            # device_put the numpy slice directly (an intermediate
            # jnp.asarray would commit to the default device first), and
            # keep the loss ON DEVICE until after the clock stops — a
            # float() here blocks every step on a host round trip and the
            # tunnel RTT would dominate the very number the sweep compares
            xb = jax.device_put(x[sel], batch_sh)
            yb = jax.device_put(y[sel], batch_sh)
            params, opt_state, loss = train_step(params, opt_state, xb, yb)
            step_losses.append(loss)
        np.asarray(step_losses[-1])   # tunnel-safe sync: block_until_ready
                                      # does not block through the axon
                                      # TPU tunnel (CLAUDE.md)
        epoch_times.append(time.perf_counter() - t0)
        losses.append(float(np.mean([float(l) for l in step_losses])))
        acc = float(test_step(params,
                              jax.device_put(jnp.asarray(xt), batch_sh),
                              jax.device_put(jnp.asarray(yt), batch_sh)))
        accs.append(acc)
        if verbose:
            print(f"epoch {e}: loss={losses[-1]:.4f} acc={acc:.4f} "
                  f"({epoch_times[-1]:.2f}s)")

    return RunResult(strategy.value, precision, mesh.devices.size, n_params,
                     epoch_times, losses, accs)
