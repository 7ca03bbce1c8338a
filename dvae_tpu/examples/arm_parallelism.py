"""Arm-parallelism study: python loop vs vmapped stacked arms vs arm-sharded.

Equivalent capability to the reference's parallelization probes —
``dist/vmapping.py`` (batch-vs-vmap-vs-loop torch benchmark) and
``dist/conv.ipynb`` (grouped-conv arm fusion) — answering the question they
were asking: how much does fusing the A structurally-identical arms into one
batched computation buy?  Here the three strategies are:

  1. ``loop``:   python loop over per-arm parameter slices (what the
                 reference's forward does every batch, nn_model.py:329);
  2. ``vmap``:   one vmapped forward over stacked params (this framework's
                 design);
  3. ``sharded``: the vmapped forward with the arm axis sharded over a mesh.

Run ``python -m dvae_tpu.examples.arm_parallelism`` to print the table.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.config import MeshConfig, VAEConfig
from dvae_tpu.models import mixvae
from dvae_tpu.models.losses import mixvae_loss


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def benchmark_arm_strategies(cfg: Optional[VAEConfig] = None,
                             batch_size: int = 1024, n_iters: int = 20,
                             shard: bool = False) -> dict:
    cfg = cfg or VAEConfig(n_arm=5, input_dim=1024, n_categories=32,
                           fc_dim=64, lowD_dim=16, tau=0.1)
    key = jax.random.key(0)
    params = mixvae.init_params(key, cfg)
    bn = mixvae.init_bn_state(cfg)
    x = jax.random.uniform(jax.random.key(1), (batch_size, cfg.input_dim))
    xs = jnp.broadcast_to(x, (cfg.n_arm,) + x.shape)

    # --- strategy 1: python loop over arms (the reference's pattern) ---
    cfg1 = cfg.replace(n_arm=1)

    @jax.jit
    def loop_fwd(params, bn, xs, key):
        total = 0.0
        for a in range(cfg.n_arm):  # unrolled python loop, A separate graphs
            p1 = jax.tree_util.tree_map(lambda l: l[a:a + 1], params)
            b1 = jax.tree_util.tree_map(lambda l: l[a:a + 1], bn)
            outs, _ = mixvae.apply(p1, b1, cfg1, xs[a:a + 1], key)
            total += mixvae_loss(cfg1, outs, xs[a:a + 1]).total
        return total

    # --- strategy 2: vmapped stacked arms ---
    @jax.jit
    def vmap_fwd(params, bn, xs, key):
        outs, _ = mixvae.apply(params, bn, cfg, xs, key)
        return mixvae_loss(cfg, outs, xs).total

    def timeit(fn):
        r = fn(params, bn, xs, key)
        _sync(r)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            r = fn(params, bn, xs, key)
        _sync(r)
        return (time.perf_counter() - t0) / n_iters * 1e3

    results = {"loop_ms": timeit(loop_fwd), "vmap_ms": timeit(vmap_fwd)}

    if shard and len(jax.devices()) >= cfg.n_arm:
        from dvae_tpu.parallel.sharding import make_mesh, param_shardings
        from dvae_tpu.config import ShardingStrategy
        mesh = make_mesh(MeshConfig(arm=cfg.n_arm),
                         devices=jax.devices()[:cfg.n_arm])
        shs = param_shardings(params, mesh, ShardingStrategy.DDP)
        params_s = jax.device_put(params, shs)
        results["sharded_ms"] = timeit(
            lambda p, b, x, k: vmap_fwd(params_s, b, x, k))
    results["speedup_vmap_over_loop"] = results["loop_ms"] / results["vmap_ms"]
    return results


if __name__ == "__main__":
    res = benchmark_arm_strategies()
    for k, v in res.items():
        print(f"{k}: {v:.3f}")
