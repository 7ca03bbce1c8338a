"""Benchmark the VAE-GAN augmenter pretraining loop (augment/train.py).

The reference pretrains its augmenter once per dataset before coupled-VAE
training (dist/train_agumenter.py driving mmidas/augmentation/train.py:
B=1000 over the smartseq matrix, 2 augmenter forwards + 3 discriminator
forwards + both backwards per step, per-batch python dispatch).  Here one
jitted GAN step runs inside a per-epoch ``lax.scan``
(augment/train.make_gan_step); this script measures its steady-state
device throughput at the production shape.

Usage:
    python scripts/bench_gan_train.py [--cells 20000] [--genes 5032]
        [--batch 1000] [--epochs 6] [--zinb]

Prints one JSON line: {"metric": "gan_pretrain_throughput", "value":
samples/s, "unit": "samples/s", "ms_per_step": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=20_000)
    ap.add_argument("--genes", type=int, default=5032)
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--zinb", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dvae_tpu.augment.augmenter import (AugmenterConfig,
                                            DiscriminatorConfig,
                                            init_augmenter,
                                            init_discriminator)
    from dvae_tpu.augment.train import GanState, make_gan_step

    rng = np.random.default_rng(0)
    # log1p-count-shaped synthetic data (sparse-ish, nonnegative)
    x = rng.gamma(0.3, 2.0, (args.cells, args.genes)).astype(np.float32)
    x[x < 1.0] = 0.0

    a_cfg = AugmenterConfig(input_dim=args.genes,
                            n_zim=2 if args.zinb else 1)
    d_cfg = DiscriminatorConfig(input_dim=args.genes)
    mode = "ZINB" if args.zinb else "MSE"
    a_tx, d_tx = optax.adam(1e-3), optax.adam(1e-3)

    key = jax.random.key(0)
    k_a, k_d, k_run = jax.random.split(key, 3)
    a_params, a_bn = init_augmenter(k_a, a_cfg)
    d_params, d_bn = init_discriminator(k_d, d_cfg)
    state = GanState(a_params, a_bn, d_params, d_bn,
                     a_tx.init(a_params), d_tx.init(d_params), k_run)

    from dvae_tpu.parallel.sharding import put_dataset
    x_all = put_dataset(x, jnp.float32)
    n = x.shape[0]
    steps = n // args.batch
    step_fn = make_gan_step(a_cfg, d_cfg, a_tx, d_tx, mode=mode,
                            bf16=args.bf16)

    @jax.jit
    def run_epoch(state: GanState, x_all):
        key, k_perm = jax.random.split(state.key)
        state = state._replace(key=key)
        plan = jax.random.permutation(k_perm, n)[: steps * args.batch]
        plan = plan.reshape(steps, args.batch)

        def body(st, sel):
            return step_fn(st, jnp.take(x_all, sel, axis=0))

        state, ms = jax.lax.scan(body, state, plan)
        return state, jax.tree_util.tree_map(jnp.mean, ms)

    # warm up TWICE: compile, then one post-compile execution absorbing
    # one-time costs (deferred executable load through the tunnel)
    for _ in range(2):
        state, m = run_epoch(state, x_all)
        m = jax.tree_util.tree_map(np.asarray, m)  # forces completion

    t0 = time.perf_counter()
    for _ in range(args.epochs):
        state, m = run_epoch(state, x_all)
    m = jax.tree_util.tree_map(np.asarray, m)
    dt = time.perf_counter() - t0

    ms_per_step = dt / (args.epochs * steps) * 1e3
    print(json.dumps({
        "metric": "gan_pretrain_throughput",
        "value": round(args.epochs * steps * args.batch / dt),
        "unit": "samples/s",
        "ms_per_step": round(ms_per_step, 3),
        "mode": mode,
        "final_a_loss": round(float(m.a_loss), 4),
    }))


if __name__ == "__main__":
    main()
