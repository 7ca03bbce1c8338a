"""Headline benchmark: A=5 Smart-seq-shape coupled-mixVAE training throughput.

Measures steady-state training throughput (cells/sec/chip) of the flagship
configuration — the reference's production run shape (A=5, B=5000, D=5032,
C=92; train-scripts/run-train-A5-E500000-a100.sh, reference train.py
defaults) — on whatever chip jax.devices()[0] is.

``vs_baseline`` compares against an estimated reference throughput of
25,000 cells/sec on one A100: the reference publishes no benchmark tables
(BASELINE.md), so this anchor is derived from its compute profile — A=5
arms ≈ 50M params (dist/fsdp.py:672-675), 6·params·batch ≈ 1.5 TFLOP/step
at B=5000, fp32 + python per-arm loop + per-batch host syncs on A100 ≈
200 ms/step → 25k cells/s.  Driver target (BASELINE.json): ≥5× per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Roofline status (v5e, measured 2026-08): the unfused step moves 5.73 GB
of HBM traffic (XLA cost analysis) → 7.0 ms bandwidth roofline at
819 GB/s; measured 6.5 ms/step (770k cells/s/chip) — AT the roofline.
The fused recon-loss kernel (ops/recon_pallas.py) removes the (A, B, D)
reconstruction and its cotangent from HBM (~1.4 GB/step) and makes the
binarized-BCE metric term free; the fused dropout+fc1 kernel
(ops/encoder_pallas.py) removes the dropped (A, B, D) input views
(~750 MB/step, mask regenerated on-chip in the backward).  With
edge-tile-specialized epilogues (the VPU, not the MXU, bounds these
kernels) and the block-granular epoch shuffle (shuffle_block=8 turns
the 50 MB random-row batch gather into contiguous-slice copies) the
step runs at 3.1 ms (1.63M cells/s/chip, 65x the reference estimate).
The four kernels sit at their combined MXU+VPU roofline; the remaining
non-kernel time is the f32 adam update (~0.15 ms) and ~0.5 ms of small
(A,B,F)/(A,B,C) fusions (BN, gumbel, coupling).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CELLS_PER_SEC = 25_000.0  # estimated reference A100 throughput


def main() -> None:
    from dvae_tpu.config import TrainConfig, VAEConfig
    from dvae_tpu.train.step import (init_train_state, make_epoch_runner,
                                     make_optimizer)

    # production defaults (C=92, D=5032, F=100) + the fused recon-loss and
    # dropout+fc1 kernels (ops/recon_pallas.py, ops/encoder_pallas.py): no
    # (A, B, D) tensor — reconstruction, its cotangent, or dropped input
    # views — ever touches HBM, and the binarized-BCE metric term is free
    cfg = VAEConfig(n_arm=5, fused_recon=True, fused_encoder=True)
    # shuffle_block=8: the epoch shuffle permutes 8-row blocks, so the
    # batch gather moves contiguous (8, D) slices at HBM bandwidth
    tcfg = TrainConfig(batch_size=5000, epochs_per_jit=5, bf16=True,
                       rng_impl="rbg", shuffle_block=8)
    N = 20_000
    B = tcfg.batch_size
    steps_per_epoch = N // B  # 4 — the reference production regime

    rng = np.random.default_rng(0)
    # bf16 mode stores the dataset in bf16 (halves gather traffic); rbg keys
    # use the TPU hardware RNG for the dropout/gumbel/reparam draws; the
    # all-pairs consensus einsum runs once per logging chunk
    x_all = jnp.asarray(
        np.maximum(rng.normal(1.0, 1.0, (N, cfg.input_dim)), 0.0),
        jnp.bfloat16)

    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(0), cfg, tx, rng_impl="rbg")
    run = jax.jit(make_epoch_runner(cfg, tcfg, tx, n_train=N,
                                    consensus_every_epoch=False),
                  donate_argnums=(0,))

    # compile + warmup (np.asarray forces a device→host transfer: on the
    # tunneled axon platform block_until_ready alone does not block)
    state, ems = run(state, x_all, None, 1.0)
    np.asarray(ems.total)

    n_chunks = 6
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, ems = run(state, x_all, None, 1.0)
    np.asarray(ems.total)
    dt = time.perf_counter() - t0

    epochs = n_chunks * tcfg.epochs_per_jit
    steps = epochs * steps_per_epoch
    cells = steps * B
    cells_per_sec = cells / dt
    n_local = max(jax.local_device_count(), 1)
    per_chip = cells_per_sec / n_local

    print(json.dumps({
        "metric": "train_throughput_A5_smartseq",
        "value": round(per_chip, 1),
        "unit": "cells/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_CELLS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
