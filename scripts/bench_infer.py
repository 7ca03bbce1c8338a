"""Inference (serving) throughput: batched eval at production shape.

The reference's serving analogue is ``evaluation.py`` → ``eval_model``
(mmidas/cpl_mixvae.py:1450-1619): batched no-grad forward over a dataset
producing per-arm categorical posteriors, state samples and labels.

This bench measures the DEVICE-side eval throughput — the jitted eval
step (fused recon-loss kernel path) with argmax labels as the only
per-run host sync.  The full-summary export (``eval_model``'s (A, N, C)
posterior matrices, ~2 MB per 1k cells) is a host-egress copy whose cost
is environment-bound (PCIe on a real TPU VM; a slow tunnel in remote-dev
setups) and is deliberately excluded — ``eval_model`` already batches it
into one transfer per field.

Measured anchors (v5e-1, A=5/B=5000/D=5032): the jitted eval step runs at
1.05 ms/batch device time without the augmenter (3.35 ms with it — the
augmenter is ~3x the model's FLOPs; both share the training path's fused
loss kernels and compute dtype, see make_eval_step).  ``_predict_labels``
scans K≤8 batches per dispatch (make_eval_runner), so the end-to-end
number here pays one host round trip per chunk, not per batch; through a
high-latency dev tunnel it still reads below device time (bench.py
measured 3.3M cells/s no-augmenter at K=8).

Usage: python scripts/bench_infer.py [--arms 5] [--batch 5000]
Prints one JSON line (same contract as bench.py, different metric name).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", type=int, default=5)
    ap.add_argument("--batch", type=int, default=5000)
    ap.add_argument("--cells", type=int, default=40_000)
    args = ap.parse_args()

    import jax.numpy as jnp

    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    rng = np.random.default_rng(0)
    x = np.maximum(rng.normal(1.0, 1.0, (args.cells, 5032)), 0.0).astype(
        np.float32)

    cpl = CplMixVAE(saving_folder="/tmp/bench_infer")
    cpl.init_model(n_arm=args.arms, batch_size=args.batch)  # production dims
    cpl.eval_model(x[: args.batch])              # builds + compiles the step

    xj = jnp.asarray(x, jnp.float32)
    B = args.batch
    np.asarray(cpl._predict_labels(xj[: 2 * B], 1.0, B))   # warmup
    t0 = time.perf_counter()
    labels = cpl._predict_labels(xj, 1.0, B)     # (A, N) — one small sync
    dt = time.perf_counter() - t0

    assert labels.shape == (args.arms, args.cells)
    cells_per_sec = args.cells / dt
    print(json.dumps({
        "metric": f"inference_throughput_A{args.arms}_smartseq",
        "value": round(cells_per_sec, 1),
        "unit": "cells/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
