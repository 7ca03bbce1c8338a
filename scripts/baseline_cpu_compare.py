"""Same-hardware baseline anchor: reference torch step vs dvae_tpu step, CPU.

The headline ``vs_baseline`` in bench.py divides by an *estimated* A100
throughput (the reference publishes no benchmark tables — BASELINE.md).
This script replaces estimation with measurement where both frameworks can
run on identical hardware: it times the reference's real training step
(``mmidas/cpl_mixvae.py:415-476`` — python per-arm loop in ``forward``
:329, O(A²) coupling loop in ``loss`` :539-569, per-batch ``to_np`` syncs
:477) against this framework's jitted epoch runner, both on this host's
CPU, same shape, same dtype (f32), no augmenter.

The resulting ratio is a *framework/compiler* factor (vectorized stacked-
arm vmap + XLA fusion vs eager per-arm python), independent of the TPU
itself — evidence that the TPU headline is not resting on a strawman
denominator.  Run with the reference checked out at /root/reference.

Usage: python scripts/baseline_cpu_compare.py [--batch 500] [--arms 5]
       [--steps 3] [--out BASELINE_CPU.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("DVAE_REFERENCE", "/root/reference")

# production shape (reference mmidas/nn_model.py:14-36)
C, D, FC, LOWD, S = 92, 5032, 100, 10, 2


def ref_step_time(batch: int, arms: int, steps: int) -> float:
    """Seconds/step of the reference's training step on CPU torch."""
    sys.path.insert(0, REFERENCE)
    import numpy as np
    import torch as th
    from mmidas.nn_model import mixVAE_model

    th.manual_seed(0)
    model = mixVAE_model(
        input_dim=D, fc_dim=FC, n_categories=C, state_dim=S, lowD_dim=LOWD,
        x_drop=0.5, s_drop=0.2, n_arm=arms, lam=1, lam_pc=1, tau=0.005,
        beta=1.0, hard=False, variational=True, device="cpu", eps=1e-8,
        momentum=0.01, ref_prior=False, loss_mode="MSE")
    model.train()
    opt = th.optim.Adam(model.parameters(), lr=1e-3)
    x = th.rand(batch, D)

    def one_step():
        # the reference hot loop body (cpl_mixvae.py:415-476), augmenter off
        xs = x.expand(arms, -1, -1)
        opt.zero_grad()
        x_recs, _, _, _, cs, _, c_smps, s_means, s_logvars, _ = model(
            xs, 1.0, 0.0)
        loss = model.loss(x_recs, [], [], xs, s_means, s_logvars, cs,
                          c_smps, 0.0)[0]
        loss.backward()
        opt.step()
        for a in range(arms):          # per-batch host sync (:477)
            cs[a].detach().numpy()
        return float(loss)

    one_step()                          # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    return (time.perf_counter() - t0) / steps


def ours_step_time(batch: int, arms: int, steps: int) -> float:
    """Seconds/step of dvae_tpu's jitted step on CPU XLA (f32, no fused
    Pallas kernels — those are TPU Mosaic kernels)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from dvae_tpu.config import TrainConfig, VAEConfig
    from dvae_tpu.train.step import (init_train_state, make_epoch_runner,
                                     make_optimizer)

    cfg = VAEConfig(n_arm=arms, fused_recon=False, fused_encoder=False)
    tcfg = TrainConfig(batch_size=batch, epochs_per_jit=1, bf16=False)
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(0), cfg, tx)
    x_all = jnp.asarray(np.random.default_rng(0).random((batch, D),
                                                        np.float32))
    run = jax.jit(make_epoch_runner(cfg, tcfg, tx, n_train=batch,
                                    consensus_every_epoch=False),
                  donate_argnums=(0,))
    state, ems = run(state, x_all, None, 1.0)   # compile + warmup
    np.asarray(ems.total)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, ems = run(state, x_all, None, 1.0)
    np.asarray(ems.total)
    return (time.perf_counter() - t0) / steps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--arms", type=int, default=5)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument("--side", choices=["ref", "ours", "both"],
                    default="both")
    args = ap.parse_args()

    # each side in its own subprocess: torch intra-op threading and XLA's
    # CPU runtime otherwise fight over the same cores/allocator
    if args.side == "ref":
        print(json.dumps({"s_per_step": ref_step_time(
            args.batch, args.arms, args.steps)}))
        return
    if args.side == "ours":
        print(json.dumps({"s_per_step": ours_step_time(
            args.batch, args.arms, args.steps)}))
        return

    import subprocess
    res = {}
    for side in ("ref", "ours"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--side", side,
             "--batch", str(args.batch), "--arms", str(args.arms),
             "--steps", str(args.steps)],
            capture_output=True, text=True)
        if p.returncode != 0:
            raise RuntimeError(f"{side} failed:\n{p.stderr[-2000:]}")
        res[side] = json.loads(p.stdout.strip().splitlines()[-1])

    out = {
        "shape": {"batch": args.batch, "arms": args.arms, "C": C, "D": D},
        "host_cpus": os.cpu_count(),
        "ref_cpu_s_per_step": round(res["ref"]["s_per_step"], 4),
        "ours_cpu_s_per_step": round(res["ours"]["s_per_step"], 4),
        "cells_per_sec_ref": round(args.batch / res["ref"]["s_per_step"], 1),
        "cells_per_sec_ours": round(args.batch / res["ours"]["s_per_step"],
                                    1),
        "speedup_same_hardware": round(
            res["ref"]["s_per_step"] / res["ours"]["s_per_step"], 3),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
