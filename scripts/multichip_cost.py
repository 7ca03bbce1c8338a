"""Multi-chip collective-cost report for every sharding strategy.

Compiles the production-shape epoch runner (A=5, B=5000, D=5032, C=92)
over an N-device virtual mesh per strategy, censuses the collectives the
SPMD partitioner emitted, and brackets the multi-chip scaling efficiency
against the measured single-chip step time (reference capability:
fsdp_mnist.py:354-507 measures the same strategy matrix with CUDA events;
here the answer comes from the compiled module, no pod required).

Usage:
    python scripts/multichip_cost.py [--devices 8] [--mesh d,a,f]
        [--step-ms 2.79] [--ici-gbps 90] [--bf16]

Prints one JSON line per strategy.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--mesh", default=None,
                    help="data,arm,fsdp sizes (default: 2,1,<devices/2>)")
    ap.add_argument("--step-ms", type=float, default=2.79,
                    help="measured single-chip step time to bracket against")
    ap.add_argument("--ici-gbps", type=float, default=90.0)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--batch", type=int, default=5000)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{args.devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dvae_tpu.config import (MeshConfig, ShardingStrategy, TrainConfig,
                                 VAEConfig)
    from dvae_tpu.parallel.collective_cost import (
        epoch_runner_collective_stats, predict)
    from dvae_tpu.parallel.sharding import make_mesh

    if args.mesh:
        d, a, f = (int(v) for v in args.mesh.split(","))
    else:
        d, a, f = 2, 1, args.devices // 2
    mesh = make_mesh(MeshConfig(data=d, arm=a, fsdp=f))

    # the production TPU path: fused Pallas kernels on, and the MeshConfig
    # in tcfg so the kernels route through their SPMD partitioning rules
    # (ops/partitioned.py) instead of compiling the replicated fallback
    cfg = VAEConfig(n_arm=5, fused_recon=True, fused_encoder=True)
    n_train = 4 * args.batch
    tcfg = TrainConfig(batch_size=args.batch, epochs_per_jit=1,
                       bf16=args.bf16, shuffle_block=8,
                       mesh=MeshConfig(data=d, arm=a, fsdp=f))

    import dataclasses
    for strat in ShardingStrategy:
        stats = epoch_runner_collective_stats(
            cfg, dataclasses.replace(tcfg, sharding=strat), strat, mesh,
            n_train)
        row = {"strategy": strat.value,
               "mesh": {"data": d, "arm": a, "fsdp": f},
               "counts": stats.counts,
               "bytes_by_kind": stats.bytes_by_kind,
               **predict(stats, args.step_ms / 1e3, args.ici_gbps)}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
