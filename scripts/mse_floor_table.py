"""Per-fusion HBM-floor table for the MSE production step's non-kernel tail.

The three fused Pallas kernels carry ~57% of the 2.57 ms step with a
committed roofline argument (README); this script gives the remaining
~1.1 ms the same rigor (round-3 verdict #3): for every timed op in a
fresh xprof trace it looks up the SAME-NAMED instruction in the optimized
HLO of the same executable, sums its operand+output bytes, and divides by
the chip's HBM bandwidth — the memory floor for a bandwidth-bound fusion.
Ops sitting well above their floor are fusion/trim candidates; ops at the
floor are done (only removing traffic would help).  MXU ops (convolution
fusions) get a FLOP floor at the bf16 peak instead.

Usage:
    python scripts/mse_floor_table.py [--trace-dir DIR] [--steps 64]
        [--hbm-gbps 819] [--peak-tflops 197]

Without --trace-dir it captures a fresh 64-step trace first (real TPU).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "u64": 8, "s8": 1, "u8": 1, "pred": 1,
                "s16": 2, "u16": 2, "f64": 8, "u4": 1, "s4": 1}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples by summing)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_hlo(text: str):
    """name → (output_type_str, operand_names, op) for every instruction
    in the optimized module.  Handles layout/tiling annotations
    (``{1,0:T(8,128)(2,1)}``) and tuple types (parenthesized, may contain
    spaces)."""
    insts = {}
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("ROOT "):
            line = line[5:]
        if " = " not in line:
            continue
        name, rest = line.split(" = ", 1)
        name = name.strip().lstrip("%")
        if not re.fullmatch(r"[\w.\-]+", name):
            continue
        if rest.startswith("("):          # tuple type: balance parens
            depth = 0
            end = 0
            for i, ch in enumerate(rest):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            typ, tail = rest[:end + 1], rest[end + 1:].lstrip()
        else:                             # plain type: first token
            sp = rest.find(" ")
            if sp < 0:
                continue
            typ, tail = rest[:sp], rest[sp + 1:]
        m = re.match(r"([\w\-]+)\((.*)", tail)
        if not m:
            continue
        op, args_s = m.groups()
        args_s = args_s.split(", kind=")[0].split(" calls=")[0]
        args_s = args_s.split(", metadata=")[0]
        ops = re.findall(r"%([\w.\-]+)", args_s)
        insts[name] = (typ, ops, op)
    return insts


def fusion_traffic(name: str, insts) -> int | None:
    """Approx HBM bytes a fusion moves: its operands' shapes + its output.

    Over-counts operands that stay fused upstream only when XLA chose not
    to fuse them — i.e. this IS the materialized traffic of the scheduled
    module; parameters of the entry computation count like any operand."""
    if name not in insts:
        return None
    typ, ops, _ = insts[name]
    total = shape_bytes(typ)
    for o in ops:
        if o in insts:
            total += shape_bytes(insts[o][0])
    return total


def timed_ops(trace_dir: str):
    from xprof.convert import raw_to_tool_data

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "op_profile", {})
    tree = json.loads(data)
    rows = []

    def walk(node, depth):
        name = str(node.get("name", "?"))
        if "idle" in name.lower():
            return
        if depth >= 3:
            t = node.get("metrics", {}).get("rawTime", 0)
            if t:
                rows.append((t, name))
            return
        for ch in node.get("children", []):
            walk(ch, depth + 1)

    walk(tree.get("byProgram", tree), 0)
    rows.sort(reverse=True)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--hbm-gbps", type=float, default=819.0)   # v5e HBM2
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.config import TrainConfig, VAEConfig
    from dvae_tpu.parallel.sharding import put_dataset
    from dvae_tpu.train.step import (init_train_state, make_epoch_runner,
                                     make_optimizer)
    from dvae_tpu.utils.tools import enable_compile_cache

    enable_compile_cache()
    cfg = VAEConfig(n_arm=5, fused_recon=True, fused_encoder=True)
    tcfg = TrainConfig(batch_size=5000, epochs_per_jit=1, bf16=True,
                       rng_impl="rbg", shuffle_block=8)
    N = 20_000
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(0), cfg, tx,
                             rng_impl=tcfg.rng_impl)
    rng = np.random.default_rng(0)
    x_all = put_dataset(rng.random((N, cfg.input_dim), dtype=np.float32),
                        jnp.bfloat16)
    run = jax.jit(make_epoch_runner(cfg, tcfg, tx, n_train=N,
                                    consensus_every_epoch=False))
    lowered = run.lower(state, x_all, None, 1.0)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    insts = parse_hlo(hlo)
    print(f"optimized HLO: {len(insts)} instructions", file=sys.stderr)

    trace_dir = args.trace_dir
    steps = args.steps
    if trace_dir is None:
        trace_dir = tempfile.mkdtemp(prefix="floor_mse_")
        state, ems = run(state, x_all, None, 1.0)
        np.asarray(ems.total)
        state, ems = run(state, x_all, None, 1.0)
        np.asarray(ems.total)
        with jax.profiler.trace(trace_dir):
            for _ in range(max(steps // 4, 1)):
                state, ems = run(state, x_all, None, 1.0)
            np.asarray(ems.total)
        print(f"trace dir: {trace_dir}", file=sys.stderr)

    rows = timed_ops(trace_dir)
    total_ps = sum(t for t, _ in rows)
    print(f"total device {total_ps/1e12*1e3:.2f} ms "
          f"({total_ps/1e12*1e3/steps:.3f} ms/step)")
    hdr = (f"{'op':42s} {'µs/step':>8s} {'%':>5s} {'MB':>7s} "
           f"{'floor µs':>8s} {'x-floor':>7s}  root")
    print(hdr)
    groups = defaultdict(float)
    for t, name in rows[: args.top]:
        us = t / 1e6 / steps
        pct = 100 * t / total_ps
        base = name.split(" and its duplicate")[0]
        mb = fusion_traffic(base, insts)
        root = insts.get(base, ("", [], "?"))[2]
        if mb is None:
            print(f"{base[:42]:42s} {us:8.1f} {pct:5.1f} {'?':>7s} "
                  f"{'?':>8s} {'?':>7s}  (not in HLO)")
            continue
        floor_us = mb / (args.hbm_gbps * 1e9) * 1e6
        ratio = us / floor_us if floor_us > 0 else float("inf")
        print(f"{base[:42]:42s} {us:8.1f} {pct:5.1f} {mb/1e6:7.2f} "
              f"{floor_us:8.1f} {ratio:7.2f}  {root}")
        groups[root] += us
    print("\nby root op (timed subset):")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v:8.1f} µs/step")


if __name__ == "__main__":
    main()
