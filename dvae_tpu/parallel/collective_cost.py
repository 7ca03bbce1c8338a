"""Collective-traffic accounting for the multi-device training step.

The reference demonstrates its sharding strategies by *measuring* them on
an attached multi-GPU node (fsdp_mnist.py:354-507 CUDA-event timings,
dist/plot.py log scrapes).  On TPU the equivalent question — "what does
each strategy put on the interconnect, and what does that cost at ICI
bandwidth?" — can be answered exactly without occupying a pod: XLA's SPMD
partitioner emits every collective into the optimized HLO at compile time,
and compilation is hardware-independent.  This module compiles the real
epoch runner over an N-device mesh, parses the collectives out of the
optimized module (kind, dtype, local shape, replica-group size), and
applies the standard ring-cost model:

    all-reduce       2·(g−1)/g · bytes     (reduce-scatter + all-gather)
    all-gather         (g−1)/g · bytes_out
    reduce-scatter     (g−1)   · bytes_out (= (g−1)/g · bytes_in)
    all-to-all / collective-permute: bytes

(g = replica-group size; bytes are the per-device local tensor size, which
is what HLO shapes carry post-SPMD).  ``predict`` divides wire bytes by an
ICI bandwidth to bound the per-step communication time; XLA's
latency-hiding scheduler overlaps collectives with compute, so the bound
is an upper bound on overhead — the README's multi-chip section carries
the production-shape numbers.

Caveat: the partitioner's *choice* of collectives is platform-independent
(SPMD runs before backend lowering), but fusion differs per backend; byte
totals for parameter/gradient collectives are structural and match.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Optional

import numpy as np

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

# collective op kinds (async forms end in -start; -done carries no shape work)
_KINDS = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
          "collective-permute")
# tuple shapes of variadic collectives carry /*index=N*/ comments, so the
# tuple matcher excludes parens, not '='
_OP_RE = re.compile(
    r"=\s+(?P<shape>\([^()]*\)|\S+)\s+"
    r"(?P<kind>" + "|".join(_KINDS) + r")(?P<async>-start)?\(")
_SHAPE_RE = re.compile(r"(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\]")
_GROUPS_LIST_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[\d+,(\d+)\]")


@dataclasses.dataclass
class CollectiveStats:
    """Per-compile collective census.

    ``counts``/``bytes_by_kind``: per collective kind, number of ops and
    summed local tensor bytes.  ``wire_bytes``: ring-model bytes a single
    device moves per *step* — the epoch runner's step/epoch loops are
    ROLLED (``lax.scan``/``while``), so each in-loop collective appears
    exactly once in the optimized module no matter how many steps the
    executable runs (see ``predict``); do NOT divide by steps.
    """

    counts: Dict[str, int]
    bytes_by_kind: Dict[str, int]
    wire_bytes: float

    @property
    def total_ops(self) -> int:
        return sum(self.counts.values())

    def ici_seconds(self, gbps: float = 90.0) -> float:
        """Non-overlapped wire time at ``gbps`` GB/s per-device ICI
        bandwidth (v5e: ~90 GB/s usable per direction on a 2D-torus ring;
        override for other generations)."""
        return self.wire_bytes / (gbps * 1e9)


def _elem_bytes(shape_str: str):
    out = []
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append(n * _DTYPE_BYTES[dtype])
    return out


def _shape_bytes(shape_str: str) -> int:
    return sum(_elem_bytes(shape_str))


def _group_size(line: str, n_devices: int) -> int:
    m = _GROUPS_LIST_RE.search(line)
    if m:
        return len(m.group(1).split(","))
    m = _GROUPS_IOTA_RE.search(line)
    if m:
        return int(m.group(1))
    return n_devices


def hlo_collective_stats(hlo_text: str, n_devices: int) -> CollectiveStats:
    """Census of the collectives in an optimized (post-SPMD) HLO module."""
    counts: Dict[str, int] = {}
    bytes_by_kind: Dict[str, int] = {}
    wire = 0.0
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        kind = m.group("kind")
        is_async = m.group("async") is not None
        if is_async and m.group("shape").startswith("("):
            # async -start tuple = (operand, result[, context tokens]):
            # summing would double-count the payload (2x for all-reduce).
            # The max element is the payload under every kind: AR
            # operand==result, AG result=full gather, RS operand=full
            # input, permute context tokens are tiny.
            nbytes = max(_elem_bytes(m.group("shape")))
        else:
            # sync op (single shape, or variadic tuple of results: sum)
            nbytes = _shape_bytes(m.group("shape"))
        g = _group_size(line, n_devices)
        counts[kind] = counts.get(kind, 0) + 1
        bytes_by_kind[kind] = bytes_by_kind.get(kind, 0) + nbytes
        if g <= 1:
            continue
        if kind == "all-reduce":
            wire += 2.0 * (g - 1) / g * nbytes
        elif kind == "all-gather":
            wire += (g - 1) / g * nbytes          # nbytes = gathered shape
        elif kind == "reduce-scatter":
            # sync shape = scattered shard; async payload = full input
            wire += ((g - 1) / g if is_async else (g - 1)) * nbytes
        else:                                     # all-to-all / permute
            wire += nbytes
    return CollectiveStats(counts, bytes_by_kind, wire)


def epoch_runner_collective_stats(cfg, tcfg, strategy, mesh,
                                  n_train: int,
                                  augment=None) -> CollectiveStats:
    """Compile the real epoch runner sharded per ``strategy`` and census
    its collectives.  Compile-only: nothing executes, so this runs at the
    production shape on any backend (the virtual CPU mesh in tests)."""
    import jax

    from dvae_tpu.parallel.sharding import replicated, strategy_shardings
    from dvae_tpu.train.step import (init_train_state, make_epoch_runner,
                                     make_optimizer)

    tx = make_optimizer(cfg, tcfg.optimizer)
    state = init_train_state(jax.random.key(0), cfg, tx,
                             rng_impl=tcfg.rng_impl)
    shs = strategy_shardings(strategy, mesh, state.params, state.bn,
                             state.opt_state)
    state_sh = state._replace(params=shs[0], bn=shs[1], opt_state=shs[2],
                              key=replicated(mesh), mask=replicated(mesh),
                              epoch=replicated(mesh))
    run = jax.jit(make_epoch_runner(cfg, tcfg, tx, n_train=n_train,
                                    augment=augment, mesh=mesh),
                  in_shardings=(state_sh, replicated(mesh), None, None))
    x_shape = jax.ShapeDtypeStruct(
        (n_train, cfg.input_dim),
        jax.numpy.bfloat16 if tcfg.bf16 else jax.numpy.float32)
    lowered = run.lower(state, x_shape, None, 1.0)
    hlo = lowered.compile().as_text()
    return hlo_collective_stats(hlo, mesh.devices.size)


def predict(stats: CollectiveStats, step_seconds: Optional[float],
            gbps: float = 90.0) -> dict:
    """Scaling summary: per-step wire time and the efficiency bracket.

    The epoch runner's step/epoch loops are ROLLED (``lax.scan`` /
    ``while``), so every in-loop collective appears exactly once in the
    optimized module: the census is already per-step (the handful of
    outside-the-loop ops — final metric reductions — are noise next to the
    gradient/parameter collectives).

    ``step_seconds``: measured single-chip step time (the compute the
    collectives must hide under).  Efficiency is reported as a bracket —
    ``no_overlap`` assumes every wire byte serializes after compute,
    ``full_overlap`` assumes XLA hides all of it (reality lands between,
    near the top for this model: the big gradient collectives overlap the
    backward's matmuls).
    """
    wire_s = stats.ici_seconds(gbps)
    out = {
        "wire_bytes_per_step": stats.wire_bytes,
        "wire_seconds_per_step": wire_s,
        "collective_ops": stats.total_ops,
    }
    if step_seconds:
        out["efficiency_no_overlap"] = step_seconds / (step_seconds + wire_s)
        out["efficiency_full_overlap"] = min(
            1.0, step_seconds / max(step_seconds, wire_s))
    return out
