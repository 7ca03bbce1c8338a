"""Profiling / tracing / memory observability.

Equivalent capability to the reference's profiling kit:
  * ``profile_run`` context manager — dist/fsdp.py:72-80 (torch.profiler →
    chrome trace) becomes ``jax.profiler.trace`` → Perfetto/XProf trace dir.
  * CUDA memory-history snapshots — dist/fsdp.py:44-51
    (``_start_record_memory_history``/``_dump_snapshot``) become device
    ``memory_stats()`` snapshots (JSON).
  * CUDA-event wall timing — fsdp_mnist.py:401-452 becomes a sync-aware
    step timer (device→host transfer forces completion; on the tunneled
    axon platform ``block_until_ready`` alone does not block).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def profile_run(trace_dir: str = "profiles/",
                create_perfetto_link: bool = False):
    """Trace everything inside the block; view in Perfetto/XProf
    (the torch.profiler+chrome-trace analogue, dist/fsdp.py:72-80)."""
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir,
                            create_perfetto_link=create_perfetto_link):
        yield trace_dir


def memory_snapshot(path: Optional[str] = None) -> dict:
    """Per-device memory stats; dumped to JSON when ``path`` given
    (the CUDA memory-history analogue, dist/fsdp.py:44-51)."""
    snap = {}
    for d in jax.local_devices():
        try:
            snap[str(d)] = dict(d.memory_stats() or {})
        except Exception:
            snap[str(d)] = {}
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(snap, f, indent=2, default=int)
    return snap


def op_profile_total_ps(tree: dict) -> int:
    """Total device time (picoseconds) of a parsed op_profile tree.

    Sum EXACTLY the op level (byProgram root → program → category → op =
    depth 3) and never descend past it.  Verified against a real TPU trace
    (2026-08-19): op-group nodes ("X and its duplicate(s)") hold the
    INCLUSIVE time of their depth-4 duplicate children (descending
    double-counts, measured +10%), while fusion nodes hold all their time
    THEMSELVES with zero-rawTime instruction children (a leaves-only sum
    drops every fusion — the hot nodes — measured −30%).  Depth-3-only is
    right for both species; IDLE branches are not device work.
    """
    total_ps = 0

    def walk(node, depth):
        nonlocal total_ps
        if "idle" in str(node.get("name", "")).lower():
            return
        if depth >= 3:
            total_ps += node.get("metrics", {}).get("rawTime", 0)
            return
        for ch in node.get("children", []):
            walk(ch, depth + 1)

    walk(tree.get("byProgram", tree), 0)
    return total_ps


def xplane_total_device_ms(trace_dir: str) -> float:
    """Total device time (ms) recorded in a ``jax.profiler.trace`` dir.

    The xprof op_profile recipe (scripts/op_profile.py): convert the
    ``.xplane.pb`` and apply ``op_profile_total_ps``.  This is the
    dispatch-free ground truth on a tunneled chip — wall clock includes
    the tunnel's RTTs and ``cost_analysis()`` reports 0 for Pallas custom
    calls.  Requires ``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python`` to
    be set before protobuf first loads (the plugin ships stale _pb2s).
    """
    import glob

    from xprof.convert import raw_to_tool_data

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "op_profile", {})
    return op_profile_total_ps(json.loads(data)) / 1e12 * 1e3


class StepTimer:
    """Wall-clock step timing with forced device sync.

    Replaces the reference's paired CUDA events (fsdp_mnist.py:401-402,
    :432, :452): ``sync`` pulls one scalar to host, which waits for all
    prior work on the device stream.
    """

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    @staticmethod
    def sync(x) -> None:
        leaves = jax.tree_util.tree_leaves(x)
        if not leaves:
            return
        a = leaves[0]
        if hasattr(a, "addressable_shards") and a.addressable_shards:
            # a multi-host array spans non-addressable devices; fetching
            # the full value would raise — one local shard suffices to
            # block on the device stream
            a = a.addressable_shards[0].data
        np.asarray(a)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            self.sync(sync_on)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    def summary(self) -> dict:
        t = np.asarray(self.times)
        if len(t) == 0:
            return {}
        return {"mean_s": float(t.mean()), "p50_s": float(np.median(t)),
                "p95_s": float(np.percentile(t, 95)), "n": len(t)}
