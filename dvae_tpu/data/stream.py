"""Host→device streaming batch pipeline for datasets larger than HBM.

The device-resident epoch runner (train/step.make_epoch_runner) commits the
whole dataset to HBM — the fastest path by far (the per-step batch gather
runs at HBM bandwidth, measured 71 µs at the production shape), but it caps
the dataset at device memory: ~3 GB/million cells at D=5032 bf16, so an
atlas-scale matrix (10M+ cells) cannot train that way on a 16 GB chip.

The reference never holds the dataset on the GPU at all: its DataLoader
re-gathers every batch on the host and ships it across PCIe each step
(mmidas/utils/dataloader.py:123-132; consumed per batch in the train loop,
mmidas/cpl_mixvae.py:400-436).  This module is that capability rebuilt for
the TPU runtime — a **double-buffered asynchronous stream**: while the
device computes step *i*, the host gathers batch *i+k* (numpy fancy-index)
and its ``jax.device_put`` DMA runs in the background, so at steady state
the transfer hides behind compute whenever

    batch_bytes / PCIe_bandwidth  <  step_time.

At the production shape (B=5000, D=5032 bf16 = 50 MB, ~2.6 ms/step) that
needs ~20 GB/s — i.e. streaming is for *capacity*, not speed: datasets
that fit in HBM should use the resident path (the trainer picks
automatically via ``TrainConfig.stream``).

Semantics match the resident runner: per-epoch host-RNG reshuffle
(DataLoader ``shuffle=True``), ``drop_last`` batching, same jitted
``make_train_step`` (so the numerics per batch are identical), per-epoch
on-device consensus.  The shuffle RNG is ``np.random.default_rng((seed,
epoch))`` — deterministic and resume-stable (the epoch index rides in the
``TrainState``), but a *different stream* than the resident runner's
on-device permutation; the two paths are statistically, not bitwise,
interchangeable.

Multi-device: each batch is committed with the mesh's batch
``NamedSharding`` (one ``device_put`` scatters the rows across the local
data/fsdp devices).  Multi-process meshes follow the DCN worker's
convention (tests/_dcn_worker.py): every process holds the FULL host
dataset and ``batch_size`` is GLOBAL — the shuffle is seed-deterministic,
so all processes compute the identical batch plan, and each commits only
its process's row span of each batch through
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from collections import deque
from typing import Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class StreamBatch(NamedTuple):
    x: jax.Array
    prior: Optional[jax.Array]


@dataclasses.dataclass
class StreamStats:
    """Per-batch pipeline instrumentation (``record_stats=True``).

    ``gather_s``: host time to materialize one batch (fancy-index +
    densify + cast) — the CPU-bound half of the feed path.
    ``commit_s``: host time spent in the ``device_put`` CALL (dispatch;
    on real hardware the DMA itself runs async on its own engine, so this
    is near-zero there — through the dev tunnel it blocks on the copy).
    ``ahead``: depth of the in-flight queue at each yield — the
    issue-ahead invariant that lets transfers hide behind compute.
    """

    gather_s: list = dataclasses.field(default_factory=list)
    commit_s: list = dataclasses.field(default_factory=list)
    ahead: list = dataclasses.field(default_factory=list)


class BatchStreamer:
    """Shuffled, prefetching host→device batch stream.

    Args:
      x: (N, D) host array, already in the storage dtype (cast once up
        front — casting per batch would double the host work per step) —
        or a scipy sparse matrix (CSR preferred; CSC is converted once).
        Sparse keeps the HOST footprint at nnz-scale — single-cell count
        matrices are 80-95% zeros, so an atlas that cannot even be
        densified in host RAM still streams: each batch densifies only
        its (B, D) slice.
      batch_size: rows per batch; ``drop_last`` semantics (the reference
        train loader, dataloader.py:123-132).
      prior: optional (N, C) ref-prior table streamed row-aligned with x.
      seed: shuffle seed; epoch ``e`` uses ``default_rng((seed, e))``.
      dtype: per-batch cast target (used for sparse inputs, whose data
        stays f32 on host); None = ship batches in x's dtype.
      sharding: optional ``jax.sharding.Sharding`` for the committed batch
        (a batch ``NamedSharding`` under a multi-device mesh).
      prefetch: how many batches may be in flight beyond the current one.
        2 = classic double buffering; higher depths only help when step
        times are bursty.
    """

    def __init__(self, x, batch_size: int, *,
                 prior: Optional[np.ndarray] = None, seed: int = 0,
                 shuffle: bool = True, dtype=None, sharding=None,
                 prefetch: int = 2, record_stats: bool = False,
                 native: Optional[bool] = None):
        self.stats = StreamStats() if record_stats else None
        if native is None:  # env seam for A/B measurement of the gather
            native = os.environ.get("DVAE_NATIVE_GATHER", "1") != "0"
        self._native = native
        if batch_size > x.shape[0]:
            raise ValueError(
                f"batch_size {batch_size} > dataset size {x.shape[0]}")
        if hasattr(x, "tocsr") and getattr(x, "format", "csr") != "csr":
            x = x.tocsr()  # row gathers on CSC/COO are pathological
        self.dtype = None if dtype is None else np.dtype(dtype)
        self.x = x
        self.prior = prior
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.sharding = sharding
        self.prefetch = max(int(prefetch), 1)
        # multi-process: x is the FULL dataset on every process and
        # batch_size is GLOBAL.  When the sharding partitions the row axis,
        # this process contributes rows [rank·B/P, (rank+1)·B/P) of each
        # (identically shuffled) batch; when the batch is replicated over
        # the mesh (arm-only sharding, P()), every process contributes the
        # FULL batch — make_array_from_process_local_data expects the whole
        # array per process for a replicated dim.  A plain device_put of a
        # per-process span would hand each replica DIFFERENT data and the
        # SPMD program would silently diverge, so a multi-process run
        # without a sharding is a configuration error, not a fallback.
        self._n_proc = jax.process_count()
        self._rank = jax.process_index()
        if self._n_proc > 1 and sharding is None:
            raise ValueError(
                "multi-process streaming needs a sharding for the committed "
                "batch (row-sharded or replicated over a process-spanning "
                "mesh); committing per-process arrays would diverge")
        spec = getattr(sharding, "spec", None)
        self._rows_sharded = bool(spec) and spec[0] not in (None, ())
        if self._n_proc > 1 and self._rows_sharded:
            # the row axis splits over every DEVICE the spec's first entry
            # spans, not just over processes — validate against that span
            # so the failure is a constructor-time ValueError, not an
            # opaque shard-shape error inside the first _commit
            mesh = getattr(sharding, "mesh", None)
            row_axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
            span = 1
            for ax in row_axes:
                span *= dict(zip(mesh.axis_names, mesh.devices.shape))[ax]                     if mesh is not None else 1
            span = max(span, self._n_proc)
            if batch_size % span:
                raise ValueError(
                    f"global batch_size {batch_size} must divide evenly "
                    f"over the {span}-device row axis "
                    f"({self._n_proc} processes)")

    @property
    def steps_per_epoch(self) -> int:
        return self.x.shape[0] // self.batch_size

    def __len__(self) -> int:
        return self.steps_per_epoch

    def _local_span(self, sel: np.ndarray) -> np.ndarray:
        """This process's row indices of a global batch selection.

        Only a row-sharded batch splits across processes; a replicated
        batch needs the full selection on every process (see __init__)."""
        if self._n_proc == 1 or not self._rows_sharded:
            return sel
        span = self.batch_size // self._n_proc
        return sel[self._rank * span: (self._rank + 1) * span]

    def _gather(self, src, sel: np.ndarray, cast: bool = True) -> np.ndarray:
        if self._native and not hasattr(src, "toarray"):
            # native threaded gather (+ fused f32→bf16 cast) — ONE pass
            # instead of numpy's gather-then-cast two; the host stage is
            # the streaming bottleneck (feed_census), and the reference
            # provisions 32 CPUs for exactly this re-gather
            # (run-train-A5-E500000-a100.sh).  None → shape/dtype combo
            # the kernel doesn't cover; fall through to numpy.
            from dvae_tpu.utils.host_ops import gather_rows
            h = gather_rows(src, sel, self.dtype if cast else None)
            if h is not None:
                return h
        h = src[sel]
        if hasattr(h, "toarray"):
            h = h.toarray()
        if cast and self.dtype is not None and h.dtype != self.dtype:
            h = h.astype(self.dtype)
        return h

    def _commit(self, h: np.ndarray,
                global_rows: Optional[int] = None) -> jax.Array:
        if self.sharding is None:
            return jax.device_put(h)
        if self._n_proc > 1:
            return jax.make_array_from_process_local_data(
                self.sharding, h, (global_rows,) + h.shape[1:])
        return jax.device_put(h, self.sharding)

    def epoch(self, epoch_idx: int) -> Iterator[StreamBatch]:
        """Yield the epoch's batches, keeping ``prefetch`` in flight."""
        n = self.x.shape[0]
        steps = self.steps_per_epoch
        if self.shuffle:
            order = np.random.default_rng(
                (self.seed, epoch_idx)).permutation(n)
        else:
            order = np.arange(n)
        order = order[: steps * self.batch_size].reshape(
            steps, self.batch_size)

        pending: deque[StreamBatch] = deque()

        def issue(i: int) -> None:
            sel = self._local_span(order[i])
            if self.stats is not None:
                t0 = time.perf_counter()
                h = self._gather(self.x, sel)
                t1 = time.perf_counter()
                xb = self._commit(h, self.batch_size)
                self.stats.gather_s.append(t1 - t0)
                self.stats.commit_s.append(time.perf_counter() - t1)
            else:
                xb = self._commit(self._gather(self.x, sel),
                                  self.batch_size)
            pb = (None if self.prior is None
                  else self._commit(self._gather(self.prior, sel,
                                                 cast=False),
                                    self.batch_size))
            pending.append(StreamBatch(xb, pb))

        depth = min(self.prefetch, steps)
        for i in range(depth):
            issue(i)
        for i in range(steps):
            if i + depth < steps:
                issue(i + depth)
            if self.stats is not None:
                self.stats.ahead.append(len(pending))
            yield pending.popleft()


def feed_census(x, batch_size: int, *, dtype=None, n_batches: int = 8,
                seed: int = 0, sharding=None,
                device_ms_per_step: Optional[float] = None,
                link_gbps: Optional[float] = None,
                commit: bool = True) -> dict:
    """Environment-independent capacity figures for the streaming path.

    The tunnel-bound end-to-end number (bench ``train_throughput_A5_stream``)
    says nothing about real hardware; what DOES transfer is the three-stage
    steady-state pipeline bound — per batch:

      * ``host_gather_ms``: CPU cost to materialize one batch (fancy-index
        + densify + cast), measured HERE by draining a recording streamer
        (median over ``n_batches``, first batch dropped).  Scales ~linearly
        with host cores (the reference provisions 32,
        train-scripts/run-train-A5-E500000-a100.sh).
      * ``link_ms``: batch_bytes / ``link_gbps`` — the DMA stage at a real
        host→device link (PCIe-class ~16-32 GB/s), NOT the dev tunnel's
        8-30 MB/s.
      * ``device_ms_per_step``: the compute stage (pass the op-profile
        figure, e.g. 2.58 for the A=5 production step).

    Steady-state throughput is bound by the slowest stage; the feed is
    fully hidden (streaming == resident throughput) iff
    max(host, link) <= device.  ``predicted_overlap_pct`` =
    100·min(1, device / max(host, link)).  The issue-ahead invariant this
    prediction rests on (the streamer keeps ``prefetch`` batches in
    flight; JAX dispatch is async) is pinned by tests/test_stream_overlap.
    """
    bs = BatchStreamer(x, batch_size, seed=seed, dtype=dtype,
                       sharding=sharding, prefetch=1, record_stats=True)
    if not commit:
        # host-cost-only mode: never touch the device — through the dev
        # tunnel one 50 MB device_put costs seconds and would bury the
        # portable host figure under a non-portable link number
        bs._commit = lambda h, global_rows=None: h
    n = min(max(n_batches, 2), bs.steps_per_epoch)
    for i, _ in enumerate(bs.epoch(0)):
        if i + 1 >= n:
            break
    gather = sorted(bs.stats.gather_s[1:])   # drop the cold first batch
    commits = sorted(bs.stats.commit_s[1:])
    host_ms = 1e3 * gather[len(gather) // 2]
    itemsize = np.dtype(bs.dtype).itemsize if bs.dtype is not None \
        else x.dtype.itemsize
    batch_mb = batch_size * int(np.prod(x.shape[1:])) * itemsize / 1e6
    out = {"host_gather_ms": round(host_ms, 3),
           "batch_mb": round(batch_mb, 2)}
    if commit:
        out["commit_ms"] = round(1e3 * commits[len(commits) // 2], 3)
    link_ms = None
    if link_gbps:
        link_ms = batch_mb / link_gbps  # MB / (GB/s) = ms
        out["link_ms"] = round(link_ms, 3)
        out["link_gbps_assumed"] = link_gbps
    if device_ms_per_step is not None:
        feed_ms = max(host_ms, link_ms or 0.0)
        out["device_ms_per_step"] = device_ms_per_step
        out["predicted_overlap_pct"] = round(
            100.0 * min(1.0, device_ms_per_step / feed_ms)
            if feed_ms > 0 else 100.0, 1)
        stages = {"host": host_ms, "link": link_ms or 0.0,
                  "device": device_ms_per_step}
        out["bound_by"] = max(stages, key=stages.get)
    return out


# ---------------------------------------------------------------------------
# Streaming epoch runner (drop-in for the resident make_epoch_runner)
# ---------------------------------------------------------------------------

def make_streaming_runner(cfg, tcfg, tx, n_train: int, augment=None,
                          mesh=None, prefetch: int = 2):
    """Streaming twin of ``train.step.make_epoch_runner``.

    Returns ``runner(n_chunk)`` → ``run(state, x_host, prior_host, temp)``
    with the exact signature/return contract of the jitted resident runner
    (``(TrainState, EpochMetrics)`` stacked over ``n_chunk`` epochs), so
    ``CplMixVAE._run_phase`` drives either interchangeably.  ``x_host`` /
    ``prior_host`` are HOST numpy arrays here — nothing dataset-sized
    touches HBM; per-step device residency is one batch plus the prefetch
    window.
    """
    from dvae_tpu.eval.metrics import consensus_device
    from dvae_tpu.train.step import (EpochMetrics, _batch_ns,
                                     make_train_step)

    B = tcfg.batch_size
    steps = n_train // B
    if steps == 0:
        raise ValueError(f"batch_size {B} > dataset size {n_train}")
    step_fn = jax.jit(make_train_step(cfg, tcfg, tx, augment, mesh),
                      donate_argnums=(0,))
    batch_ns = _batch_ns(mesh, B)
    if batch_ns is None and mesh is not None:
        # mesh present but the batch can't ride its data axes (arm-only
        # mesh, or B not divisible): commit batches REPLICATED over the
        # mesh — a global array every process can construct, instead of a
        # single-device put that multi-process jit would reject (and that
        # would diverge if each process held a different span)
        from jax.sharding import NamedSharding, PartitionSpec
        batch_ns = NamedSharding(mesh, PartitionSpec())

    @jax.jit
    def summarize(ms, labels):
        """(steps,)-stacked StepMetrics + (steps, A, B) labels → one
        EpochMetrics row (same reductions as the resident runner)."""
        flat = jnp.moveaxis(labels, 1, 0).reshape(cfg.n_arm, steps * B)
        return EpochMetrics(
            total=jnp.mean(ms.total),
            loss_rec=jnp.mean(ms.loss_rec, axis=0),
            loss_joint=jnp.mean(ms.loss_joint),
            neg_entropy=jnp.mean(ms.neg_entropy),
            c_dist=jnp.mean(ms.c_dist),
            c_l2_dist=jnp.mean(ms.c_l2_dist),
            kl=jnp.mean(ms.kl, axis=0),
            consensus=consensus_device(flat, cfg.n_categories),
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def bump_epoch(state):
        # donated: without it every epoch would copy the whole params/opt
        # state just to increment the counter
        return state._replace(epoch=state.epoch + 1)

    def run(state, x_host, prior_host, temp, *, n_chunk: int):
        base_epoch = int(jax.device_get(state.epoch))
        streamer = BatchStreamer(
            x_host, B, prior=prior_host, seed=tcfg.seed,
            dtype=jnp.bfloat16 if tcfg.bf16 else jnp.float32,
            sharding=batch_ns, prefetch=prefetch)
        rows = []
        for e in range(n_chunk):
            ms_steps, label_steps = [], []
            for i, batch in enumerate(streamer.epoch(base_epoch + e)):
                state, m, labels = step_fn(state, batch.x, batch.prior,
                                           temp)
                ms_steps.append(m)
                label_steps.append(labels)
                if i >= prefetch:
                    # backpressure: force completion of the step issued
                    # ``prefetch`` iterations ago, so dispatched-but-
                    # unexecuted 50 MB batch buffers cannot pile up in
                    # HBM beyond the prefetch window (np.asarray, not
                    # block_until_ready — the latter does not block
                    # through a tunneled device)
                    np.asarray(ms_steps[i - prefetch].total)
            ms = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *ms_steps)
            rows.append(summarize(ms, jnp.stack(label_steps)))
            state = bump_epoch(state)
        ems = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rows)
        return state, ems

    def runner(n_chunk: int):
        return functools.partial(run, n_chunk=n_chunk)

    return runner
