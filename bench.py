"""Headline benchmark: A=5 Smart-seq-shape coupled-mixVAE training throughput.

Measures steady-state training throughput (cells/sec/chip) of the flagship
configuration — the reference's production run shape (A=5, B=5000, D=5032,
C=92; train-scripts/run-train-A5-E500000-a100.sh, reference train.py
defaults) — on whatever chip jax.devices()[0] is.  Variants:

  * ``train_throughput_A5_smartseq``      — MSE mode, no augmenter (the
    kernel-limit figure; headline metric).
  * ``train_throughput_A5_smartseq_aug``  — the frozen augmenter in the
    loop, the reference's canonical production path
    (mmidas/cpl_mixvae.py:422-425: ``netA(x.expand(A,-1,-1), True, 0.1)``).
  * ``train_throughput_A5_zinb``          — ZINB reconstruction mode
    (mmidas/utils/distributions.py), fused three-head loss+gradient
    kernel (~8.5 ms/step, ~590k cells/s/chip).
  * ``infer_throughput_A5`` / ``..._zinb``— the scanned eval runner
    (serving path, cpl_mixvae.py:1450-1619) in MSE and ZINB loss modes,
    each with its dispatch-free ``eval_device_ms_per_batch`` census.
  * ``projected_v5e16_cells_per_sec_per_chip_{floor,ceiling}`` — the
    measured device step combined with the ring wire model at the driver
    target slice (v5e-16, weak scaling, ddp): floor = serialized
    collectives, ceiling = fully overlapped.
  * ``train_throughput_A5_stream``        — the host-resident streaming
    capacity path (data/stream.py; reference per-batch shipping,
    mmidas/utils/dataloader.py:123-132).  On this container the number is
    bound by the tunnel's host→device bandwidth (8-30 MB/s, unstable),
    not by the pipeline — treat it as a liveness figure, not a roofline.
  * ``device_ms_per_step`` / ``mfu_pct``  — per-op device-time census of
    the headline step (xprof op_profile parse — dispatch-free ground
    truth; wall clock reads below it by the tunnel's RTTs) and the
    implied MXU utilization against the chip's bf16 peak.

``vs_baseline`` compares against an estimated reference throughput of
25,000 cells/sec on one A100: the reference publishes no benchmark tables
(BASELINE.md), so this anchor is derived from its compute profile — A=5
arms ≈ 50M params (dist/fsdp.py:672-675), 6·params·batch ≈ 1.5 TFLOP/step
at B=5000, fp32 + python per-arm loop + per-batch host syncs on A100 ≈
200 ms/step → 25k cells/s.  Sensitivity: a perfectly-overlapped fp32 A100
run of the same FLOPs would bound the reference at ≤100k cells/s (1.5
TFLOP / 19.5 TFLOPS·0.5 util ≈ 150 ms… optimistic ×4), so even at the
most charitable baseline the headline ratio stays ≥16×; at the estimate
it is ~65×.  Driver target (BASELINE.json): ≥5× per chip.

Driver contract — this script ALWAYS prints at least one parseable JSON
line ``{"metric", "value", "unit", "vs_baseline", "extra"}`` within a
bounded budget, no matter what the backend does (round 2 recorded null
because an outage backoff outlasted the driver timeout):

  * The parent process NEVER touches the JAX backend.  It probes in a
    subprocess; if the first probe fails or hangs it immediately prints
    the last measured result from ``.bench_cache.json`` marked
    ``stale_from_cache`` (≤ ~150 s after start), then keeps retrying
    within the budget and prints a FRESH line too if the backend comes
    back (the last line supersedes).
  * The live measurement runs in a child (``bench.py --live``) the parent
    can kill without blocking in C; on SIGTERM/SIGALRM the child emits a
    partial line with whatever variants already finished.
  * SIGTERM/SIGINT/SIGALRM in the parent dump the cache line before dying;
    total runtime is capped by ``BENCH_BUDGET_S`` (default 1140 s).

Roofline status (v5e, measured 2026-08): see README "hot path" — the
headline step is 2.58 ms device time (1.94M cells/s/chip) with the four
fused Pallas kernels at their combined MXU+VPU roofline; ZINB sits at its
VPU transcendental floor (~5.6 ms kernel).
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

# the trace parser needs the pure-python protobuf runtime (stale _pb2s in
# tensorboard_plugin_profile); must be set before protobuf first loads
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

BASELINE_CELLS_PER_SEC = 25_000.0  # estimated reference A100 throughput
N = 20_000
B = 5000

_CACHE = os.environ.get(
    "BENCH_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".bench_cache.json"))

# chip bf16 matmul peaks (TFLOPS) for the MFU estimate, by device_kind
# substring (lowercased)
_PEAK_BF16_TFLOPS = (("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0),
                     ("v6", 918.0), ("v4", 275.0), ("v3", 123.0))

_EMITTED = False          # has a JSON line been printed yet?
_PARTIAL: dict = {}       # live child: variants measured so far
_LIVE_CHILD = None        # parent: the running `--live` subprocess
_ORPHANED_PID = None      # parent: child left blocked in a C call


def _emit(result: dict) -> None:
    global _EMITTED
    print(json.dumps(result), flush=True)
    _EMITTED = True


def _emit_stale(reason: str) -> bool:
    """Print the cached last-known-good line, marked stale.  Returns True
    when a line is (already or now) out; False when there is no cache."""
    if _EMITTED:
        return True
    try:
        with open(_CACHE) as f:
            cached = json.load(f)
    except (OSError, ValueError):
        return False
    cached.setdefault("extra", {})
    cached["extra"]["stale_from_cache"] = True
    cached["extra"]["stale_reason"] = reason
    cached["extra"]["cached_at"] = cached.pop("_measured_at", "?")
    _emit(cached)
    return True


def _emit_partial(reason: str) -> bool:
    """Live child: print whatever variants already finished (headline
    required), marked partial.  Returns False if the headline isn't in."""
    if _EMITTED:
        return True
    if "value" not in _PARTIAL:
        return False
    extra = dict(_PARTIAL.get("extra", {}))
    extra["partial"] = True
    extra["partial_reason"] = reason
    _emit({"metric": "train_throughput_A5_smartseq",
           "value": _PARTIAL["value"], "unit": "cells/sec/chip",
           "vs_baseline": _PARTIAL["vs_baseline"], "extra": extra})
    return True


def _install_guards(budget_s: float, partial_first: bool) -> None:
    """SIGTERM/SIGINT/SIGALRM → dump the best available line, exit 0.
    ``signal.alarm`` backstops the budget even if the driver never
    signals.  (If the process is blocked inside a C call — a device
    transfer through a wedged tunnel — handlers cannot run; that case is
    covered by the parent/child split: the parent never touches the
    backend, so IT stays signal-responsive.)"""
    def handler(signum, frame):
        # the parent must not leave its live child running unawares: pass
        # the SIGTERM down (never SIGKILL — a mid-claim hard kill wedges
        # the chip; the child's own handler emits/caches its partial line)
        child = _LIVE_CHILD
        if child is not None and child.poll() is None:
            try:
                child.terminate()
            except OSError:
                pass
        ok = (_emit_partial(f"signal {signum}") if partial_first else False)
        ok = ok or _emit_stale(f"killed by signal {signum} before a "
                               f"live result landed")
        os._exit(0 if ok else 1)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, handler)
    signal.alarm(max(int(budget_s), 1))


def wait_for_backend(budget_s: float, probe_timeout_s: float = 150.0,
                     poll_s: float = 60.0, on_first_failure=None,
                     reserve_s: float = 420.0) -> bool:
    """Wait for the JAX backend to come up, probing in subprocesses.

    The tunneled TPU backend flaps UNAVAILABLE for minutes at a time
    (and a claim interrupted mid-flight wedges the chip for ~15-25 min;
    a HEALTHY cold init can itself take >60 s, hence the 150 s probe
    timeout).  Backend-init failures are cached per-process, so each
    probe runs a tiny end-to-end op in a fresh subprocess; the caller
    only touches the backend after a probe succeeds.

    ``on_first_failure(why)`` fires once, at the first non-success — the
    emit-the-stale-line-immediately hook.  A probe that HANGS is never
    killed (a mid-claim kill is what CREATES the next ~15-25 min wedge —
    observed live 2026-08-19, each killed probe re-wedging the chip for
    the following caller); instead this keeps waiting on the SAME probe,
    which answers within seconds of the tunnel recovering.  A probe that
    fails FAST is retried fresh every ``poll_s``.  Returns False once the
    remaining budget cannot cover a measurement (``reserve_s``), leaving
    any pending probe orphaned — it exits on its own.
    """
    from dvae_tpu.utils.backend_probe import start_probe

    deadline = time.monotonic() + budget_s
    notified = False

    def notify(why: str) -> None:
        nonlocal notified
        if not notified:
            notified = True
            if on_first_failure is not None:
                on_first_failure(why)

    proc = start_probe()
    first = True
    while True:
        # cap every wait slice so a probe success can never land INSIDE
        # the reserve window (a live child launched with <reserve_s left
        # is doomed to die on the alarm backstop).  The shorter wait only
        # raises TimeoutExpired sooner; the probe is never killed.  The
        # FIRST slice gets a small floor even when the budget is already
        # inside the reserve: a fast-FAILING backend must report as such
        # ("probe failed fast"), not be misread as hung by a zero-width
        # check against a probe that hasn't finished starting.
        slice_s = min(probe_timeout_s,
                      deadline - reserve_s - time.monotonic())
        if first:
            slice_s = max(slice_s, 5.0)
            first = False
        try:
            rc = proc.wait(timeout=slice_s)
        except subprocess.TimeoutExpired:
            rc = None
        if rc == 0:
            return True
        if rc is None:  # hung: wait it out on the SAME probe, never kill
            notify("probe hung (waiting it out, not killing)")
            if slice_s <= 0 or time.monotonic() + reserve_s > deadline:
                return False
            print("bench: probe still pending (outage or wedge); waiting "
                  "on it — not killing", file=sys.stderr, flush=True)
            continue
        notify("probe failed fast")  # backend answered with an error
        if time.monotonic() + poll_s + reserve_s > deadline:
            return False
        print(f"bench: JAX backend unavailable, retrying in {poll_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(poll_s)
        proc = start_probe()


def _write_cache(result: dict) -> None:
    """Persist the last-known-good line; extra keys a partial run didn't
    re-measure are carried forward from the previous cache."""
    try:
        with open(_CACHE) as f:
            old = json.load(f)
    except (OSError, ValueError):
        old = {}
    extra = dict(old.get("extra", {}))
    fresh = dict(result.get("extra", {}))
    # stale/partial markers never persist into the cache — strip them from
    # BOTH sides (the parent caches a partial live line verbatim)
    for k in ("stale_from_cache", "stale_reason", "cached_at", "partial",
              "partial_reason", "carried_keys"):
        extra.pop(k, None)
        fresh.pop(k, None)
    # "skipped" describes one specific run — never carry the old run's
    # annotation into a line whose measurements are all fresh
    extra.pop("skipped", None)
    carried = sorted(k for k in extra if k not in fresh)
    extra.update(fresh)
    if carried:
        extra["carried_keys"] = carried
    out = {**result, "extra": extra,
           "_measured_at": time.strftime("%Y-%m-%d %H:%M UTC",
                                         time.gmtime())}
    try:
        with open(_CACHE, "w") as f:
            json.dump(out, f)
    except OSError:
        pass


# --------------------------------------------------------------------------
# live measurement (child process: `bench.py --live --budget S`)
# --------------------------------------------------------------------------

def _throughput(cfg, x_all, augment=None, n_chunks=6, rng_impl="rbg",
                epochs_per_jit=5, keep=False):
    """Steady-state cells/sec/chip of the fused epoch runner for ``cfg``.

    The timed region must be long relative to one host→device dispatch
    round trip (tens of ms on a tunneled chip): the MSE variant runs
    ~2.6 ms steps, so it uses a longer chunk than the 5-8 ms aug/ZINB
    variants.  With ``keep=True`` also returns (run, state,
    steps_per_call, matmul_flops_per_step) so the caller can trace the
    same executable for the device-time census without recompiling.
    """
    import jax
    import numpy as np

    from dvae_tpu.config import TrainConfig
    from dvae_tpu.train.step import (init_train_state, make_epoch_runner,
                                     make_optimizer)

    # shuffle_block=8: the epoch shuffle permutes 8-row blocks, so the
    # batch gather moves contiguous (8, D) slices at HBM bandwidth
    tcfg = TrainConfig(batch_size=B, epochs_per_jit=epochs_per_jit,
                       bf16=True, rng_impl=rng_impl, shuffle_block=8)
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(0), cfg, tx, rng_impl=rng_impl)
    # fwd 2 + bwd 4 FLOPs per weight-element per row; stacked-arm weight
    # tensors are (A, in, out) so .size already includes the arm factor
    # (biases/BN leak in but contribute <0.1%)
    flops = 6.0 * B * sum(
        int(np.prod(w.shape)) for w in jax.tree_util.tree_leaves(state.params)
        if hasattr(w, "ndim") and w.ndim >= 2)
    run = jax.jit(make_epoch_runner(cfg, tcfg, tx, n_train=N,
                                    augment=augment,
                                    consensus_every_epoch=False),
                  donate_argnums=(0,))

    # compile + warmup (np.asarray forces a device→host transfer: on the
    # tunneled axon platform block_until_ready alone does not block).
    # TWO warmup calls: the first compiles; the second absorbs one-time
    # post-compile costs (deferred executable load, the donated state
    # settling into the executable's own aliased/laid-out buffers) that
    # otherwise land on the first timed chunk
    for _ in range(2):
        state, ems = run(state, x_all, None, 1.0)
        np.asarray(ems.total)

    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, ems = run(state, x_all, None, 1.0)
    np.asarray(ems.total)
    dt = time.perf_counter() - t0

    # per chip by construction: the un-meshed runner executes on
    # jax.devices()[0] only, regardless of how many chips the host has
    steps_per_call = epochs_per_jit * (N // B)
    cells = n_chunks * steps_per_call * B / dt
    if keep:
        return cells, (run, state, steps_per_call, flops)
    return cells


def _trace_device_ms(run_once, steps: int) -> float:
    """Trace ONE call of an already-compiled runner and return the per-op
    device self-time per step (xprof op_profile recipe — wall clock
    includes tunnel RTTs; cost_analysis() reports 0 for Pallas calls)."""
    import tempfile

    import jax

    from dvae_tpu.utils.profiling import xplane_total_device_ms

    trace_dir = tempfile.mkdtemp(prefix="bench_census_")
    with jax.profiler.trace(trace_dir):
        run_once()
    return xplane_total_device_ms(trace_dir) / steps


def _device_census(run, state, x_all, steps_per_call, flops_per_step):
    """Device-time census of the headline training runner.
    Returns (device_ms_per_step, mfu_pct, peak_tflops or None)."""
    import jax
    import numpy as np

    def once():
        _, ems = run(state, x_all, None, 1.0)
        np.asarray(ems.total)

    ms = _trace_device_ms(once, steps_per_call)
    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in _PEAK_BF16_TFLOPS if k in kind), None)
    mfu = (100.0 * flops_per_step / (ms / 1e3) / (peak * 1e12)
           if peak else None)
    return ms, mfu, peak


def _stream_throughput(cfg, n_chunks=1):
    """Steady-state cells/sec of the streaming capacity path
    (data/stream.make_streaming_runner) — host-resident dataset,
    double-buffered host→device batches.  On this container the tunnel's
    8-30 MB/s host→device link (not the pipeline) bounds it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.config import TrainConfig
    from dvae_tpu.data.stream import make_streaming_runner
    from dvae_tpu.train.step import init_train_state, make_optimizer

    n_stream = 4 * B  # 4 steps/epoch: enough to reach steady state once
    tcfg = TrainConfig(batch_size=B, bf16=True, rng_impl="rbg", stream=True)
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(0), cfg, tx, rng_impl="rbg")
    x_host = np.maximum(np.random.default_rng(1).normal(
        1.0, 1.0, (n_stream, cfg.input_dim)), 0.0).astype(jnp.bfloat16)
    run = make_streaming_runner(cfg, tcfg, tx, n_train=n_stream)(1)
    state, ems = run(state, x_host, None, 1.0)   # compile + first epoch
    np.asarray(ems.total)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, ems = run(state, x_host, None, 1.0)
        np.asarray(ems.total)
    dt = time.perf_counter() - t0
    return n_chunks * (n_stream // B) * B / dt


def _augment_fn(input_dim: int):
    """Frozen augmenter for the aug-in-loop variant: the TRAINED artifact
    (examples/hard_augmenter — the reference's production configuration,
    train.py:97-113) when its input width matches, else random weights
    (forward cost equals a trained one's).  Weights in bf16 — the bench
    trains in bf16, and f32 weights against bf16 activations would run
    every augmenter matmul at the 3-pass f32 MXU rate."""
    import jax.numpy as jnp

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts", "hard_synthetic", "augmenter_MSE.ckpt")
    try:
        from dvae_tpu.augment.augmenter import (load_augmenter,
                                                make_augment_apply)
        params, bn, acfg = load_augmenter(ckpt)
        if acfg.input_dim == input_dim:
            apply = make_augment_apply(params, bn, acfg, jnp.bfloat16)
            return lambda key, x, n_arm: apply(key, x, n_arm, 0.1)
    except (OSError, KeyError, ValueError):
        pass
    from dvae_tpu.augment.augmenter import frozen_random_augment_fn
    return frozen_random_augment_fn(input_dim, bf16=True)


def _infer_throughput(cfg, x_all, n_chunks=10, keep=False):
    """Serving-path cells/sec: the scanned eval runner (make_eval_runner —
    how eval_model drives batches; reference hot loop
    cpl_mixvae.py:1450-1619) at the production shape, training compute
    dtype (bf16).  K=8 batches per dispatch (eval_model's chunk size on
    large datasets; the 20k-cell training set is tiled to 40k), so the
    tunnel's per-dispatch round trip amortizes; the per-batch device time
    is ~1.05 ms (op_profile --eval, no augmenter)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.config import TrainConfig
    from dvae_tpu.train.step import (init_train_state, make_eval_runner,
                                     make_optimizer)

    tcfg = TrainConfig(batch_size=B, bf16=True, rng_impl="rbg")
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(0), cfg, tx, rng_impl="rbg")
    run = make_eval_runner(cfg, tcfg)
    K = 2 * (N // B)
    chunk = jnp.concatenate([x_all, x_all]).reshape(K, B, *x_all.shape[1:])
    for _ in range(2):
        aux, f = run(state, chunk, 1.0)
        np.asarray(f.lab)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        aux, f = run(state, chunk, 1.0)
    np.asarray(f.lab)
    dt = time.perf_counter() - t0
    cells = n_chunks * K * B / dt  # single-device runner: per chip as-is
    if keep:
        def once():
            _, ff = run(state, chunk, 1.0)
            np.asarray(ff.lab)
        return cells, (once, K)
    return cells


def _live_main(budget_s: float) -> None:
    """The measurement process.  Emits ONE fresh line (or, on signal /
    alarm, a partial line with whatever landed), and updates the cache."""
    _install_guards(budget_s + 30, partial_first=True)
    deadline = time.monotonic() + budget_s

    def left() -> float:
        return deadline - time.monotonic()

    import jax  # noqa: F401  (backend init happens on first use)
    import numpy as np

    from dvae_tpu.config import VAEConfig
    from dvae_tpu.parallel.sharding import put_dataset
    from dvae_tpu.utils.tools import enable_compile_cache
    import jax.numpy as jnp

    # warm-start the executables from the persistent cache (a cold remote
    # production-shape compile can eat most of the budget)
    enable_compile_cache()

    # production defaults (C=92, D=5032, F=100) + the fused recon-loss and
    # dropout+fc1 kernels (ops/recon_pallas.py, ops/encoder_pallas.py): no
    # (A, B, D) tensor — reconstruction, its cotangent, or dropped input
    # views — ever touches HBM, and the binarized-BCE metric term is free
    cfg = VAEConfig(n_arm=5, fused_recon=True, fused_encoder=True)
    rng = np.random.default_rng(0)
    # bf16 mode stores the dataset in bf16 (halves gather traffic); rbg keys
    # use the TPU hardware RNG for the dropout/gumbel/reparam draws.
    # put_dataset commits the array row-major — the on-device bf16 convert
    # otherwise lands column-major and each runner call pays a relayout
    x_all = put_dataset(
        np.maximum(rng.normal(1.0, 1.0, (N, cfg.input_dim)), 0.0),
        jnp.bfloat16)

    extra = _PARTIAL.setdefault("extra", {})
    skipped = []

    per_chip, handle = _throughput(cfg, x_all, n_chunks=8, epochs_per_jit=10,
                                   keep=True)
    _PARTIAL["value"] = round(per_chip, 1)
    _PARTIAL["vs_baseline"] = round(per_chip / BASELINE_CELLS_PER_SEC, 3)
    print(f"bench: headline {per_chip:,.0f} cells/s ({left():.0f}s left)",
          file=sys.stderr, flush=True)

    # device-time census right away (reuses the compiled headline runner):
    # the dispatch-free figure must survive even a budget-truncated run
    if left() > 120:
        try:
            ms, mfu, peak = _device_census(*handle[:2], x_all, *handle[2:])
            extra["device_ms_per_step"] = round(ms, 3)
            extra["device_cells_per_sec"] = round(B / (ms / 1e3), 1)
            extra["model_tflop_per_step"] = round(handle[3] / 1e12, 4)
            if mfu is not None:
                extra["mfu_pct"] = round(mfu, 2)
                extra["peak_tflops_assumed"] = peak
        except Exception as e:  # census is best-effort: never lose the line
            skipped.append(f"device_census: {type(e).__name__}: {e}")
    else:
        skipped.append("device_census: budget")
    del handle

    for name, need, fn in (
            ("train_throughput_A5_smartseq_aug", 300,
             lambda: _throughput(cfg, x_all,
                                 augment=_augment_fn(cfg.input_dim),
                                 n_chunks=3)),
            ("train_throughput_A5_zinb", 300,
             lambda: _throughput(cfg.replace(mode="ZINB"), n_chunks=3,
                                 x_all=x_all)),
    ):
        if left() < need:
            skipped.append(f"{name}: budget")
            continue
        try:
            extra[name] = round(fn(), 1)
            print(f"bench: {name} {extra[name]:,.0f} cells/s "
                  f"({left():.0f}s left)", file=sys.stderr, flush=True)
        except Exception as e:
            skipped.append(f"{name}: {type(e).__name__}: {e}")

    # streaming capacity path: the e2e number (tunnel-bound liveness) plus
    # the ENVIRONMENT-INDEPENDENT feed census — host gather cost per batch
    # and the predicted overlap vs the measured device step (the figure
    # that transfers to real hardware; data/stream.feed_census)
    if left() < 240:
        skipped.append("train_throughput_A5_stream: budget")
    else:
        try:
            extra["train_throughput_A5_stream"] = round(
                _stream_throughput(cfg), 1)
            print(f"bench: train_throughput_A5_stream "
                  f"{extra['train_throughput_A5_stream']:,.0f} cells/s "
                  f"({left():.0f}s left)", file=sys.stderr, flush=True)
        except Exception as e:
            skipped.append(
                f"train_throughput_A5_stream: {type(e).__name__}: {e}")
    try:
        from dvae_tpu.data.stream import feed_census
        xh = np.maximum(np.random.default_rng(2).normal(
            1.0, 1.0, (4 * B, cfg.input_dim)), 0.0).astype(np.float32)
        fc = feed_census(xh, B, dtype=jnp.bfloat16, commit=False,
                         device_ms_per_step=extra.get("device_ms_per_step"),
                         link_gbps=16.0)
        extra["stream_host_gather_ms"] = fc["host_gather_ms"]
        if "predicted_overlap_pct" in fc:
            extra["stream_overlap_pct_this_host"] = fc[
                "predicted_overlap_pct"]
            extra["stream_bound_by"] = fc["bound_by"]
    except Exception as e:
        skipped.append(f"stream_feed_census: {type(e).__name__}: {e}")

    # serving path + its own device census: eval regressions must be
    # attributable dispatch-free, like training's device_ms_per_step.
    # BOTH loss modes: the reference's eval_model is equally a ZINB
    # consumer (cpl_mixvae.py:1450-1619 with loss_mode='ZINB'); the ZINB
    # eval step runs the fwd-only fused kernel (unrolled scan — the
    # SMEM-output rule, ops/zinb_pallas.py)
    for suffix, ecfg, need in (("", cfg, 200),
                               ("_zinb", cfg.replace(mode="ZINB"), 180)):
        if left() < need:
            skipped.append(f"infer_throughput_A5{suffix}: budget")
            continue
        try:
            cells_i, (once, K) = _infer_throughput(ecfg, x_all, keep=True)
            extra[f"infer_throughput_A5{suffix}"] = round(cells_i, 1)
            print(f"bench: infer_throughput_A5{suffix} {cells_i:,.0f} "
                  f"cells/s ({left():.0f}s left)", file=sys.stderr,
                  flush=True)
            if left() > 90:
                extra[f"eval_device_ms_per_batch{suffix}"] = round(
                    _trace_device_ms(once, K), 3)
            else:
                skipped.append(f"eval_device_census{suffix}: budget")
        except Exception as e:
            skipped.append(
                f"infer_throughput_A5{suffix}: {type(e).__name__}: {e}")
    for k, rk in (("train_throughput_A5_smartseq_aug", "aug_vs_baseline"),
                  ("train_throughput_A5_zinb", "zinb_vs_baseline")):
        if k in extra:
            extra[rk] = round(extra[k] / BASELINE_CELLS_PER_SEC, 3)

    # projected 16-chip slice throughput (the driver target regime,
    # BASELINE.json: v5e-16) from the measured device step + the ring
    # model (parallel/collective_cost.py; README "Collective cost"):
    # weak scaling (B=5000 rows/chip), ddp default strategy (one f32
    # gradient all-reduce across g=16 chips), v5e ICI ~90 GB/s/direction.
    # Ceiling = collectives fully hidden behind the backward matmuls
    # (XLA's latency-hiding scheduler; where reality sits), floor = fully
    # serialized wire time — the honest worst case.
    if "device_ms_per_step" in extra:
        ms = extra["device_ms_per_step"]
        n_elems = extra["model_tflop_per_step"] * 1e12 / (6.0 * B)
        g = 16
        wire_ms = 2.0 * (g - 1) / g * n_elems * 4 / 90e9 * 1e3
        extra["projected_v5e16_wire_ms_per_step"] = round(wire_ms, 3)
        extra["projected_v5e16_cells_per_sec_per_chip_floor"] = round(
            B / ((ms + wire_ms) / 1e3), 1)
        extra["projected_v5e16_cells_per_sec_per_chip_ceiling"] = round(
            B / (ms / 1e3), 1)
    if skipped:
        extra["skipped"] = skipped

    result = {"metric": "train_throughput_A5_smartseq",
              "value": _PARTIAL["value"], "unit": "cells/sec/chip",
              "vs_baseline": _PARTIAL["vs_baseline"], "extra": extra}
    _write_cache(result)
    _emit(result)


# --------------------------------------------------------------------------
# driver entry (parent process: never touches the backend)
# --------------------------------------------------------------------------

def _run_live_child(budget_s: float):
    """Spawn `bench.py --live` and return its final parsed JSON line (the
    partial line if the child died mid-run), or None.  The parent stays
    out of C-blocking backend calls, so its signal handlers always run."""
    global _LIVE_CHILD, _ORPHANED_PID
    cmd = [sys.executable, os.path.abspath(__file__), "--live",
           f"--budget={max(budget_s - 45, 60):.0f}"]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
    _LIVE_CHILD = proc
    try:
        out, _ = proc.communicate(timeout=max(budget_s - 20, 75))
    except subprocess.TimeoutExpired:
        proc.terminate()  # child's SIGTERM handler emits its partial line
        try:
            out, _ = proc.communicate(timeout=45)
        except subprocess.TimeoutExpired:
            # NEVER SIGKILL a live TPU process: a mid-claim hard kill
            # wedges the chip for ~15-25 min.  A child still alive here is
            # blocked inside a C call (wedged transfer); its SIGTERM/alarm
            # handlers fire the moment that call returns or the backend
            # grant expires, and it exits on its own.  Leave it orphaned
            # and say so in the emitted line.
            _ORPHANED_PID = proc.pid
            out = ""
    finally:
        _LIVE_CHILD = None
    return _parse_last_json(out or "")


def _parse_last_json(out: str):
    """Last parseable result line in ``out`` (the child may print a partial
    line on SIGTERM and a fresh one later; the last wins), or None."""
    for line in reversed(out.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except ValueError:
                continue
            if "metric" in parsed and "value" in parsed:
                return parsed
    return None


def _cache_is_warm() -> bool:
    """True when the persistent compile cache already holds the headline
    runner's executable — a live measurement then needs ~2 min of healthy
    chip (backend init + cache load + timed chunks) instead of a cold
    multi-minute remote compile, so the parent can keep probing deeper
    into the budget before giving up on a fresh line."""
    d = os.environ.get("DVAE_COMPILE_CACHE", "")
    if d == "0":
        return False
    d = d or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
    return bool(glob.glob(os.path.join(d, "jit_run_epochs-*")))


def main() -> None:
    if "--live" in sys.argv:
        budget = next((float(a.split("=", 1)[1]) for a in sys.argv
                       if a.startswith("--budget=")), 900.0)
        _live_main(budget)
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", "1140"))
    deadline = time.monotonic() + budget
    _install_guards(budget + 60, partial_first=False)

    reserve = float(os.environ.get("BENCH_RESERVE_S", "0")) or (
        240.0 if _cache_is_warm() else 420.0)
    ok = wait_for_backend(
        budget_s=budget,
        probe_timeout_s=float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "150")),
        reserve_s=reserve,
        on_first_failure=lambda why: _emit_stale(f"backend outage: {why}"))
    if not ok:
        if not _emit_stale("backend never came up within the budget"):
            raise RuntimeError("JAX backend unavailable and no cached result")
        return

    fresh = _run_live_child(deadline - time.monotonic())
    if fresh is not None:
        _emit(fresh)  # supersedes any stale line printed at probe time
        if fresh.get("extra", {}).get("partial"):
            _write_cache(fresh)  # child died before caching; merge-carry
    else:
        why = "live measurement produced no output"
        if _ORPHANED_PID is not None:
            why += (f" (live child pid {_ORPHANED_PID} blocked in a C call;"
                    f" left to exit via its own SIGTERM/alarm — not"
                    f" SIGKILLed, which would wedge the chip)")
        if not _emit_stale(why):
            raise RuntimeError("live measurement failed and no cached result")


if __name__ == "__main__":
    main()
