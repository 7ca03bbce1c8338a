"""Streaming-path overlap instrumentation (data/stream.py: record_stats +
feed_census) — the environment-independent capacity figures.

The end-to-end streaming number on this container is bound by the dev
tunnel's host→device link, which predicts nothing about real hardware.
What transfers is (a) the ISSUE-AHEAD INVARIANT — the streamer always
keeps the prefetch window full, so with JAX's async dispatch the
host-side gather and the DMA run while the device computes — and (b) the
three-stage pipeline bound feed_census computes from measured host cost
+ assumed link + measured device step time.
"""

import numpy as np
import pytest

from dvae_tpu.data.stream import BatchStreamer, feed_census


@pytest.fixture()
def x():
    return np.random.default_rng(0).random((2048, 64), np.float32)


def test_issue_ahead_invariant(x):
    """The pipeline must never let the in-flight window drain below
    min(remaining, prefetch+1) — the structural fact the overlap
    prediction rests on."""
    for prefetch in (1, 2, 3):
        bs = BatchStreamer(x, 256, prefetch=prefetch, record_stats=True)
        steps = bs.steps_per_epoch
        n = 0
        for _ in bs.epoch(0):
            n += 1
        assert n == steps
        assert bs.stats.ahead == [
            min(steps - i, prefetch + 1) for i in range(steps)]
        assert len(bs.stats.gather_s) == steps
        assert all(t >= 0 for t in bs.stats.gather_s)


def test_stats_off_by_default(x):
    bs = BatchStreamer(x, 256)
    assert bs.stats is None
    assert sum(1 for _ in bs.epoch(0)) == bs.steps_per_epoch


def test_feed_census_compute_bound_fully_overlapped(x):
    """When the device step dominates the feed stages (the production
    regime: 2.5 ms step vs sub-ms gather on a real multi-core host), the
    feed must be predicted fully hidden."""
    out = feed_census(x, 256, device_ms_per_step=50.0, link_gbps=16.0)
    assert out["predicted_overlap_pct"] == 100.0
    assert out["bound_by"] == "device"
    assert out["batch_mb"] == pytest.approx(256 * 64 * 4 / 1e6, abs=0.006)
    assert out["host_gather_ms"] >= 0
    assert out["link_ms"] == pytest.approx(256 * 64 * 4 / 1e6 / 16.0,
                                           abs=5e-4)


def test_feed_census_feed_bound_reports_below_100(x):
    """A device step faster than the feed stages cannot be fully
    overlapped — the census must say so instead of flattering."""
    out = feed_census(x, 256, device_ms_per_step=1e-6, link_gbps=0.001)
    assert out["predicted_overlap_pct"] < 100.0
    assert out["bound_by"] in ("host", "link")


def test_feed_census_respects_cast_dtype(x):
    import jax.numpy as jnp

    out = feed_census(x, 256, dtype=jnp.bfloat16)
    assert out["batch_mb"] == pytest.approx(256 * 64 * 2 / 1e6, abs=0.006)


def test_feed_census_commit_false_never_touches_device(x, monkeypatch):
    """The host-cost-only mode (what bench runs through the tunnel) must
    not device_put anything."""
    import jax

    def boom(*a, **k):
        raise AssertionError("device_put called in commit=False census")

    monkeypatch.setattr(jax, "device_put", boom)
    out = feed_census(x, 256, commit=False, device_ms_per_step=50.0)
    assert "commit_ms" not in out
    assert out["predicted_overlap_pct"] == 100.0
