"""Native host-ops vs numpy oracle tests (+ a timing sanity check)."""

import time

import numpy as np
import pytest

from dvae_tpu.eval import metrics
from dvae_tpu.utils import host_ops

pytestmark = pytest.mark.skipif(not host_ops.available(),
                                reason="native toolchain unavailable")

rng = np.random.default_rng(9)


def test_confmat_matches_numpy():
    for n, k in [(1000, 7), (5000, 92)]:
        l1 = rng.integers(0, k, n)
        l2 = rng.integers(0, k, n)
        native = host_ops.confmat(l1, l2, k)
        ref = metrics.compute_confmat_naive(l1, l2, k)
        np.testing.assert_allclose(native, ref)


def test_normalize_matches_numpy():
    cm = rng.random((30, 30)) * 10
    np.testing.assert_allclose(host_ops.confmat_normalize(cm),
                               metrics.confmat_normalize(cm))


def test_pairwise_consensus_matches_python_loop():
    labels = rng.integers(0, 12, (4, 3000))
    mean, scores = host_ops.pairwise_consensus(labels, 12)
    # python-loop oracle
    vals = []
    for a in range(4):
        for b in range(a + 1, 4):
            cm = metrics.compute_confmat_naive(labels[a], labels[b], 12)
            vals.append(metrics.confmat_mean(metrics.confmat_normalize(cm)))
    assert mean == pytest.approx(np.mean(vals))
    assert scores[0, 1] == pytest.approx(vals[0])
    np.testing.assert_allclose(scores, scores.T)


def test_per_category_agreement_matches_numpy():
    labels = rng.integers(0, 9, (3, 2000))
    native = host_ops.per_category_agreement(labels, 9)
    diags = []
    for a in range(3):
        for b in range(a + 1, 3):
            cm = metrics.compute_confmat_naive(labels[a], labels[b], 9)
            diags.append(np.diag(metrics.confmat_normalize(cm)))
    np.testing.assert_allclose(native, np.mean(diags, axis=0))


def test_metrics_dispatch_uses_native():
    """The public metric functions agree with their own numpy fallback."""
    labels = rng.integers(0, 10, (3, 5000))
    fast = metrics.consensus_from_labels(labels, 10)
    # force the numpy path
    saved = metrics._host_ops
    metrics._host_ops = None
    try:
        slow = metrics.consensus_from_labels(labels, 10)
    finally:
        metrics._host_ops = saved
    assert fast == pytest.approx(slow)


def test_native_is_not_slower():
    labels = rng.integers(0, 92, (5, 20000))
    t0 = time.perf_counter()
    host_ops.pairwise_consensus(labels, 92)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for a in range(5):
        for b in range(a + 1, 5):
            metrics.confmat_mean(metrics.confmat_normalize(
                metrics.compute_confmat(labels[a], labels[b], 92)))
    t_numpy = time.perf_counter() - t0
    print(f"native {t_native*1e3:.2f} ms vs numpy {t_numpy*1e3:.2f} ms")
    assert t_native < t_numpy * 3  # sanity; typically ~2-10x faster


def test_emi_binary_matches_numpy():
    """Native hypergeometric EMI == the numpy windowed-sum implementation
    (the E[MI] term of eval/evaluate.mutinfo)."""
    if not host_ops.has_emi():
        pytest.skip("native emi_binary unavailable")
    from dvae_tpu.eval.evaluate import _emi_cell, _lngamma_table

    N = 3000
    tf = rng.integers(0, N, 7)
    pc = rng.integers(1, N, 9)
    T = _lngamma_table(N)
    ref = (_emi_cell(tf[:, None], pc[None, :], N, T)
           + _emi_cell(tf[:, None], N - pc[None, :], N, T)
           + _emi_cell(N - tf[:, None], pc[None, :], N, T)
           + _emi_cell(N - tf[:, None], N - pc[None, :], N, T))
    got = host_ops.emi_binary(tf, pc, N)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_gather_rows_bf16_fused_matches_numpy():
    """Native fused gather+f32→bf16 cast == numpy gather-then-astype,
    bit-exact (round-to-nearest-even, the ml_dtypes convention)."""
    if not host_ops.has_gather():
        pytest.skip("native gather unavailable")
    import ml_dtypes

    src = rng.normal(1.0, 2.0, (200, 37)).astype(np.float32)
    src[0, :5] = [np.nan, np.inf, -np.inf, 0.0, -0.0]
    sel = rng.permutation(200)[:64]
    got = host_ops.gather_rows(src, sel, ml_dtypes.bfloat16)
    ref = src[sel].astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got.view(np.uint16), ref.view(np.uint16))


def test_gather_rows_copy_matches_numpy():
    if not host_ops.has_gather():
        pytest.skip("native gather unavailable")
    src = rng.normal(0.0, 1.0, (100, 16)).astype(np.float32)
    sel = rng.integers(0, 100, 48)
    got = host_ops.gather_rows(src, sel, None, n_threads=2)
    np.testing.assert_array_equal(got, src[sel])


def test_gather_rows_declines_unsupported():
    if not host_ops.has_gather():
        pytest.skip("native gather unavailable")
    src = rng.normal(0.0, 1.0, (10, 4)).astype(np.float64)
    # f64 → bf16 has no fused kernel: caller must fall back
    import ml_dtypes
    assert host_ops.gather_rows(src, np.arange(3), ml_dtypes.bfloat16) is None
    # non-contiguous source
    assert host_ops.gather_rows(
        np.asfortranarray(src.astype(np.float32)), np.arange(3), None,
        n_threads=2) is None


def test_stream_native_gather_identical_batches():
    """BatchStreamer with the native gather yields bit-identical batches
    to the numpy path (same shuffle stream, same bf16 rounding)."""
    if not host_ops.has_gather():
        pytest.skip("native gather unavailable")
    import jax.numpy as jnp

    from dvae_tpu.data.stream import BatchStreamer

    x = np.maximum(rng.normal(1.0, 1.0, (96, 24)), 0).astype(np.float32)
    a = BatchStreamer(x, 32, seed=5, dtype=jnp.bfloat16, native=True)
    b = BatchStreamer(x, 32, seed=5, dtype=jnp.bfloat16, native=False)
    for ba, bb in zip(a.epoch(0), b.epoch(0)):
        np.testing.assert_array_equal(
            np.asarray(ba.x).view(np.uint16),
            np.asarray(bb.x).view(np.uint16))
