"""Consensus-metric tests: fast-vs-naive oracles (reference tests/test_utils.py idiom)."""

import numpy as np
import pytest

from dvae_tpu.eval.metrics import (
    classify,
    compute_confmat,
    compute_confmat_naive,
    confmat_mean,
    confmat_normalize,
    confmat_normalize_naive,
    consensus_device,
    consensus_from_labels,
    ecdf,
    parse_epoch,
    reassign,
)

rng = np.random.default_rng(0)


def test_confmat_matches_naive():
    for n, k in [(100, 5), (5000, 92), (17, 3)]:
        l1 = rng.integers(0, k, n).astype(np.int64)
        l2 = rng.integers(0, k, n).astype(np.int64)
        np.testing.assert_allclose(
            compute_confmat(l1, l2, k), compute_confmat_naive(l1, l2, k))


def test_confmat_infers_k():
    l1 = np.array([0, 1, 2, 2], dtype=np.int64)
    l2 = np.array([0, 1, 1, 1], dtype=np.int64)
    cm = compute_confmat(l1, l2)
    assert cm.shape == (3, 3)
    assert cm[2, 1] == 2


def test_confmat_normalize_matches_naive():
    cm = rng.random((37, 37)) * 10
    np.testing.assert_allclose(confmat_normalize(cm), confmat_normalize_naive(cm))


def test_confmat_normalize_zero_safe():
    cm = np.zeros((4, 4))
    out = confmat_normalize(cm)
    assert np.all(out == 0)


def test_perfect_agreement_consensus():
    labels = rng.integers(0, 10, 1000).astype(np.int64)
    cm = confmat_normalize(compute_confmat(labels, labels, 10))
    assert confmat_mean(cm) == pytest.approx(1.0)


def test_consensus_from_labels_pairs():
    labels = np.stack([rng.integers(0, 8, 500) for _ in range(3)]).astype(np.int64)
    s = consensus_from_labels(labels, 8)
    assert 0.0 <= s <= 1.0
    ident = np.stack([labels[0]] * 3)
    assert consensus_from_labels(ident, 8) == pytest.approx(1.0)


def test_consensus_device_matches_host():
    import jax.numpy as jnp
    labels = np.stack([rng.integers(0, 12, 700) for _ in range(4)]).astype(np.int64)
    host = consensus_from_labels(labels, 12)
    dev = float(consensus_device(jnp.asarray(labels), 12))
    assert dev == pytest.approx(host, abs=1e-5)


def test_reassign_maximizes_diagonal():
    x = np.eye(6)[:, ::-1] * 5.0  # anti-diagonal
    out = reassign(x)
    np.testing.assert_allclose(np.diag(out), 5.0)


def test_classify_and_ecdf():
    probs = np.array([[0.1, 0.9], [0.8, 0.2]])
    np.testing.assert_array_equal(classify(probs), [1, 0])
    np.testing.assert_allclose(ecdf(np.array([0, 0, 1, 1])), [0.5, 0.5])


def test_parse_epoch():
    assert parse_epoch("cpl_mixVAE_model_epoch_420.pth") == 420
    assert parse_epoch("nonsense") == "nonsense"


def test_consensus_active_only_removes_structural_ceiling():
    """With perfect agreement on only k of K categories, the reference
    metric caps at k/K while the active-only variant reads 1.0."""
    import jax.numpy as jnp
    from dvae_tpu.eval.metrics import consensus_device

    rng = np.random.default_rng(0)
    k, K, N = 5, 20, 400
    lab = rng.integers(0, k, N)
    labels = jnp.asarray(np.stack([lab, lab]))
    full = float(np.asarray(consensus_device(labels, K)))
    active = float(np.asarray(consensus_device(labels, K,
                                               active_only=True)))
    assert full == pytest.approx(k / K)
    assert active == pytest.approx(1.0)


def test_mk_masks_splits_active_and_pruned():
    bias = np.array([0.5, 0.0, -1.2, 0.0, 3.0])
    active, pruned = __import__("dvae_tpu.eval.metrics",
                                fromlist=["mk_masks"]).mk_masks(bias)
    assert list(active) == [0, 2, 4]
    assert list(pruned) == [1, 3]


def test_time_function_returns_elapsed_seconds():
    from dvae_tpu.eval.metrics import time_function
    import time
    dt = time_function(time.sleep, 0.01)
    assert dt >= 0.01


def test_unstable_warns_futurewarning():
    from dvae_tpu.eval.metrics import unstable

    @unstable
    def f(x):
        return x + 1

    with pytest.warns(FutureWarning, match="unstable"):
        assert f(1) == 2
