"""Consensus / confusion-matrix metrics — the quality kernel of the project.

Equivalent capability to the reference ``mmidas/_utils.py``:
  * ``compute_confmat``        — :83-93 (vectorized np.add.at)
  * ``confmat_normalize``      — :96-98
  * ``compute_confmat_naive``  — :101-112 (oracle)
  * ``confmat_mean``           — :127-128 (mean diagonal = consensus)
  * ``classify``               — :78-79
  * ``reassign``               — :69-71 (Hungarian relabeling)
  * ``ecdf``                   — :280-282
  * ``parse_epoch``            — :289-293

plus device-side variants: on TPU the confusion matrix is a one-hot matmul
(B,C)ᵀ(B,C) → (C,C) on the MXU, so consensus can be accumulated inside the
jitted epoch without ever shipping per-sample labels to the host (the
reference instead runs per-sample python loops in its hot path,
mmidas/cpl_mixvae.py:802-818).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

try:  # optional native fast path (see native/host_ops.cpp)
    from dvae_tpu.utils import host_ops as _host_ops
except Exception:  # pragma: no cover
    _host_ops = None


# ---------------------------------------------------------------------------
# Host (numpy) implementations
# ---------------------------------------------------------------------------

def classify(probs: np.ndarray) -> np.ndarray:
    """argmax over the last axis."""
    return np.argmax(probs, axis=-1)


def time_function(f, *a, **kw) -> float:
    """Seconds taken by ``f(*a, **kw)`` (reference ``_utils.time_function``,
    mmidas/_utils.py:43-50).  For device code, remember to synchronize
    inside ``f`` (np.asarray the result) or the dispatch returns early."""
    import time
    tic = time.perf_counter()
    f(*a, **kw)
    return time.perf_counter() - tic


def unstable(func):
    """Mark an API as unstable: warns FutureWarning on every call
    (reference ``_utils.unstable``, mmidas/_utils.py:53-61)."""
    import functools
    import warnings

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        warnings.warn(f"{func.__name__}() is unstable",
                      category=FutureWarning, stacklevel=2)
        return func(*args, **kwargs)

    return wrapper


def mk_masks(bias: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(active indices, pruned indices) of a bias/mask vector — categories
    with zero bias are the pruned ones (reference ``_utils.mk_masks``,
    mmidas/_utils.py:74-75; consumed by the pruning workflow to recover
    which categories a loaded checkpoint had pruned)."""
    bias = np.asarray(bias)
    return np.where(bias != 0)[0], np.where(bias == 0)[0]


def compute_confmat(labels1: np.ndarray, labels2: np.ndarray,
                    K: int | None = None) -> np.ndarray:
    """K×K co-occurrence matrix of two label vectors.

    If ``K`` is None it is inferred as the larger unique-label count of the
    two arrays (all labels assumed present), matching the reference contract.
    """
    assert labels1.shape == labels2.shape and labels1.ndim == 1
    labels1 = labels1.astype(np.int64, copy=False)
    labels2 = labels2.astype(np.int64, copy=False)
    if K is None:
        K = max(len(np.unique(labels1)), len(np.unique(labels2)))
    if _host_ops is not None and _host_ops.available():
        return _host_ops.confmat(labels1, labels2, K)
    # single bincount over fused index — faster than np.add.at
    idx = labels1 * K + labels2
    return np.bincount(idx, minlength=K * K).reshape(K, K).astype(np.float64)


def compute_confmat_naive(labels1: np.ndarray, labels2: np.ndarray,
                          K: int | None = None) -> np.ndarray:
    """Per-sample loop oracle."""
    assert labels1.shape == labels2.shape and labels1.ndim == 1
    if K is None:
        K = max(len(np.unique(labels1)), len(np.unique(labels2)))
    m = np.zeros((K, K))
    for i in range(len(labels1)):
        m[int(labels1[i]), int(labels2[i])] += 1
    return m


def confmat_normalize(cm: np.ndarray) -> np.ndarray:
    """Divide column j by max(row_j sum, col_j sum); 0 where the max is 0."""
    maxes = np.maximum(np.sum(cm, axis=0), np.sum(cm, axis=1))
    return np.divide(cm, maxes, out=np.zeros_like(cm, dtype=np.float64),
                     where=maxes != 0)


def confmat_normalize_naive(cm: np.ndarray) -> np.ndarray:
    axis_maxes = []
    for k in range(cm.shape[0]):
        axis_maxes.append(max(np.sum(cm[k, :]), np.sum(cm[:, k])))
    axis_maxes = np.array(axis_maxes)
    return np.divide(cm, axis_maxes, out=np.zeros_like(cm, dtype=np.float64),
                     where=axis_maxes != 0)


def confmat_mean(cm: np.ndarray) -> float:
    """Mean of the diagonal — the consensus score."""
    return float(np.mean(np.diag(cm)))


def consensus_from_labels(labels: np.ndarray, K: int) -> float:
    """Mean pairwise consensus over all arm pairs.

    ``labels``: (A, N) integer cluster assignments per arm.
    Reference pattern: mmidas/cpl_mixvae.py:512-525.
    """
    A = labels.shape[0]
    if A < 2:
        return 1.0
    if _host_ops is not None and _host_ops.available():
        mean, _ = _host_ops.pairwise_consensus(labels, K)
        return mean
    scores = []
    for a in range(A):
        for b in range(a + 1, A):
            cm = compute_confmat(labels[a], labels[b], K)
            scores.append(confmat_mean(confmat_normalize(cm)))
    return float(np.mean(scores)) if scores else 1.0


def per_category_agreement(labels: np.ndarray, K: int) -> np.ndarray:
    """(K,) mean-over-arm-pairs per-category consensus.

    The diagonal of the normalized confusion matrix, averaged over all arm
    pairs — the pruning criterion of the reference
    (build/lib/mmidas/cpl_mixvae.py:355-391: ``c_agreement``).
    ``labels``: (A, N) integer cluster assignments.
    """
    A = labels.shape[0]
    if A < 2:
        return np.ones(K)
    if _host_ops is not None and _host_ops.available():
        return _host_ops.per_category_agreement(labels, K)
    diags = []
    for a in range(A):
        for b in range(a + 1, A):
            cm = compute_confmat(labels[a], labels[b], K)
            diags.append(np.diag(confmat_normalize(cm)))
    return np.mean(diags, axis=0)


def reassign(x: np.ndarray) -> np.ndarray:
    """Permute columns by the Hungarian algorithm to maximize the diagonal."""
    _, col_inds = linear_sum_assignment(-x)
    return x[:, col_inds]


def ecdf(labels: np.ndarray) -> np.ndarray:
    """Empirical class frequencies (labels assumed dense 0..K-1)."""
    assert labels.ndim == 1
    return np.bincount(labels) / len(labels)


def no_ext(text: str) -> str:
    return "".join(text.split(".")[:-1])


def parse_epoch(s: str):
    """Extract the epoch number from a checkpoint filename."""
    try:
        return int(no_ext(s).split("_epoch_")[-1])
    except (ValueError, IndexError):
        return s


# ---------------------------------------------------------------------------
# Device (JAX) implementations — used inside jitted epoch loops
# ---------------------------------------------------------------------------

def confmat_device(labels1, labels2, K: int):
    """(C,C) confusion matrix as a one-hot matmul — MXU-friendly.

    jit-safe; ``labels*`` are integer arrays of equal length.
    """
    oh1 = jax.nn.one_hot(labels1, K, dtype=jnp.float32)
    oh2 = jax.nn.one_hot(labels2, K, dtype=jnp.float32)
    return oh1.T @ oh2


def pairwise_confmats_device(labels, K: int):
    """All-pairs confusion matrices for (A, N) device labels.

    Returns (A, A, K, K); only the a<b triangle is meaningful.
    One einsum → batched MXU matmuls.
    """
    oh = jax.nn.one_hot(labels, K, dtype=jnp.float32)  # (A, N, K)
    return jnp.einsum("ank,bnm->abkm", oh, oh,
                      preferred_element_type=jnp.float32)


def consensus_device_both(labels, K: int):
    """(reference consensus, active-only consensus) in ONE device pass.

    ``labels``: (A, N) ints.  The expensive part — the (A, A, K, K)
    pairwise confusion matrices (one-hot MXU einsums) — is shared; the
    two variants differ only in the diagonal's denominator.  The first is
    the reference metric (mean diagonal over all K categories,
    mmidas/_utils.py:127), with its structural n_used/K ceiling; the
    second averages over categories with any support in the pair,
    removing that ceiling (a TPU-build extension).
    """
    A = labels.shape[0]
    if A * (A - 1) // 2 == 0:
        one = jnp.asarray(1.0)
        return one, one
    cms = pairwise_confmats_device(labels, K)          # (A, A, K, K)
    col = jnp.sum(cms, axis=-2)                        # (A, A, K)
    row = jnp.sum(cms, axis=-1)                        # (A, A, K)
    maxes = jnp.maximum(col, row)
    diag = jnp.diagonal(cms, axis1=-2, axis2=-1)       # (A, A, K)
    norm_diag = jnp.where(maxes != 0, diag / jnp.where(maxes == 0, 1, maxes), 0.0)
    iu = jnp.triu_indices(A, k=1)
    per_pair_all = jnp.mean(norm_diag, axis=-1)        # (A, A)
    n_active = jnp.maximum(jnp.sum(maxes != 0, axis=-1), 1)
    per_pair_active = jnp.sum(norm_diag, axis=-1) / n_active
    return jnp.mean(per_pair_all[iu]), jnp.mean(per_pair_active[iu])


def consensus_device(labels, K: int, active_only: bool = False):
    """Mean pairwise consensus, fully on device. ``labels``: (A, N) ints.

    One variant of ``consensus_device_both`` — callers needing both
    should use that (one confusion-matrix pass instead of two)."""
    both = consensus_device_both(labels, K)
    return both[1] if active_only else both[0]


def set_seeds(s: int) -> None:
    """Seed every host-side RNG the framework touches (reference
    ``_utils.set_seeds`` :34-40: torch/cuda/numpy/random/PYTHONHASHSEED).

    JAX device RNG is keyed explicitly (``jax.random.key``) so only the
    host-side generators need global seeding here; pass ``s`` to
    ``TrainConfig.seed`` for the device side.
    """
    import os
    import random

    np.random.seed(s)
    random.seed(s)
    os.environ["PYTHONHASHSEED"] = str(s)


def mapv(f, assocs):
    """Map ``f`` over the values of (k, v) pairs (reference ``_utils.mapv``
    :30-31)."""
    from itertools import starmap

    return starmap(lambda k, v: (k, f(v)), assocs)


def compose(*fs):
    """Right-to-left variadic function composition (reference
    ``_utils.compose`` :23-27, incl. the inner ``compose2``)."""
    from functools import reduce

    def compose2(f, g):
        return lambda *a, **kw: f(g(*a, **kw))

    return reduce(compose2, fs)
