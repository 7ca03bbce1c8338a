"""Inference summaries, cross-run reproducibility, and north-star metrics.

Equivalent capability to the reference's offline science layer:
  * ``summarize_inference``  — mmidas/eval_models.py:8-134 (load checkpoint,
    batched eval, consensus + armA_vs_armB confusion matrices, summary dict)
  * ``evals2``               — mmidas/_evals.py:8-230 (within-run and
    between-run consensus / L2 matrices over all arm pairs of two models)
  * ``mutinfo``/``avg_consensus`` — evaluation.py:25-66 (per-category
    adjusted mutual information vs reference labels; exact-agreement
    consensus across arms)
  * ``compute_consensus_statistics`` — mmidas/_utils.py:131-276

All heavy per-sample work is vectorized (one-hot matmuls / bincount); the
reference's per-sample python loops (mmidas/cpl_mixvae.py:802-818) do not
reappear anywhere.
"""

from __future__ import annotations

import pickle
from typing import Optional, Sequence

import numpy as np

from dvae_tpu.eval.metrics import (compute_confmat, confmat_mean,
                                   confmat_normalize, consensus_from_labels,
                                   per_category_agreement, reassign)


# ---------------------------------------------------------------------------
# North-star metrics (evaluation.py)
# ---------------------------------------------------------------------------

def mutinfo_oracle(probs: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Reference transcription of ``mutinfo`` (evaluation.py:25-41): the
    O(F·C) sklearn-per-pair double loop.  Kept as the equivalence oracle
    for the vectorized ``mutinfo`` below (the repo's naive/optimized
    testing idiom); at production N/F/C it takes minutes — use ``mutinfo``.
    """
    from sklearn.metrics.cluster import adjusted_mutual_info_score

    preds = np.argmax(probs, axis=1)
    uniq = np.unique(preds)
    prediction = np.zeros(len(preds))
    for i, c in enumerate(uniq):
        prediction[preds == c] = i
    t_int = np.argmax(targets, axis=-1)
    F = len(np.unique(t_int))
    mi = np.zeros((F, len(uniq)))
    for c in range(mi.shape[1]):
        per_c = (prediction == c).astype(int)
        for f in range(F):
            mi[f, c] = adjusted_mutual_info_score(targets[:, f], per_c)
    return mi


def _lngamma_table(n: int) -> np.ndarray:
    """T[k] = ln k! for k = 0..n (cumulative-log table; lnC(n,r) is then
    three lookups)."""
    t = np.empty(n + 1)
    t[0] = 0.0
    np.cumsum(np.log(np.arange(1, n + 1)), out=t[1:])
    return t


def _emi_cell(a: np.ndarray, b: np.ndarray, N: int, T: np.ndarray,
              chunk: int = 4096) -> np.ndarray:
    """Expected-MI contribution of ONE cell of a 2x2 contingency table,
    for broadcastable integer marginal grids ``a``, ``b``:

        E[ (k/N)·ln(N·k/(a·b)) ]  over  k ~ Hypergeom(N, a, b)

    summed over the support (Vinh et al. 2010 — the same quantity
    sklearn's ``expected_mutual_information`` accumulates per cell).  The
    hypergeometric pmf is evaluated from the ln-factorial table ``T`` and
    the sum is truncated to ±(12σ+25) around the mean, where the pmf is
    < 1e-30 (log-concave tails) — below f64 resolution of the result.
    """
    a, b = np.broadcast_arrays(a, b)
    shape = a.shape
    a = a.ravel().astype(np.int64)
    b = b.ravel().astype(np.int64)
    out = np.zeros(a.size)
    lo_sup = np.maximum(1, a + b - N)
    hi_sup = np.minimum(a, b)
    # float64 BEFORE the quadruple product: in int64 a·b·(N−a)·(N−b)
    # overflows (silently, wrapping) once N exceeds ~1e5 with balanced
    # marginals, which would corrupt the truncation window and the AMI
    af, bf = a.astype(np.float64), b.astype(np.float64)
    mu = af * bf / N
    sig = np.sqrt(np.maximum(
        af * bf * (N - af) * (N - bf) / (float(N) * N * max(N - 1, 1)),
        0.0))
    w = 12.0 * sig + 25.0
    lo = np.maximum(lo_sup, np.floor(mu - w).astype(np.int64))
    hi = np.minimum(hi_sup, np.ceil(mu + w).astype(np.int64))
    ln_const = T[N] - T[a] - T[N - a]  # -lnC(N, a), per pair
    for s in range(0, a.size, chunk):
        e = min(s + chunk, a.size)
        al, bl = a[s:e, None], b[s:e, None]
        lol, hil = lo[s:e], hi[s:e]
        span = int(max(0, (hil - lol).max())) + 1 if e > s else 0
        if span <= 0 or (hil < lol).all():
            continue
        k = lol[:, None] + np.arange(span)[None, :]
        valid = k <= hil[:, None]
        k = np.where(valid, k, 1)  # safe index; masked out below
        ln_pmf = ((T[bl] - T[k] - T[np.maximum(bl - k, 0)])
                  + (T[np.maximum(N - bl, 0)] - T[np.maximum(al - k, 0)]
                     - T[np.maximum(N - bl - al + k, 0)])
                  - ln_const[s:e, None])
        with np.errstate(divide="ignore"):  # log(a·b)=−inf lanes are masked
            term = ((k / N) * (np.log(N * k) - np.log(al * bl))
                    * np.exp(ln_pmf))
        out[s:e] = np.where(valid, term, 0.0).sum(axis=1)
    return out.reshape(shape)


def mutinfo(probs: np.ndarray, targets: np.ndarray,
            verbose: bool = False) -> np.ndarray:
    """Per-(reference-type, discovered-cluster) adjusted mutual information.

    ``probs``: (N, C) categorical posterior of one arm; ``targets``: (N, F)
    one-hot reference labels.  Returns the (F, C_used) AMI matrix of
    reference evaluation.py:25-41 — but instead of F·C sklearn calls each
    re-scanning all N samples, every pair is a **2x2 contingency table**
    whose counts come from one (F, C) matmul; MI, the entropies, and the
    expected MI (windowed hypergeometric sums, ``_emi_cell``) are then
    evaluated in closed form, vectorized over all pairs.  Matches
    ``mutinfo_oracle`` (= sklearn, 'arithmetic' averaging) to f64
    round-off; ~3 orders of magnitude faster at the production shape.
    """
    del verbose
    preds = np.argmax(probs, axis=1)
    uniq, prediction = np.unique(preds, return_inverse=True)
    C = len(uniq)
    t_int = np.argmax(targets, axis=-1)
    F = len(np.unique(t_int))
    N = len(prediction)

    # 2x2 contingency counts for every (f, c) pair:
    #   u_f = targets[:, f] != 0 (the reference passes the raw column as
    #   labels),  v_c = (prediction == c).
    # One masked bincount per reference type — O(F·N) time, O(N) scratch —
    # instead of a dense (N, C) one-hot + (F,N)x(N,C) GEMM, which at
    # atlas scale (N=1e6, C=92) allocates ~736 MB and does O(N·F·C) work
    # for integer counts obtainable directly.
    fcols = np.asarray(targets[:, :F])
    n11 = np.empty((F, C), np.int64)
    tf = np.empty(F, np.int64)
    for f in range(F):
        mask = fcols[:, f] != 0
        tf[f] = int(mask.sum())
        n11[f] = np.bincount(prediction[mask], minlength=C)
    pc = np.bincount(prediction, minlength=C).astype(np.int64)  # (C,)
    n10 = tf[:, None] - n11
    n01 = pc[None, :] - n11
    n00 = N - tf[:, None] - pc[None, :] + n11

    def _mi_cell(n, aa, bb):
        n = n.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (n / N) * (np.log(N * n) - np.log(aa * bb))
        return np.where(n > 0, t, 0.0)

    af, bf = tf[:, None].astype(np.float64), pc[None, :].astype(np.float64)
    mi = (_mi_cell(n11, af, bf) + _mi_cell(n10, af, N - bf)
          + _mi_cell(n01, N - af, bf) + _mi_cell(n00, N - af, N - bf))

    def _h2(cnt):  # binary entropy of an integer count vector vs N
        p = cnt / N
        with np.errstate(divide="ignore", invalid="ignore"):
            h = -(p * np.log(p) + (1 - p) * np.log1p(-p))
        return np.where((cnt > 0) & (cnt < N), h, 0.0)

    h_u = _h2(tf.astype(np.float64))[:, None]              # (F, 1)
    h_v = _h2(pc.astype(np.float64))[None, :]              # (1, C)

    from dvae_tpu.utils import host_ops
    if host_ops.has_emi():
        # native C++ path (OpenMP over reference types): same windowed
        # hypergeometric sums, ~10x the numpy version at production shape
        emi = host_ops.emi_binary(tf, pc, N)
    else:
        T = _lngamma_table(N)
        emi = (_emi_cell(tf[:, None], pc[None, :], N, T)
               + _emi_cell(tf[:, None], N - pc[None, :], N, T)
               + _emi_cell(N - tf[:, None], pc[None, :], N, T)
               + _emi_cell(N - tf[:, None], N - pc[None, :], N, T))

    # sklearn's AMI assembly ('arithmetic' averaging + eps-guarded
    # denominator + the both-single-cluster special case)
    normalizer = 0.5 * (h_u + h_v)
    denom = normalizer - emi
    eps = np.finfo(np.float64).eps
    denom = np.where(denom < 0, np.minimum(denom, -eps),
                     np.maximum(denom, eps))
    ami = (mi - emi) / denom
    single_u = (tf == 0) | (tf == N)
    both_single = single_u[:, None] & np.full((1, C), C == 1)
    return np.where(both_single, 1.0, ami)


def avg_max(a: np.ndarray) -> float:
    """mean over rows of the row max (reference ``avg``, evaluation.py:43)."""
    return float(np.mean(np.max(a, axis=-1)))


def avg_consensus(labels: np.ndarray) -> dict:
    """Exact-agreement consensus of (A, N) integer labels
    (reference evaluation.py:46-66).

    'pairwise': mean over arm pairs of the fraction of samples where the two
    arms agree; 'all': fraction of samples where ALL arms agree.
    """
    A, N = labels.shape
    if A == 1:
        return {"all": 1.0, "pairwise": 1.0}
    total, n = 0.0, 0
    for i in range(A):
        for j in range(i + 1, A):
            total += float(np.mean(labels[i] == labels[j]))
            n += 1
    all_agree = float(np.mean(np.all(labels == labels[0], axis=0)))
    return {"all": all_agree, "pairwise": total / n}


# ---------------------------------------------------------------------------
# Inference summary (eval_models.py)
# ---------------------------------------------------------------------------

def summarize_inference(cpl, files, x: np.ndarray,
                        saving_file: Optional[str] = None) -> dict:
    """Load checkpoint(s) into ``cpl`` (a CplMixVAE), run batched eval over
    ``x``, and build the consensus summary (reference eval_models.py:8-134).

    Returns a dict with, per checkpoint: per-arm ``c_prob``/``state_mu``/
    ``pred_label``, normalized arm-pair confusion matrices
    ``armA_vs_armB[(a, b)]``, per-pair consensus scores, per-category
    agreement, and reconstruction losses.  Pickled to ``saving_file`` like
    the reference (:101-132) when given.
    """
    if isinstance(files, (str, bytes)):
        files = [files]
    summaries = []
    for f in files:
        cpl.load_model(f)
        # after load: standalone-capable load_model rebuilds cfg from the
        # checkpoint metadata, so a fresh CplMixVAE() works here
        K = cpl.cfg.n_categories
        res = cpl.eval_model(x)
        labels = res["pred_label"]
        A = labels.shape[0]
        # pruned categories are never predicted; the reference restricts
        # the confusion matrices/consensus to the unpruned submatrix
        # (eval_models.py:76-83 nprune_indx) — including the all-zero
        # pruned rows/columns would deflate every pruned checkpoint's score
        active = np.where(np.asarray(res["mask"]) > 0)[0]
        conf = {}
        cons = {}
        for a in range(A):
            for b in range(a + 1, A):
                cm = confmat_normalize(
                    compute_confmat(labels[a], labels[b], K))
                cm = cm[np.ix_(active, active)]
                conf[(a, b)] = cm
                cons[(a, b)] = confmat_mean(cm)
        summaries.append({
            "file": f,
            "c_prob": res["c_prob"],
            "state_mu": res["state_mu"],
            "state_logvar": res["state_logvar"],
            "x_low": res["x_low"],
            "pred_label": labels,
            "armA_vs_armB": conf,
            "consensus_per_pair": cons,
            "consensus": res["consensus"],
            "per_category_agreement": per_category_agreement(labels, K),
            "total_loss_rec": res["total_loss_rec"],
            "mask": res["mask"],
            "nprune_indx": active,
        })
    out = summaries[0] if len(summaries) == 1 else {"runs": summaries}
    if saving_file:
        with open(saving_file, "wb") as fh:
            pickle.dump(out, fh, protocol=pickle.HIGHEST_PROTOCOL)
    return out


# ---------------------------------------------------------------------------
# Cross-run reproducibility (mmidas/_evals.py)
# ---------------------------------------------------------------------------

def evals2(labels_a: np.ndarray, labels_b: np.ndarray,
           c_prob_a: Optional[np.ndarray] = None,
           c_prob_b: Optional[np.ndarray] = None,
           K: Optional[int] = None) -> dict:
    """Within-run and between-run consensus/L2 matrices of two trained
    models (reference ``evals2``, mmidas/_evals.py:8-230).

    Inputs are the (A, N) argmax labels (and optionally (A, N, C)
    posteriors) of each run on the SAME dataset.  Returns:
      'within_a'/'within_b': (A, A) consensus between arm pairs of one run;
      'between': (A_a, A_b) consensus between arms across runs;
      'l2_between': mean posterior L2 distances across runs (if probs given).
    """
    if K is None:
        K = int(max(labels_a.max(), labels_b.max())) + 1

    def pair_consensus(la, lb, align=False):
        cm = confmat_normalize(compute_confmat(la, lb, K))
        # between-run pairs are aligned with the Hungarian reassignment
        # before taking the diagonal (reference _evals.py:90): two runs
        # that found the same clustering up to a category permutation must
        # score ~1, not ~1/K.  Within-run arm pairs share category indices
        # by construction and use the raw diagonal (:138/:186).
        return confmat_mean(reassign(cm) if align else cm)

    def within(labels):
        A = labels.shape[0]
        m = np.eye(A)
        for a in range(A):
            for b in range(a + 1, A):
                m[a, b] = m[b, a] = pair_consensus(labels[a], labels[b])
        return m

    Aa, Ab = labels_a.shape[0], labels_b.shape[0]
    between = np.zeros((Aa, Ab))
    for a in range(Aa):
        for b in range(Ab):
            between[a, b] = pair_consensus(labels_a[a], labels_b[b],
                                           align=True)

    out = {"within_a": within(labels_a), "within_b": within(labels_b),
           "between": between}
    if c_prob_a is not None and c_prob_b is not None:
        l2 = np.zeros((Aa, Ab))
        for a in range(Aa):
            for b in range(Ab):
                l2[a, b] = float(np.mean(
                    np.sum((c_prob_a[a] - c_prob_b[b]) ** 2, axis=-1)))
        out["l2_between"] = l2
    return out


def evals2_files(file_a: str, file_b: str, x: np.ndarray,
                 batch_size: int = 5000, with_probs: bool = True) -> dict:
    """One-call cross-run reproducibility from two checkpoint FILES
    (the reference's ``evals2(fa, fb, dl)`` workflow, mmidas/_evals.py:8:
    load both models, run inference on the same dataset, compare).

    Each checkpoint is loaded standalone (configs rebuilt from metadata —
    train/cpl_mixvae.load_model), evaluated over ``x``, and the label/
    posterior matrices handed to ``evals2``.  Returns its dict plus
    ``labels_a``/``labels_b``.
    """
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    results = []
    for f in (file_a, file_b):
        cpl = CplMixVAE()
        cpl.load_model(f)
        res = cpl.eval_model(x, batch_size=batch_size)
        results.append(res)
    ra, rb = results
    K = max(r["c_prob"].shape[-1] for r in results)
    out = evals2(ra["pred_label"], rb["pred_label"],
                 c_prob_a=ra["c_prob"] if with_probs else None,
                 c_prob_b=rb["c_prob"] if with_probs else None, K=K)
    out["labels_a"], out["labels_b"] = ra["pred_label"], rb["pred_label"]
    return out


def compute_consensus_statistics(runs_labels: Sequence[np.ndarray],
                                 K: int) -> dict:
    """Within-run / between-run consensus study over many runs
    (reference mmidas/_utils.py:131-276).

    ``runs_labels``: list of (A, N) label arrays, one per trained run.
    """
    n_runs = len(runs_labels)
    within = [consensus_from_labels(lb, K) for lb in runs_labels]
    between = np.eye(n_runs)
    for i in range(n_runs):
        for j in range(i + 1, n_runs):
            e = evals2(runs_labels[i], runs_labels[j], K=K)
            between[i, j] = between[j, i] = float(np.mean(e["between"]))
    return {"within_run": np.asarray(within), "between_run": between,
            "mean_within": float(np.mean(within)),
            "mean_between": float(np.mean(between[np.triu_indices(n_runs, 1)]))
            if n_runs > 1 else 1.0}
