"""Clusterability scoring: CV classifiers, silhouette, K selection.

Equivalent capability to the reference ``mmidas/utils/cluster_analysis.py``:
  * ``RF_classifier`` :14 / ``LDA_classifier`` :38 / ``QDA_classifier`` :62
    — k-fold CV accuracy of predicting each label set from the data; here
    one generic ``kfold_classifier`` parameterized by model kind (the three
    reference functions are copy-paste triplicates of one loop).
  * ``cluster_compare`` :87 — per-cluster mean silhouette curves in PCA
    space across label sets.
  * ``K_selection`` :123-199 — pick the number of categories from a pruning
    sweep: order runs by surviving-category count, restrict to runs with
    consensus > thr, select at the largest consensus jump.
  * ``get_SilhScore`` :201 — per-cluster mean silhouette scores.

Plotting is decoupled (functions return data; matplotlib is optional).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np


def _make_model(kind: str, seed: Optional[int] = None):
    if kind == "rf":
        from sklearn.ensemble import RandomForestClassifier
        return RandomForestClassifier(random_state=seed)
    if kind == "lda":
        from sklearn.discriminant_analysis import LinearDiscriminantAnalysis
        return LinearDiscriminantAnalysis(store_covariance=True)
    if kind == "qda":
        from sklearn.discriminant_analysis import QuadraticDiscriminantAnalysis
        return QuadraticDiscriminantAnalysis(reg_param=1e-2,
                                             store_covariance=True)
    raise ValueError(f"unknown classifier kind {kind!r}")


def kfold_classifier(data: np.ndarray, labels: Mapping[str, np.ndarray],
                     kfold: int = 5, seed: Optional[int] = 0,
                     kind: str = "rf"):
    """k-fold CV accuracy of predicting each label set from ``data``.

    Returns (acc, ref_labels, pred_labels) keyed by label-set name —
    the reference's contract for all three *_classifier functions.
    """
    from sklearn.metrics import accuracy_score
    from sklearn.model_selection import KFold

    kf = KFold(n_splits=kfold, random_state=seed, shuffle=True)
    acc, pred_labels, ref_labels = {}, {}, {}
    for key, y in labels.items():
        acc[key], pred_labels[key], ref_labels[key] = [], [], []
        for train_index, test_index in kf.split(data):
            model = _make_model(kind, seed)
            model.fit(data[train_index], y[train_index])
            y_pred = model.predict(data[test_index])
            acc[key].append(accuracy_score(y[test_index], y_pred))
            pred_labels[key].append(y_pred)
            ref_labels[key].append(y[test_index])
    return acc, ref_labels, pred_labels


def RF_classifier(data, labels, kfold=5, seed=0):
    return kfold_classifier(data, labels, kfold, seed, kind="rf")


def LDA_classifier(data, labels, kfold=5, seed=0):
    return kfold_classifier(data, labels, kfold, seed, kind="lda")


def QDA_classifier(data, labels, kfold=5, seed=0):
    return kfold_classifier(data, labels, kfold, seed, kind="qda")


def get_SilhScore(x: np.ndarray, labels: np.ndarray):
    """(per-cluster mean silhouette, overall silhouette) — reference :201."""
    from sklearn.metrics import silhouette_samples, silhouette_score

    uniq = np.unique(labels)
    sample_score = silhouette_samples(x, labels)
    overall = float(silhouette_score(x, labels))
    per_cluster = np.array([np.mean(sample_score[labels == c]) for c in uniq])
    return per_cluster, overall


def cluster_compare(data: np.ndarray, labels: Mapping[str, np.ndarray],
                    num_pc: int = 0, saving_path: str = "",
                    plot: bool = False):
    """Silhouette comparison of label sets in PCA space (reference :87-120).

    Returns (fig|None, silh_smp_score, sil_score, c_size).
    """
    from sklearn.decomposition import PCA

    if num_pc <= 0:
        raise ValueError("num_pc must be > 0")
    z = PCA(n_components=num_pc).fit_transform(data)
    silh_smp_score, sil_score, c_size = [], [], []
    for key, y in labels.items():
        per_cluster, overall = get_SilhScore(z, y)
        sil_score.append(overall)
        sizes = np.array([np.sum(y == c) for c in np.unique(y)])
        order = np.argsort(per_cluster)
        silh_smp_score.append(per_cluster)
        c_size.append(sizes[order])
    fig = None
    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(10, 5))
        for (key, y), sc in zip(labels.items(), silh_smp_score):
            ax.plot(np.arange(len(sc)), np.sort(sc), label=key)
        ax.set_title(f"{num_pc} PCs")
        ax.set_xlabel("Ordered clusters")
        ax.set_ylabel("Ave. Silhouette scores")
        ax.legend()
        fig.tight_layout()
        if saving_path:
            fig.savefig(saving_path, dpi=300)
    return fig, silh_smp_score, sil_score, c_size


def K_selection(num_pruned: Sequence[int],
                recon_loss: Sequence[Sequence[float]],
                con_mean: np.ndarray,
                d_qc: Optional[np.ndarray] = None,
                thr: float = 0.95):
    """Category-count selection from a pruning sweep (reference :123-199).

    Args:
      num_pruned: surviving-category count per run.
      recon_loss: (n_arm, n_runs) reconstruction losses.
      con_mean:   (n_pairs, n_runs) or (n_runs,) mean consensus per run.
      d_qc:       optional (n_runs,) categorical distances (Aitchison).
      thr:        minimum acceptable consensus.

    Returns (ordered_num_pruned, ordered_recon_mean, ordered_consensus, K)
    with K=None when no run reaches ``thr`` (reference prints a warning and
    declines to choose, :180-184).
    """
    num_pruned = np.asarray(num_pruned)
    recon = np.asarray(recon_loss, dtype=np.float64)
    con_mean = np.atleast_2d(np.asarray(con_mean, dtype=np.float64))
    consensus = np.mean(con_mean, axis=0)
    l_recon_mean = np.mean(recon, axis=0)

    indx = np.argsort(num_pruned)
    ordered_cons = consensus[indx]
    K = None
    ok = np.where(ordered_cons > thr)[0]
    if thr <= consensus.max() and len(ok) > 0:
        if len(ok) > 1:
            jumps = np.diff(ordered_cons[ok])
            sel = int(np.argmax(jumps)) + 1
        else:
            # exactly one qualifying run: select IT (the reference's
            # max-of-empty-diff crashes here; picking index 0 of the full
            # ordering would return an arbitrary low-consensus run)
            sel = int(ok[0])
        K = int(num_pruned[indx][sel])
    else:
        # thr == max(consensus) lands here too: the strict `>` filter is
        # empty, so decline rather than guess
        print("Required minimum consensus is set too high, kindly consider "
              "specifying a lower value.")
    return num_pruned[indx], l_recon_mean[indx], ordered_cons, K
