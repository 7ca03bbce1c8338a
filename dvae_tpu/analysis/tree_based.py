"""State-variable / gene-expression correlation and taxonomy-merge helpers.

Equivalent capability to ``mmidas/utils/tree_based_analysis.py``:
  * ``corr_analysis`` :7-62 — Pearson correlation of each continuous state
    dimension with each gene's expression over nonzero-expressing cells.
    The reference loops per gene per state dim with scipy (O(S·G) python
    iterations); here the masked Pearson statistic is fully vectorized.
  * ``get_merged_types`` :62-115 — file-path convenience wrapper around
    HTree.get_merged_types.
"""

from __future__ import annotations

import numpy as np

from dvae_tpu.analysis.taxonomy import HTree


def masked_pearson(state_col: np.ndarray, cell: np.ndarray,
                   min_nonzero: int = 5) -> np.ndarray:
    """(G,) Pearson r between one state vector and every gene, computed
    only over each gene's nonzero-expression cells; genes with fewer than
    ``min_nonzero`` nonzero cells get r=0 (reference's `len(zind)>4` rule).
    """
    x = state_col[:, None]                       # (N, 1)
    m = (cell > 0).astype(np.float64)            # (N, G) mask
    n = m.sum(axis=0)                            # (G,)
    safe_n = np.maximum(n, 1.0)

    sx = (x * m).sum(axis=0)
    sy = (cell * m).sum(axis=0)
    sxx = (x ** 2 * m).sum(axis=0)
    syy = (cell ** 2 * m).sum(axis=0)
    sxy = (x * cell * m).sum(axis=0)

    cov = sxy - sx * sy / safe_n
    var_x = sxx - sx ** 2 / safe_n
    var_y = syy - sy ** 2 / safe_n
    denom = np.sqrt(np.maximum(var_x * var_y, 0.0))
    r = np.divide(cov, denom, out=np.zeros_like(cov), where=denom > 0)
    r[n <= min_nonzero - 1] = 0.0
    return r


def corr_analysis(state: np.ndarray, cell: np.ndarray):
    """Per-state-dim |r| rankings over genes (reference contract:
    returns (all_corr, all_geneID) with all_corr[s] the SORTED |r| values
    and all_geneID[s] the gene indices in ascending-|r| order)."""
    all_corr, all_geneID = [], []
    for s in range(state.shape[-1]):
        r = masked_pearson(state[:, s].astype(np.float64),
                           cell.astype(np.float64))
        order = np.argsort(np.abs(r))
        all_corr.append(np.abs(r)[order])
        all_geneID.append(order)
    return all_corr, all_geneID


def corr_analysis_naive(state: np.ndarray, cell: np.ndarray,
                        min_nonzero: int = 5):
    """Per-gene scipy loop oracle (the reference's actual implementation)."""
    from scipy import stats

    n_gene = cell.shape[-1]
    all_corr, all_geneID = [], []
    for s in range(state.shape[-1]):
        r = np.zeros(n_gene)
        for g in range(n_gene):
            if np.max(cell[:, g]) > 0:
                nz = np.where(cell[:, g] > 0)[0]
                if len(nz) > min_nonzero - 1:
                    r[g], _ = stats.pearsonr(state[nz, s], cell[nz, g])
        order = np.argsort(np.abs(r))
        all_corr.append(np.sort(np.abs(r)))
        all_geneID.append(order)
    return all_corr, all_geneID


def get_merged_types(htree_file: str, cells_labels, num_classes: int = 0,
                     ref_leaf=(), node: str = "n4"):
    """Load the taxonomy CSV and merge labels (reference
    tree_based_analysis.py:62-115)."""
    tree = HTree(htree_file=htree_file)
    return tree.get_merged_types(np.asarray(cells_labels, dtype=object),
                                 num_classes=num_classes,
                                 ref_leaf=ref_leaf, node=node)
