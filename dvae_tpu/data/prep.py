"""Dataset assembly: raw count matrices → analysis-ready .h5ad.

Equivalent capability to the reference's data-prep notebooks
(``notebooks/1_data_prep.ipynb``, ``dist/10x_data.ipynb``): assemble an
AnnData object from a counts matrix + cluster annotations, normalize to
log1p CPM, optionally subset to high-variability genes, and write the
``.h5ad`` that ``load_data`` consumes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from dvae_tpu.utils.tools import logcpm, reorder_genes


def prepare_dataset(counts: np.ndarray, gene_ids: Sequence[str],
                    cluster_labels: Sequence[str],
                    obs: Optional[dict] = None,
                    n_top_genes: int = 0,
                    already_normalized: bool = False):
    """Build an AnnData with the reference's expected layout: ``X`` =
    log1p-CPM, ``var.index`` = gene ids, ``obs['cluster']`` = labels.

    ``n_top_genes > 0`` keeps the top genes by binarized-expression std
    (the reference's marker-ranking, tools.py reorder_genes).
    Returns the AnnData (caller writes it with ``save_h5ad``).
    """
    import anndata
    import pandas as pd

    x, gene_ids = _normalized(counts, gene_ids, n_top_genes,
                              already_normalized)
    obs_df = pd.DataFrame({"cluster": np.asarray(cluster_labels)})
    for k, v in (obs or {}).items():
        obs_df[k] = np.asarray(v)
    var_df = pd.DataFrame(index=pd.Index(gene_ids, name="gene"))
    return anndata.AnnData(X=x.astype(np.float32), obs=obs_df, var=var_df)


def _normalized(counts, gene_ids, n_top_genes: int,
                already_normalized: bool):
    x = np.asarray(counts, dtype=np.float64)
    if not already_normalized:
        x = logcpm(x)
    gene_ids = np.asarray(gene_ids)
    if n_top_genes > 0:
        order = reorder_genes(x)[:n_top_genes]
        order = np.sort(order)
        x = x[:, order]
        gene_ids = gene_ids[order]
    return x, gene_ids


def prepare_h5ad(path: str, counts: np.ndarray, gene_ids: Sequence[str],
                 cluster_labels: Sequence[str],
                 obs: Optional[dict] = None, n_top_genes: int = 0,
                 already_normalized: bool = False,
                 sparse: Optional[str] = None) -> str:
    """``prepare_dataset`` + write in one step, with NO anndata dependency:
    uses the real anndata writer when importable, else the spec-faithful
    h5py-native writer (``anndata_io.write_h5ad`` — same on-disk layout)."""
    try:
        adata = prepare_dataset(counts, gene_ids, cluster_labels, obs=obs,
                                n_top_genes=n_top_genes,
                                already_normalized=already_normalized)
    except ImportError:
        from dvae_tpu.data.anndata_io import write_h5ad

        x, gene_ids = _normalized(counts, gene_ids, n_top_genes,
                                  already_normalized)
        return write_h5ad(path, x.astype(np.float32), gene_ids,
                          cluster_labels, obs=obs, sparse=sparse)
    if sparse is not None:
        # honor the requested on-disk layout on BOTH paths — a dense X
        # here would be orders of magnitude bigger than asked for and
        # differ from the h5py-native writer's output for the same call
        import scipy.sparse as sp

        if sparse not in ("csr", "csc"):
            raise ValueError(f"sparse must be 'csr', 'csc' or None: "
                             f"{sparse!r}")
        adata.X = (sp.csr_matrix if sparse == "csr"
                   else sp.csc_matrix)(adata.X)
    return save_h5ad(adata, path)


def save_h5ad(adata, path: str) -> str:
    adata.write_h5ad(path)
    return path


def synthetic_h5ad(path: str, n_cells: int = 2000, n_genes: int = 500,
                   n_types: int = 10, seed: int = 0) -> str:
    """Write a synthetic .h5ad exercising the full load_data path."""
    from dvae_tpu.data.anndata_io import synthetic_dataset

    ds = synthetic_dataset(n_cells, n_genes, n_types, seed)
    return prepare_h5ad(path, np.expm1(ds.log1p), ds.gene_id,
                        ds.cluster_label, already_normalized=False)
