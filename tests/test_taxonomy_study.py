"""End-to-end taxonomy study (examples/taxonomy_study.py): hierarchical
synthetic data → CplMixVAE → merge-sweep level matching + dendrogram plots.

The reference runs this loop against the Allen dendrogram
(notebooks/3_analysis.ipynb via mmidas/utils/taxonomy.py get_merged_types
+ celltype_hierarchy.py); here the dendrogram is planted, so the sweep's
answer has a ground truth to check against.
"""

import numpy as np
import pytest

from dvae_tpu.examples.taxonomy_study import (hierarchical_synthetic,
                                              merge_sweep,
                                              synthetic_taxonomy)


def test_synthetic_taxonomy_schema():
    tree, leaves = synthetic_taxonomy(depth=3)
    assert len(leaves) == 8
    assert sorted(tree.child[tree.isleaf]) == leaves
    # full binary tree: 7 internal nodes, 7 merges, root present
    assert len(tree.get_mergeseq()) == 7
    assert "n1" in tree.parent  # children of the root exist
    # every leaf reaches the root (HTree appends the synthetic "root"
    # sentinel above n1 — the NaN-parent fill)
    for leaf in leaves:
        assert "n1" in tree.get_ancestors(leaf)


def test_hierarchy_respected_by_expression():
    """Sibling leaf centroids must be closer than cousins, cousins closer
    than cross-root leaves — the property the merge sweep detects."""
    _, X, labels = hierarchical_synthetic(depth=3, n_cells=800,
                                          n_genes=64, seed=0)
    cent = {l: X[labels == l].mean(0) for l in np.unique(labels)}
    d = lambda a, b: np.linalg.norm(cent[a] - cent[b])
    assert d("t00", "t01") < d("t00", "t02") < d("t00", "t07")


def test_merge_sweep_peaks_at_the_true_level():
    """A predictor that labels cells by their true 4-class clade must score
    AMI exactly 1.0 at the 4-class merge level and below 1.0 elsewhere."""
    tree, X, labels = hierarchical_synthetic(depth=3, n_cells=600,
                                             n_genes=32, seed=1)
    merged4, _, _ = tree.get_merged_types(labels, num_classes=5, node="n1")
    rows = merge_sweep(tree, labels, np.stack([merged4, merged4]))
    by_k = {r["n_classes"]: np.mean(r["ami"]) for r in rows}
    assert by_k[4] == pytest.approx(1.0)
    assert all(v < 1.0 for k, v in by_k.items() if k != 4)
    # finest-first ordering, every class count distinct
    ks = [r["n_classes"] for r in rows]
    assert ks == sorted(ks, reverse=True) and len(set(ks)) == len(ks)


def test_taxonomy_study_end_to_end(tmp_path):
    """Tiny full run: train, sweep, plot files on disk, sane metrics."""
    from dvae_tpu.examples.taxonomy_study import run

    out = run(depth=3, n_cells=320, n_genes=48, n_categories=12,
              batch_size=80, n_epoch=300, epochs_per_jit=100,
              folder=str(tmp_path), verbose=False)
    assert out["n_leaves"] == 8
    assert len(out["leaf_ami"]) == 2
    assert all(np.isfinite(out["leaf_ami"]))
    assert out["levels"] and out["best_level"] is not None
    for r in out["levels"]:
        assert 2 <= r["n_classes"] <= 8
        assert all(-0.5 <= a <= 1.0 for a in r["ami"])
    for name in out["plots"]:
        assert (tmp_path / name).exists()
