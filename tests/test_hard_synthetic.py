"""Hard-mode synthetic generator (data/anndata_io.hard_synthetic_dataset).

The round-4 quality study trains the production recipe on ZINB-count data
with real-scRNA failure modes; these tests pin the planted structure the
study's difficulty claims rest on — count-model sampling, dropout level,
hierarchical overlap — at small shapes on the CPU mesh.
"""

import numpy as np
import pytest

from dvae_tpu.data.anndata_io import hard_synthetic_dataset


@pytest.fixture(scope="module")
def ds():
    # default lib_mu scales with n_genes (≈2 counts/gene), so the zero
    # fraction at D=240 matches the production-shape regime
    return hard_synthetic_dataset(n_cells=600, n_genes=240, n_types=12,
                                  n_roots=4, seed=7, chunk=200)


def test_shapes_and_encoding(ds):
    assert ds.log1p.shape == (600, 240)
    assert ds.log1p.dtype == np.float32
    assert np.isfinite(ds.log1p).all()
    assert (ds.log1p >= 0).all()
    assert ds.n_type == len(np.unique(ds.cluster_label))
    assert ds.c_onehot.sum(axis=1).min() == 1.0
    assert ds.cluster_id.min() == 1.0  # 1-based (reference contract)


def test_dropout_and_dynamic_range(ds):
    """ZINB sampling + expression-dependent zero inflation must land in
    the sparse regime real Smart-seq occupies — far from the dense
    Gaussian easy set."""
    zero_frac = (ds.log1p == 0).mean()
    assert 0.35 < zero_frac < 0.95, zero_frac
    # log1p-CPM dynamic range: nonzero values in single digits
    nz = ds.log1p[ds.log1p > 0]
    assert 2.0 < nz.max() < 16.0


def test_labels_are_hierarchical(ds):
    roots = {l.split("_")[0] for l in ds.cluster_label}
    assert 1 < len(roots) <= 4
    # every leaf type maps to exactly one root (prefix is part of the name)
    leaf_to_root = {}
    for l in ds.cluster_label:
        r, t = l.split("_")
        assert leaf_to_root.setdefault(t, r) == r


def test_siblings_overlap_more_than_cross_root(ds):
    """The planted hierarchy: per-type mean profiles of SIBLING leaves
    (same root, ~97% shared program) must correlate higher than
    cross-root pairs — the overlap that makes leaf recovery hard."""
    labels = ds.cluster_label
    types = np.unique(labels)
    profiles = np.stack([ds.log1p[labels == t].mean(axis=0) for t in types])
    roots = np.array([t.split("_")[0] for t in types])
    C = np.corrcoef(profiles)
    same = [C[i, j] for i in range(len(types)) for j in range(i)
            if roots[i] == roots[j]]
    diff = [C[i, j] for i in range(len(types)) for j in range(i)
            if roots[i] != roots[j]]
    assert same and diff
    assert np.mean(same) > np.mean(diff) + 0.05


def test_deterministic_by_seed():
    a = hard_synthetic_dataset(n_cells=120, n_genes=60, n_types=6,
                               n_roots=2, seed=3, chunk=50)
    b = hard_synthetic_dataset(n_cells=120, n_genes=60, n_types=6,
                               n_roots=2, seed=3, chunk=50)
    np.testing.assert_array_equal(a.log1p, b.log1p)
    assert (a.cluster_label == b.cluster_label).all()
    c = hard_synthetic_dataset(n_cells=120, n_genes=60, n_types=6,
                               n_roots=2, seed=4, chunk=50)
    assert not np.array_equal(a.log1p, c.log1p)
