"""Taxonomy-aligned visualization (analysis/hierarchy_viz.py — the
reference's mmidas/utils/celltype_hierarchy.py surface): smoke + data
contracts on a tiny synthetic tree."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from dvae_tpu.analysis.hierarchy_viz import (cell_nodes_dict, dent_plot,
                                             heatmap_plot, hierarchy_plot)
from dvae_tpu.analysis.taxonomy import HTree


def _tree_df():
    rows = [
        dict(x=0, y=0, leaf=True, label="a", parent="n1", col="#111111"),
        dict(x=1, y=0, leaf=True, label="b", parent="n1", col="#222222"),
        dict(x=2, y=0, leaf=True, label="c", parent="n2", col="#333333"),
        dict(x=3, y=0, leaf=True, label="d", parent="n2", col="#444444"),
        dict(x=0.5, y=1.0, leaf=False, label="n1", parent="root", col=None),
        dict(x=2.5, y=1.5, leaf=False, label="n2", parent="root", col=None),
        dict(x=1.5, y=2.0, leaf=False, label="root", parent=None, col=None),
    ]
    return pd.DataFrame(rows)


@pytest.fixture
def tree():
    return HTree(htree_df=_tree_df())


def test_cell_nodes_dict_ancestor_chains(tree):
    # reference iterates ALL nodes up to num_cell (not just leaves)
    d = cell_nodes_dict(tree, num_cell=10)
    assert d["a"] == ["n1", "root"]
    assert d["d"] == ["n2", "root"]
    assert d["n1"] == ["root"]
    # num_cell bounds the enumeration
    assert len(cell_nodes_dict(tree, num_cell=1)) == 2


def test_hierarchy_plot_returns_fig(tree, tmp_path):
    import matplotlib.pyplot as plt

    p_cat = np.array([0.5, 0.2, 0.2, 0.1])
    out = str(tmp_path / "h.png")
    ax, fig = hierarchy_plot(tree, p_cat, ["a", "b", "c", "d"],
                             save_path=out)
    assert (tmp_path / "h.png").exists()
    plt.close(fig)


def test_heatmap_plot_taxonomy_column_order(tree, tmp_path):
    import matplotlib.pyplot as plt

    # categories × types with types given OUT of taxonomy order: the
    # heatmap must re-order columns by the tree's leaf x positions
    K = 3
    cluster_per_cat = np.arange(K * 4, dtype=float).reshape(K, 4)
    unique_types = ["d", "c", "b", "a"]   # reversed
    fig, mat = heatmap_plot(tree, cluster_per_cat, unique_types,
                            leaf_size=4,
                            save_path=str(tmp_path / "hm.png"))
    # taxonomy order is a,b,c,d (x = 0..3) → columns 3,2,1,0 of the input
    np.testing.assert_array_equal(mat, cluster_per_cat[:, [3, 2, 1, 0]])
    assert (tmp_path / "hm.png").exists()
    plt.close(fig)


def test_dent_plot_smoke(tree):
    import matplotlib.pyplot as plt

    fig = dent_plot(tree, np.eye(4))
    plt.close(fig)
