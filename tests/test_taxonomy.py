"""Taxonomy/HTree tests against a hand-built dendrogram."""

import json

import numpy as np
import pandas as pd
import pytest

from dvae_tpu.analysis.taxonomy import (HTree, dend_json_to_df, do_merges,
                                        simplify_tree)


def _tree_df():
    #        root
    #        /  \
    #      n1    n2
    #     /  \   / \
    #    a    b c   d        (a..d leaves)
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


def test_descendants_and_ancestors(tree):
    assert set(tree.get_descendants("n1")) == {"a", "b"}
    assert set(tree.get_descendants("root")) == {"n1", "n2", "a", "b",
                                                 "c", "d"}
    assert set(tree.get_descendants("root", leafonly=True)) == {"a", "b",
                                                                "c", "d"}
    assert tree.get_ancestors("a") == ["n1", "root"]
    assert tree.get_ancestors("a", rootnode="n1") == ["n1"]


def test_mergeseq_order_shallowest_first(tree):
    merges = tree.get_mergeseq()
    # n1 (y=1.0) merges before n2 (y=1.5); root is last and dropped by the
    # while-loop (queue needs >1 entries)
    assert merges[0] == [["a", "b"], "n1"]
    assert merges[1] == [["c", "d"], "n2"]


def test_do_merges_successive_cuts(tree):
    labels = np.array(["a", "b", "c", "d", "a"], dtype=object)
    merges = tree.get_mergeseq()
    m1 = do_merges(labels, merges, 1)
    assert m1.tolist() == ["n1", "n1", "c", "d", "n1"]
    m2 = do_merges(labels, merges, 2)
    assert m2.tolist() == ["n1", "n1", "n2", "n2", "n1"]
    # input untouched (reference mutates in place; we copy)
    assert labels.tolist() == ["a", "b", "c", "d", "a"]


def test_subtree(tree):
    sub = tree.get_subtree("n1")
    assert set(sub.child) == {"a", "b", "n1"}


def test_get_merged_types(tree):
    cells = np.array(["a", "b", "c", "d"] * 5, dtype=object)
    merged, mod_subtree, subtree = tree.get_merged_types(
        cells, num_classes=2, node="root")
    assert set(merged.tolist()) == {"n1", "c", "d"}


def test_simplify_tree_removes_chain():
    rows = [
        dict(x=0, y=0, leaf=True, label="a", parent="mid", col=None),
        dict(x=0, y=1, leaf=False, label="mid", parent="top", col=None),
        dict(x=1, y=0, leaf=True, label="b", parent="top", col=None),
        dict(x=0.5, y=2, leaf=False, label="top", parent=None, col=None),
    ]
    tree = HTree(htree_df=pd.DataFrame(rows))
    simple, skipped = simplify_tree(tree)
    assert "mid" in skipped
    df = simple.obj2df()
    assert df.loc[df["child"] == "a", "parent"].iloc[0] == "top"
    assert "mid" not in df["child"].values


def test_parse_dend(tmp_path):
    p = tmp_path / "dend.csv"
    _tree_df().to_csv(p, index=False)
    from dvae_tpu.analysis.taxonomy import parse_dend
    list_changes, descendants, treeobj, leaves, child, parent = \
        parse_dend(str(p))
    assert list_changes[0] == [["a", "b"], "n1"]
    assert set(descendants["n1"]) == {"a", "b"}
    assert set(descendants["root"]) == {"n1", "n2", "a", "b", "c", "d"}
    assert set(leaves) == {"a", "b", "c", "d"}
    assert list(treeobj.columns) == ["x", "y", "leaf", "label", "parent",
                                     "col"]
    assert len(child) == len(parent) == 7


def test_plot_htree(tmp_path):
    p = tmp_path / "dend.csv"
    _tree_df().to_csv(p, index=False)
    from dvae_tpu.analysis.taxonomy import plot_htree
    fig = plot_htree(str(p), save_path=str(tmp_path / "tree.png"))
    assert fig is not None
    assert (tmp_path / "tree.png").exists()


def test_get_valid_classifications(tree):
    from dvae_tpu.analysis.taxonomy import get_valid_classifications
    got = get_valid_classifications(["root"], tree.child, tree.parent, [])
    as_sets = {frozenset(c) for c in got}
    assert as_sets == {
        frozenset({"root"}),
        frozenset({"n1", "n2"}),
        frozenset({"a", "b", "n2"}),
        frozenset({"n1", "c", "d"}),
        frozenset({"a", "b", "c", "d"}),
    }
    # every classification is sorted, first is the root
    assert got[0] == ["root"]
    assert all(c == sorted(c) for c in got)


def test_flatten_nested():
    from dvae_tpu.analysis.taxonomy import flatten
    nested = {"a": {"b": 1, "c": [10, {"d": 2}]}, "e": 3}
    flat = flatten(nested)
    assert flat == {"a_b": 1, "a_c_0": 10, "a_c_1_d": 2, "e": 3}
    flat2 = flatten(nested, separator=".", root_keys_to_ignore={"e"})
    assert flat2 == {"a.b": 1, "a.c.0": 10, "a.c.1.d": 2}


def test_get_marker():
    rows = [
        dict(x=0, y=0, leaf=True, label="L2/3 IT VISp Agmat",
             parent="n1", col="#111111"),
        dict(x=1, y=0, leaf=True, label="Sst Calb2 Pdlim5",
             parent="n1", col="#222222"),
        dict(x=0.5, y=1, leaf=False, label="n1", parent=None, col=None),
    ]
    t = HTree(htree_df=pd.DataFrame(rows))
    # tokens after the first that are not subclass names: IT/VISp filtered,
    # 'Sst' is the first token of its label so never considered
    assert t.get_marker().tolist() == ["Agmat", "Calb2", "Pdlim5"]
    # exclude replaces the subclass list
    assert "VISp" in t.get_marker(exclude=["IT"]).tolist()


def test_dend_json_roundtrip(tmp_path):
    dend = {
        "node_attribute": {"_row": "root", "height": 2.0},
        "children": [
            {"node_attribute": {"_row": "n1", "height": 1.0},
             "children": [
                 {"leaf_attribute": {"_row": "a", "height": 0.0,
                                     "nodePar.col": "#ff0000"}},
                 {"leaf_attribute": {"_row": "b", "height": 0.0}},
             ]},
            {"leaf_attribute": {"_row": "c", "height": 0.0}},
        ],
    }
    p = tmp_path / "dend.json"
    p.write_text(json.dumps(dend))
    df = dend_json_to_df(str(p))
    tree = HTree(htree_df=df)
    assert set(tree.get_descendants("root", leafonly=True)) == {"a", "b", "c"}
    assert set(tree.get_descendants("n1")) == {"a", "b"}
    assert tree.col[list(tree.child).index("a")] == "#ff0000"


def test_plotnodes_marks_named_nodes(tree, tmp_path):
    tree.update_layout()
    fig = tree.plot()
    fig = tree.plotnodes(["a", "n1"], fig=fig)
    # the overlay adds one extra line artist with 2 marker points
    pts = fig.gca().lines[-1]
    assert len(pts.get_xdata()) == 2
