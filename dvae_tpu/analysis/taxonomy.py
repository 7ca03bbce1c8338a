"""Cell-type reference-taxonomy manipulation (hierarchical dendrograms).

Equivalent capability to the reference taxonomy stack —
``mmidas/utils/taxonomy.py`` (HTree :49-409, do_merges :351, simplify_tree
:382, dend_json_to_df :411), the drift duplicate in
``analysis_cells_tree.py``, and ``tree_based_analysis.get_merged_types``
— used to validate discovered clusters against the Allen Institute
dendrogram.  Re-written around one canonical DataFrame representation
(columns: child, parent, x, y, col, isleaf) instead of attribute-splatting;
method names and contracts match the reference.
"""

from __future__ import annotations

import json
from copy import deepcopy
from typing import Optional, Sequence

import numpy as np
import pandas as pd


class HTree:
    """Hierarchical tree over cell-type labels.

    Construct from a dataframe or a CSV with columns
    ``x, y, leaf, label, parent, col`` (the Allen dend.RData export format,
    reference taxonomy.py:49-81).
    """

    COLUMNS = ("x", "y", "col", "child", "parent", "isleaf")

    def __init__(self, htree_df: Optional[pd.DataFrame] = None,
                 htree_file: Optional[str] = None):
        if htree_file is not None:
            htree_df = pd.read_csv(htree_file)[
                ["x", "y", "leaf", "label", "parent", "col"]]
        if htree_df is None:
            raise ValueError("provide htree_df or htree_file")
        df = htree_df.rename(columns={"label": "child", "leaf": "isleaf"})
        df = df.copy()
        df["isleaf"] = df["isleaf"].fillna(False).astype(bool)
        df.loc[df["isleaf"], "y"] = 0.0
        df["col"] = df["col"].fillna("#000000")
        df["parent"] = df["parent"].fillna("root")
        df["parent"] = df["parent"].astype(str).str.strip()
        df["child"] = df["child"].astype(str).str.strip()
        df = df.sort_values(by=["y", "x"], ascending=[True, True])
        df = df.reset_index(drop=True)
        self._df = df[list(self.COLUMNS)] if set(self.COLUMNS) <= set(df) \
            else df

    # -- attribute access mirrors the reference (htree.child etc.) --------
    @property
    def child(self) -> np.ndarray:
        return self._df["child"].values

    @property
    def parent(self) -> np.ndarray:
        return self._df["parent"].values

    @property
    def isleaf(self) -> np.ndarray:
        return self._df["isleaf"].values

    @property
    def x(self) -> np.ndarray:
        return self._df["x"].values

    @property
    def y(self) -> np.ndarray:
        return self._df["y"].values

    @property
    def col(self) -> np.ndarray:
        return self._df["col"].values

    def obj2df(self) -> pd.DataFrame:
        """Reference taxonomy.py:83-86."""
        return self._df.copy()

    def df2obj(self, htree_df: pd.DataFrame) -> None:
        """Reference taxonomy.py:88-92."""
        self._df = htree_df.reset_index(drop=True)

    # -- traversal ---------------------------------------------------------

    def get_descendants(self, node: str, leafonly: bool = False) -> list:
        """All descendants of ``node`` (exclusive) — taxonomy.py:207-222.

        Cycle-safe: a self-parented root (``parent`` NaN → "root" while a
        node is itself labeled "root") would loop forever in the
        reference's BFS; visited nodes are skipped here.
        """
        descendants = []
        seen = {node}
        frontier = [c for c in self.child[self.parent == node] if c != node]
        descendants.extend(frontier)
        seen.update(frontier)
        while frontier:
            cur = frontier.pop(0)
            nxt = [c for c in self.child[self.parent == cur]
                   if c not in seen]
            seen.update(nxt)
            frontier.extend(nxt)
            descendants.extend(nxt)
        if leafonly:
            leaves = set(self.child[self.isleaf])
            descendants = [d for d in descendants if d in leaves]
        return descendants

    def get_all_descendants(self, leafonly: bool = False) -> dict:
        """taxonomy.py:224-230."""
        return {k: self.get_descendants(k, leafonly)
                for k in np.unique(np.concatenate([self.child, self.parent]))}

    def get_ancestors(self, node: str, rootnode: Optional[str] = None) -> list:
        """taxonomy.py:232-243."""
        ancestors = []
        cur = node
        seen = {node}
        while True:
            nxt = self.parent[self.child == cur]
            if len(nxt) == 0 or nxt[0] in seen:
                break
            cur = nxt[0]
            ancestors.append(cur)
            seen.add(cur)
            if rootnode is not None and cur == rootnode:
                break
        return ancestors

    def get_mergeseq(self) -> list:
        """Ordered [children, parent] merges, shallowest parent first
        (taxonomy.py:245-269)."""
        merge_parents = np.setdiff1d(self.parent, self.child[self.isleaf])
        depth = []
        for label in merge_parents:
            if np.isin(label, self.child):
                depth.append(float(self.y[self.child == label][0]))
            else:
                depth.append(float(np.max(self.y)) + 0.1)
        order = np.argsort(depth)
        queue = merge_parents[order].tolist()
        merges = []
        while len(queue) > 1:
            parent = queue.pop(0)
            merges.append([self.child[self.parent == parent].tolist(),
                           parent])
        return merges

    def get_subtree(self, node: str) -> "HTree":
        """taxonomy.py:271-279."""
        nodes = self.get_descendants(node) + [node]
        if len(nodes) <= 1:
            raise KeyError(f"node {node!r} not found in tree")
        df = self._df[self._df["child"].isin(nodes)]
        return HTree(htree_df=df)

    def update_layout(self) -> None:
        """Re-space leaves evenly, center parents over descendants
        (taxonomy.py:281-299)."""
        df = self._df
        leaves = df.loc[df["isleaf"]].sort_values("x")
        x = df["x"].values.astype(float).copy()
        for new_x, idx in enumerate(leaves.index):
            x[df.index.get_loc(idx) if isinstance(idx, str) else idx] = new_x
        df["x"] = x
        for node in df.loc[~df["isleaf"], "child"]:
            desc = self.get_descendants(node, leafonly=True)
            sel = df["child"].isin(desc)
            if sel.any():
                df.loc[df["child"] == node, "x"] = float(
                    df.loc[sel, "x"].mean())

    def get_merged_types(self, cells_labels: np.ndarray, num_classes: int = 0,
                         ref_leaf: Sequence[str] = (), node: str = "n4"):
        """Merge fine labels up the tree until ``num_classes`` remain
        (taxonomy.py:301-347).  Returns (merged_labels, mod_subtree,
        subtree)."""
        subtree = self.get_subtree(node)
        if len(ref_leaf) > 0:
            df = subtree.obj2df()
            keep_leaf = df["isleaf"] & df["child"].isin(list(ref_leaf))
            df = pd.concat([df[keep_leaf], df[~df["isleaf"]]])
            subtree = HTree(htree_df=df)

        merges = subtree.get_mergeseq()
        go = num_classes if num_classes > 0 else len(merges)

        merged = do_merges(np.array(cells_labels, dtype=object),
                           merges, go - 1)
        uniq_merged = do_merges(
            np.array(subtree.child[subtree.isleaf], dtype=object),
            merges, go - 1)

        kept_leaves = sorted(set(uniq_merged.tolist()))
        kept_nodes = set(kept_leaves)
        for n in kept_leaves:
            kept_nodes.update(subtree.get_ancestors(n))
        df = subtree.obj2df()
        df = df[df["child"].isin(kept_nodes)].copy()
        df.loc[df["child"].isin(kept_leaves), "isleaf"] = True
        df.loc[df["child"].isin(kept_leaves), "y"] = 0.0
        mod_subtree = HTree(
            htree_df=df.rename(columns={"child": "label",
                                        "isleaf": "leaf"}))
        mod_subtree.update_layout()
        return merged, mod_subtree, subtree

    def get_marker(self, exclude: Sequence[str] = ()) -> np.ndarray:
        """Marker-gene names from the leaf labels (reference
        ``HTree.get_marker``, analysis_cells_tree.py:168-198).

        Allen leaf labels are "<subclass tokens> <gene1> <gene2> ..."; every
        space-separated token after the first that is not a subclass name is
        a marker gene.  ``exclude`` replaces the default subclass list when
        given (the reference raises NameError on a non-empty ``exclude`` —
        subclass_list is only bound in the empty branch; the evident intent
        is implemented here).
        """
        subclass_list = list(exclude) if len(exclude) else [
            "L2/3", "L4", "L5", "L6", "IT", "PT", "NP", "CT", "VISp", "ALM",
            "Sst", "Vip", "Lamp5", "Pvalb", "Sncg", "Serpinf1"]
        marker_genes = []
        for ttype in self.child[self.isleaf]:
            toks = str(ttype).split(" ")[1:]  # tokens after the first
            marker_genes.extend(t for t in toks
                                if t and t not in subclass_list)
        return np.unique(marker_genes)

    # -- plotting (optional matplotlib) -------------------------------------

    def plot(self, figsize=(15, 10), fontsize=10, skeletononly=True,
             fig=None, save_path: Optional[str] = None):
        """Dendrogram skeleton plot (taxonomy.py:94-200, simplified)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if fig is None:
            fig = plt.figure(figsize=figsize)
        ax = fig.gca()
        for _, row in self._df.iterrows():
            prow = self._df[self._df["child"] == row["parent"]]
            if len(prow):
                px, py = float(prow["x"].iloc[0]), float(prow["y"].iloc[0])
                ax.plot([row["x"], row["x"], px],
                        [row["y"], py, py], "-k", linewidth=0.5)
        if not skeletononly:
            for _, row in self._df[self._df["isleaf"]].iterrows():
                ax.text(row["x"], row["y"], row["child"], rotation=90,
                        fontsize=fontsize, color=row["col"],
                        ha="center", va="top")
        ax.set_xticks([])
        if save_path:
            fig.savefig(save_path, dpi=300, bbox_inches="tight")
        return fig

    def plotnodes(self, nodelist, fig=None):
        """Overlay red square markers on the named nodes of an existing
        tree figure (reference ``HTree.plotnodes``, taxonomy.py:202-205,
        analysis_cells_tree.py:335-338)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ax = fig.gca() if fig is not None else plt.gca()
        ind = np.isin(self.child, nodelist)
        ax.plot(self.x[ind], self.y[ind], "s", color="r")
        return fig


def do_merges(labels: np.ndarray, list_changes: Sequence = (),
              n_merges: int = 0, verbose: bool = False) -> np.ndarray:
    """Apply the first ``n_merges`` horizontal cuts to a label array
    (reference taxonomy.py:351-380).  Returns the updated array."""
    assert isinstance(labels, np.ndarray), "labels must be a numpy array"
    labels = labels.copy()
    for i in range(n_merges):
        if i >= len(list_changes):
            print("Exiting after performing max allowed merges =",
                  len(list_changes))
            break
        children, parent = list_changes[i]
        for c in children:
            n = int(np.sum(labels == c))
            labels[labels == c] = parent
            if verbose:
                print(n, " in ", c, " --> ", parent)
    return labels


def simplify_tree(pruned_subtree: HTree, skip_nodes=None):
    """Remove single-child chain nodes, linking parents directly to
    grandchildren (reference taxonomy.py:382-408)."""
    tree = deepcopy(pruned_subtree)
    if skip_nodes is None:
        counts = pd.Series(tree.parent).value_counts()
        skip_nodes = counts[counts == 1].index.tolist()
    for node in skip_nodes:
        df = tree.obj2df()
        node_parent = df.loc[df["child"] == node, "parent"].unique()
        if node_parent.size == 0:
            continue  # root special case
        df.loc[df["parent"] == node, "parent"] = node_parent[0]
        df = df[(df["child"] != node)]
        tree = HTree(htree_df=df.rename(columns={"child": "label",
                                                 "isleaf": "leaf"}))
    return tree, skip_nodes


def parse_dend(htree_file: str):
    """Parse a dend CSV export into merge/descendant structures
    (reference ``parse_dend``, analysis_tree_helpers.py:122-154).

    Returns ``(list_changes, descendants, treeobj, leaves, child, parent)``:
      * ``list_changes``: ordered [children, parent] merges (get_mergeseq)
      * ``descendants``: node → all-descendant list, every node in the tree
      * ``treeobj``: the canonical sorted DataFrame in the reference's
        column schema (x, y, leaf, label, parent, col); leaf rows carry
        y = 0.0 (the reference leaves NaN and zeroes it at plot time)
      * ``leaves``/``child``/``parent``: label arrays
    """
    tree = HTree(htree_file=htree_file)
    treeobj = tree.obj2df().rename(columns={"child": "label",
                                            "isleaf": "leaf"})
    treeobj = treeobj[["x", "y", "leaf", "label", "parent", "col"]]
    child, parent = tree.child, tree.parent
    leaves = child[tree.isleaf]
    return (tree.get_mergeseq(), tree.get_all_descendants(), treeobj,
            leaves, child, parent)


def plot_htree(htree_file: str, figsize=(15, 10), fontsize=8,
               save_path: Optional[str] = None):
    """Full dendrogram plot with leaf labels from a dend CSV (reference
    ``plot_htree``, analysis_tree_helpers.py:157-196)."""
    tree = HTree(htree_file=htree_file)
    return tree.plot(figsize=figsize, fontsize=fontsize,
                     skeletononly=False, save_path=save_path)


class Node:
    """Tree node over (child, parent) label arrays (reference
    analysis_cells_tree.py:64-91): holds its children/parent names."""

    def __init__(self, name: str, C_list=(), P_list=()):
        C = np.asarray(C_list, dtype=object)
        P = np.asarray(P_list, dtype=object)
        self.name = name
        # exclude self-loops: HTree renders the root's NaN parent as "root",
        # which would make the root its own child (the reference keeps NaN)
        self.C_name_list = [c for c in (C[P == name] if C.size else [])
                            if c != name]
        self.P_name = list(P[C == name]) if C.size else []

    def __repr__(self):
        return str(self.name)

    __str__ = __repr__

    def __eq__(self, other):
        return isinstance(other, Node) and self.name == other.name

    def __hash__(self):
        return hash(self.name)

    def children(self, C_list=(), P_list=()):
        return [Node(n, C_list, P_list) for n in self.C_name_list]


def get_valid_classifications(current_node_list, C_list, P_list,
                              valid_classes: Optional[list] = None) -> list:
    """All valid 'horizontal cut' classifications of the hierarchy
    (reference ``get_valid_classifications``, analysis_cells_tree.py:93-120):
    starting from [root], repeatedly replace any node by its children;
    every reachable node multiset is one valid classification.

    ``current_node_list`` may contain Node objects or plain names.  Returns
    a list of sorted name lists (deduplicated, discovery order).  A set of
    tuples backs the membership test — the reference's ``in`` over a list
    of lists is quadratic in the (exponential) number of classifications.
    """
    if valid_classes is None:
        valid_classes = []
    nodes = [n if isinstance(n, Node) else Node(n, C_list, P_list)
             for n in current_node_list]
    seen = {tuple(c) for c in valid_classes}

    def visit(node_list):
        node_list = sorted(node_list, key=lambda n: str(n.name))
        names = [str(n.name) for n in node_list]
        key = tuple(names)
        if key in seen:
            return
        seen.add(key)
        valid_classes.append(names)
        for node in node_list:
            children = node.children(C_list=C_list, P_list=P_list)
            if children:
                expanded = [n for n in node_list if n.name != node.name]
                expanded.extend(children)
                visit(expanded)

    visit(nodes)
    return valid_classes


def flatten(nested_dict: dict, separator: str = "_",
            root_keys_to_ignore=None, replace_separators=None) -> dict:
    """Flatten a nested dict/list structure into separator-joined keys
    (reference ``flatten``, analysis_cells_tree.py:17-61 — used on the
    Allen dendrogram JSON)."""
    assert isinstance(nested_dict, dict), "flatten requires a dictionary"
    assert isinstance(separator, str), "separator must be a string"
    ignore = root_keys_to_ignore or set()
    out: dict = {}

    def mk_key(prev, new):
        new = str(new)
        if replace_separators is not None:
            new = new.replace(separator, replace_separators)
        return f"{prev}{separator}{new}" if prev else new

    def walk(obj, key):
        if not obj:
            out[key] = obj
        elif isinstance(obj, dict):
            for k, v in obj.items():
                if not (key is None and k in ignore):
                    walk(v, mk_key(key, k))
        elif isinstance(obj, (list, set, tuple)):
            for i, item in enumerate(obj):
                walk(item, mk_key(key, i))
        else:
            out[key] = obj

    walk(nested_dict, None)
    return out


def dend_json_to_df(json_file: str) -> pd.DataFrame:
    """Flatten an Allen dendrogram JSON export into the HTree CSV schema
    (reference taxonomy.py:411-512 / dend_json_to_df.py).

    Walks the nested node structure recursively (the reference flattens
    keys and re-parses index strings; a direct recursion is equivalent and
    far simpler) producing columns x/y/leaf/label/parent/col.
    """
    with open(json_file) as f:
        s = f.read().replace("\t", "").replace("\n", "")
        s = s.replace(",}", "}").replace(",]", "]")
        dend = json.loads(s)

    rows = []
    next_x = [0.0]

    def walk(node: dict, parent: Optional[str]):
        attr_key = ("leaf_attribute" if "leaf_attribute" in node
                    else "node_attribute")
        attrs = node.get(attr_key, {})
        if isinstance(attrs, list):
            attrs = attrs[0] if attrs else {}
        label = str(attrs.get("_row", attrs.get("label", f"n{len(rows)}")))
        height = float(attrs.get("height", 0.0))
        color = attrs.get("nodePar.col", attrs.get("col", "#000000"))
        children = node.get("children", [])
        is_leaf = len(children) == 0
        if is_leaf:
            x = next_x[0]
            next_x[0] += 1.0
        else:
            xs = []
            for ch in children:
                xs.append(walk(ch, label))
            x = float(np.mean(xs))
        rows.append({"x": x, "y": height, "leaf": is_leaf, "label": label,
                     "parent": parent, "col": color})
        return x

    walk(dend, None)
    return pd.DataFrame(rows)
