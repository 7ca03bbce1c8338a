"""Checkpoint save/load for training-state pytrees.

Equivalent capability to the reference's ``torch.save({'model_state_dict',
'optimizer_state_dict'}, path)`` checkpoints (mmidas/cpl_mixvae.py:782-788)
with the same cadence/naming semantics, TPU-native:

  * primary format is **orbax** (async-capable, sharding-aware — restores
    distributed arrays directly to their device placements);
  * a dependency-light **pickle-of-numpy** fallback keeps checkpoints
    readable anywhere (orbax requires a directory per step; pickle writes
    one file, mirroring the reference's single ``.pth``).

File naming matches the reference (``cpl_mixVAE_model_epoch_{e}``,
cpl_mixvae.py:778-780) so checkpoint-discovery-by-glob + max-epoch-parse
(mmidas/model.py:211-229) carries over.
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Any, metadata: Optional[dict] = None,
                    use_orbax: bool = False) -> str:
    """Save a pytree (+ small metadata dict). Returns the written path."""
    if use_orbax:
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, {"tree": _to_numpy(tree),
                          "metadata": metadata or {}}, force=True)
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"tree": _to_numpy(tree), "metadata": metadata or {}}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    return path


def load_checkpoint(path: str, use_orbax: Optional[bool] = None):
    """Load (tree, metadata). Auto-detects format."""
    if use_orbax is None:
        use_orbax = os.path.isdir(path)
    if use_orbax:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        out = ckptr.restore(os.path.abspath(path))
        return out["tree"], out.get("metadata", {})
    with open(path, "rb") as f:
        out = pickle.load(f)
    return out["tree"], out.get("metadata", {})


def abstract_like(tree):
    """ShapeDtypeStruct pytree carrying each leaf's sharding — the restore
    template for ``restore_sharded`` (build it from a freshly-initialized,
    device_put state; no checkpoint bytes needed)."""

    def one(x):
        if not hasattr(x, "dtype"):
            x = np.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                    sharding=getattr(x, "sharding", None))

    return jax.tree_util.tree_map(one, tree)


def save_sharded(path: str, tree: Any, metadata: Optional[dict] = None) -> str:
    """Distributed orbax save of a sharded pytree.

    Unlike ``save_checkpoint`` (which gathers to host numpy — the
    single-host path), leaves stay ``jax.Array``s with their shardings: in
    a multi-process job EVERY process calls this collectively and writes
    only its addressable shards, coordinated through the jax.distributed
    client.  This is the multi-host resume path the reference never built
    (SURVEY §5.4: FullStateDictConfig/StateDictType imported at
    train.py:14-16 but never used).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if metadata and jax.process_index() == 0:
        import json
        with open(os.path.join(path, "dvae_meta.json"), "w") as f:
            json.dump(metadata, f)
    return path


def restore_sharded(path: str, template: Any):
    """Restore a ``save_sharded`` checkpoint directly to device placements.

    ``template``: a pytree of jax.Arrays (or ShapeDtypeStructs) whose
    shardings define where each restored leaf lands — pass the freshly
    initialized, device_put training state (or ``abstract_like`` of it).
    Returns (tree, metadata).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(path, abstract_like(template))
    meta_path = os.path.join(path, "dvae_meta.json")
    metadata = {}
    if os.path.exists(meta_path):
        import json
        with open(meta_path) as f:
            metadata = json.load(f)
    return out, metadata


_EPOCH_RE = re.compile(r"_epoch_(\d+)")


def parse_epoch(filename: str) -> int:
    """Epoch number from a checkpoint filename; -1 if absent
    (reference mmidas/_utils.py:289-293)."""
    m = _EPOCH_RE.search(os.path.basename(filename))
    return int(m.group(1)) if m else -1


def _run_base(base: str, prefix: str) -> str:
    """Join the run-folder base and prefix: a bare directory base gets a
    path separator (``results`` → ``results/K92..._RUN0``, not a mashed
    sibling ``resultsK92..._RUN0``); bases already ending in a separator
    (or empty) keep the reference's plain-concatenation contract."""
    if base and not base.endswith(os.sep):
        return base + os.sep + prefix
    return f"{base}{prefix}"


def latest_run_dir(base: str, prefix: str = "") -> Optional[str]:
    """Newest existing ``{base}{prefix}_RUN{n}`` folder (the --resume
    counterpart of ``make_run_dir``), or None when none exist."""
    runs = glob.glob(f"{_run_base(base, prefix)}_RUN*")

    def num(p: str) -> int:
        m = re.search(r"_RUN(\d+)$", p)
        return int(m.group(1)) if m else -1

    runs = [r for r in runs if num(r) >= 0]
    return max(runs, key=num) if runs else None


def latest_checkpoint(folder: str, pattern: str = "*_epoch_*") -> Optional[str]:
    """Checkpoint discovery: glob + max epoch (reference
    mmidas/model.py:211-229)."""
    files = glob.glob(os.path.join(folder, pattern))
    files = [f for f in files if parse_epoch(f) >= 0]
    return max(files, key=parse_epoch) if files else None


def newest_checkpoint(folder: str,
                      pattern: str = "*.ckpt") -> Optional[str]:
    """Newest checkpoint by mtime — also finds tag-only checkpoints
    (``best_*``) that carry no parseable epoch.  Used as the fallback when
    ``latest_checkpoint`` comes up empty (e.g. a NaN-halt before the first
    every-k epoch save, where only a ``best_train`` file exists)."""
    if not folder:
        return None
    files = glob.glob(os.path.join(folder, pattern))
    return max(files, key=os.path.getmtime) if files else None


def compare_pytrees(a, b, rtol: float = 0.0, atol: float = 0.0) -> dict:
    """Structural + numerical comparison of two pytrees.

    The reference's ``compare_state_dicts`` (mmidas/_utils.py:296-310)
    reports key and value mismatches between torch state dicts; this is the
    pytree analogue.  Returns {'match': bool, 'structure_equal': bool,
    'mismatched_paths': [...]}.
    """
    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    if ta != tb:
        return {"match": False, "structure_equal": False,
                "mismatched_paths": ["<tree structure differs>"]}
    bad = []
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    for (path, x), y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        if x.shape != y.shape or not np.allclose(x, y, rtol=rtol, atol=atol):
            bad.append(jax.tree_util.keystr(path))
    return {"match": not bad, "structure_equal": True,
            "mismatched_paths": bad}


def make_run_dir(base: str, prefix: str = "") -> str:
    """Auto-incrementing ``{base}{prefix}_RUN{n}`` run folders
    (reference train.py:39-46; ``_run_base`` adds the separator when the
    base is a bare directory)."""
    stem = _run_base(base, prefix)
    n = 0
    while os.path.exists(f"{stem}_RUN{n}"):
        n += 1
    path = f"{stem}_RUN{n}"
    os.makedirs(path, exist_ok=True)
    return path
