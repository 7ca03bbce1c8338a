"""Config loading, normalization, and data-prep helpers.

Equivalent capability to the reference ``mmidas/utils/tools.py``:
  * ``get_paths`` :18-58  — cached TOML config loader resolving per-dataset
    sections (anndata_file/htree_file/data_path/saving_path/aug_model/
    trained_model) against a main dir.
  * ``normalize_cellxgene`` :61 / ``logcpm`` :73-83 — L1 row normalization →
    log1p CPM.
  * ``reorder_genes`` :86-103 — rank genes by the std of their binarized
    expression (marker-gene selection).
  * ``download_file`` :106-121 — chunked HTTP download (gated import).

TOML parsing uses the stdlib ``tomllib`` (the reference depends on the
third-party ``toml``).
"""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path
from typing import Any

import numpy as np


@lru_cache(maxsize=None)
def get_paths(toml_file: str, sub_file: str = "files",
              verbose: bool = False) -> dict[str, Any]:
    """Load a TOML config and resolve existing paths to ``Path`` objects.

    Same contract as the reference: ``config['paths']['main_dir']`` is the
    cwd; values in [paths] and the ``sub_file`` dataset section become
    ``Path`` when they exist on disk.
    """
    import tomllib

    package_dir = Path(os.getcwd())
    config_file = package_dir / toml_file
    if not config_file.is_file():
        print(f"Did not find project`s toml file: {config_file}")
        return {}
    with open(config_file, "rb") as f:
        config = tomllib.load(f)
    config.setdefault("paths", {})["main_dir"] = package_dir
    if verbose:
        for key, val in config.items():
            print(f"{key}: {val}")
    for section in ("paths", sub_file):
        for k, v in list(config.get(section, {}).items()):
            if isinstance(v, str) and Path(v).exists():
                config[section][k] = Path(v)
    return config


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    On this framework's target topology the XLA compiler is often REMOTE
    (a TPU-runtime compile service): a cold production-shape executable
    can take tens of minutes to build, and every fresh process — a resumed
    training run, the soak orchestrator's second ``cli evaluate``, a bench
    retry — pays it again.  The persistent cache serializes executables
    keyed by HLO+options hash, so repeat invocations load instead of
    recompile.  (The reference world has no analogue — torch CUDA kernels
    JIT per-op in seconds; an XLA whole-program compile is the price of
    the fused step, and this is its amortization.)

    Resolution order: explicit ``path`` arg → ``DVAE_COMPILE_CACHE`` env
    (the value ``0`` disables entirely) → ``<repo>/.jax_cache``.  Only
    compiles slower than 2 s are written (keeps test-suite noise out).
    Backends whose PJRT plugin cannot serialize executables simply log a
    warning and proceed uncached — enabling is always safe.

    The implicit repo default is NOT enabled when jax is pinned to the
    CPU platform (the test/dryrun mesh): XLA:CPU serializes AOT machine
    code, so a repo-local cache shared across hosts would load executables
    compiled for another machine's ISA (observed: avx512/amx feature
    mismatch warnings, documented SIGILL risk) — and CPU compiles are
    cheap to redo anyway.  An explicit ``path`` or env value still forces
    caching on any platform.

    Returns the cache dir, or None when disabled.
    """
    env = os.environ.get("DVAE_COMPILE_CACHE", "")
    if env == "0":
        return None
    import jax
    if path is None and not env:
        if (jax.config.jax_platforms or "").split(",")[0] == "cpu":
            return None
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    elif path is None:
        path = env
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # unknown config name on an old jax: stay uncached
        return None
    return path


def normalize_cellxgene(x: np.ndarray) -> np.ndarray:
    """L1-normalize each cell's expression row (reference :61-70)."""
    x = np.asarray(x, dtype=np.float64)
    sums = np.abs(x).sum(axis=1, keepdims=True)
    sums[sums == 0] = 1.0
    return x / sums


def logcpm(x: np.ndarray, scaler: float = 1e6) -> np.ndarray:
    """log1p counts-per-million (reference :73-83)."""
    return np.log1p(normalize_cellxgene(x) * scaler)


def reorder_genes(x: np.ndarray, chunksize: int = 1000,
                  eps: float = 1e-1) -> np.ndarray:
    """Rank genes by binarized-expression std, descending (reference
    :86-103).  Genes with binarized std ≤ eps are dropped.  Chunking bounds
    peak memory on wide matrices."""
    t_gene = x.shape[1]
    g_bin_std = []
    for i in range(t_gene // chunksize + 1):
        lo, hi = i * chunksize, min(t_gene, (i + 1) * chunksize)
        if lo >= hi:
            break
        x_bin = np.where(x[:, lo:hi] > eps, 1, 0)
        g_bin_std.append(np.std(x_bin, axis=0))
    g_bin_std = np.concatenate(g_bin_std)
    order = np.argsort(g_bin_std)
    kept = order[np.sort(g_bin_std) > eps]
    return kept[::-1]


def download_file(url: str, local_filename: str,
                  chunk_size: int = 10000) -> None:
    """Chunked HTTP download (reference :106-121)."""
    import requests

    with requests.get(url, stream=True) as response:
        response.raise_for_status()
        with open(local_filename, "wb") as f:
            for chunk in response.iter_content(chunk_size=chunk_size):
                f.write(chunk)
