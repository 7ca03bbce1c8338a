"""Generate the vendored .h5ad reader fixtures under tests/fixtures/.

Two tiny files exercise the real-data input layer
(dvae_tpu/data/anndata_io.py; reference contract
mmidas/utils/dataloader.py:13-70) against the two on-disk layouts found
in the wild:

  * ``tiny_modern_csr.h5ad``  — anndata>=0.8 layout: CSR X group,
    dataframe-encoded obs with a categorical ``cluster`` column, numeric
    and string extra columns, full encoding-type/-version attrs.
  * ``tiny_legacy07.h5ad``    — anndata-0.7.x vintage: h5sparse X group,
    per-column obs datasets with object-reference categoricals into
    ``obs/__categories`` (the Allen-atlas-era layout of the reference's
    Mouse_ALM-VISp_cpm.h5ad).

When the REAL anndata library is importable the modern fixture is written
by anndata itself (the gold standard); otherwise the spec-faithful
h5py-native writer produces the identical layout.  ``expected.json``
records the exact dense matrix and labels for byte-level test assertions.

Regenerate with:  python scripts/make_anndata_fixture.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")

N, D, K = 40, 12, 4


def _data():
    r = np.random.default_rng(20260819)
    X = (r.gamma(1.5, 1.0, (N, D)) * (r.random((N, D)) > 0.55)).astype(
        np.float32)
    labels = np.array([f"type_{chr(97 + i % K)}" for i in range(N)])
    genes = np.array([f"Gene-{j:03d}" for j in range(D)])
    depth = r.integers(1000, 9000, N).astype(np.int64)
    sample = np.array([f"s{i % 3}" for i in range(N)])
    return X, labels, genes, depth, sample


def _write_modern(path, X, labels, genes, depth, sample) -> str:
    try:
        import anndata
        import pandas as pd

        obs = pd.DataFrame({
            "cluster": pd.Categorical(labels),
            "depth": depth,
            "sample": sample,
        }, index=[f"cell_{i}" for i in range(N)])
        var = pd.DataFrame(index=pd.Index(genes))
        import scipy.sparse as sp

        ad = anndata.AnnData(X=sp.csr_matrix(X), obs=obs, var=var)
        ad.write_h5ad(path)
        return "anndata"
    except ImportError:
        from dvae_tpu.data.anndata_io import write_h5ad

        write_h5ad(path, X, genes, labels,
                   obs={"depth": depth, "sample": sample}, sparse="csr")
        return "h5py-native (anndata layout)"


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    X, labels, genes, depth, sample = _data()

    writer = _write_modern(os.path.join(FIXDIR, "tiny_modern_csr.h5ad"),
                           X, labels, genes, depth, sample)

    from dvae_tpu.data.anndata_io import write_h5ad_legacy07

    write_h5ad_legacy07(os.path.join(FIXDIR, "tiny_legacy07.h5ad"),
                        X, genes, labels, obs={"depth": depth},
                        sparse=True)

    with open(os.path.join(FIXDIR, "expected.json"), "w") as f:
        json.dump({
            "writer_modern": writer,
            "n": N, "d": D,
            "X": X.astype(np.float64).tolist(),  # f32→f64 exact
            "cluster": labels.tolist(),
            "genes": genes.tolist(),
            "depth": depth.tolist(),
            "sample": sample.tolist(),
        }, f)
    print(f"fixtures written to {FIXDIR} (modern X writer: {writer})")


if __name__ == "__main__":
    main()
