"""Continuous-state traversal study.

Equivalent capability to the reference's state-traversal analysis (the
missing ``notebooks/5_state_traversal.ipynb``; behavior recoverable from
``mixVAE_model.state_changes``, mmidas/nn_model.py:370-411 — SURVEY.md
appendix A): hold a cell's categorical assignment fixed, sweep one
continuous state dimension through its posterior, and watch which genes
respond.

Run: ``python -m dvae_tpu.examples.state_traversal --ckpt <path>``
(falls back to a freshly-initialized model on synthetic data).
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.analysis.tree_based import corr_analysis
from dvae_tpu.config import VAEConfig
from dvae_tpu.models import mixvae


def traversal_study(cfg: VAEConfig, params, bn, x: np.ndarray,
                    d_s: int = 0, n_samp: int = 50,
                    key: Optional[jax.Array] = None) -> dict:
    """Sweep state dim ``d_s``; return reconstructions, swept values, and
    the genes most correlated with the swept dimension."""
    key = jax.random.key(0) if key is None else key
    xj = jnp.asarray(x, jnp.float32)
    recon, s_vals = mixvae.state_changes(params, bn, cfg, xj, d_s=d_s,
                                         key=key, n_samp=n_samp)
    recon = np.asarray(recon)      # (A, n_samp, B, D)
    s_vals = np.asarray(s_vals)    # (A, n_samp, B)

    # response of each gene to the sweep: correlation of the (sample-axis)
    # reconstruction trajectory with the swept state value, per arm
    arm0 = recon[0].reshape(n_samp * x.shape[0], -1)
    state0 = s_vals[0].reshape(n_samp * x.shape[0], 1)
    corr, gene_order = corr_analysis(state0, arm0)
    return {"recon": recon, "s_vals": s_vals,
            "gene_corr_sorted": corr[0],
            "gene_order": gene_order[0]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--d_s", type=int, default=0)
    ap.add_argument("--n_samp", type=int, default=50)
    args = ap.parse_args()

    if args.ckpt:
        from dvae_tpu.models.api import load_vae
        cfg, params, bn, _ = load_vae(args.ckpt)
        from dvae_tpu.data.anndata_io import synthetic_dataset
        ds = synthetic_dataset(64, cfg.input_dim, min(cfg.n_categories, 10))
        x = ds.log1p
    else:
        cfg = VAEConfig(n_categories=10, input_dim=100, fc_dim=16,
                        lowD_dim=8, n_arm=2, tau=0.1)
        params = mixvae.init_params(jax.random.key(0), cfg)
        bn = mixvae.init_bn_state(cfg)
        from dvae_tpu.data.anndata_io import synthetic_dataset
        x = synthetic_dataset(64, 100, 10).log1p

    out = traversal_study(cfg, params, bn, x, d_s=args.d_s,
                          n_samp=args.n_samp)
    top = out["gene_order"][-10:][::-1]
    print(f"state dim {args.d_s}: top responding genes {top.tolist()}")
    print(f"max |corr| {out['gene_corr_sorted'][-1]:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
