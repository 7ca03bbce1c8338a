"""Production-scale end-to-end run: the reference's A2-E100000 recipe.

Reproduces the quality evidence quoted in the README: train the coupled
mixVAE at the full reference production shape — D=5032 genes, C=92
categories, B=5000, A=2 arms (train-scripts/run-train-A2-E100000,
reference train.py defaults) — on planted-structure synthetic data with
92 types, using the TPU fast path (bf16 + fused Pallas kernels + hardware
RNG + block shuffle).  Then score the reference's north-star metrics
(evaluation.py:25-41): adjusted mutual information of each arm's labels
against the planted ground truth, plus arm-arm agreement.

Measured (v5e-1, 2026-08): ~0.004 s/epoch; the consensus peak (~0.69)
lands near epoch 18k (~2 min); AMI vs planted labels 0.946 for both arms
at the peak checkpoint.  ``--mode ZINB`` (the three-head zero-inflated-NB
loss, reference nn_model.py:642-676) reaches AMI 0.926/0.924 (arm-arm
0.917) at its epoch-18k consensus peak — 18 min wall for 25k epochs.  Note the *consensus* metric (mean diagonal over
all C categories, reference _utils.py:127) has a structural ceiling of
n_used_categories / C — overlapping planted types merge, so AMI is the
cleaner recovery score.  An optional pruning phase (reference
cpl_mixvae.py:996-1444) then removes zero-agreement categories.

Run: ``python -m dvae_tpu.examples.production_scale
[--epochs 20000 --prune-iters 0 --folder OUT]``
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def run(n_epoch: int = 20000, prune_iters: int = 0, n_epoch_p: int = 1000,
        folder: str = "", seed: int = 3, verbose: bool = True,
        mode: str = "MSE", n_arm: int = 2, align_every: int = 0) -> dict:
    import numpy as np

    from dvae_tpu.data.anndata_io import synthetic_dataset
    from dvae_tpu.data.pipeline import stratified_split_indices
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    t0 = time.time()
    ds = synthetic_dataset(n_cells=20000, n_genes=5032, n_types=92,
                           seed=seed)
    tr, te = stratified_split_indices(ds.cluster_label, 0.9, seed)
    folder = folder or tempfile.mkdtemp(prefix="prod_scale_")
    cpl = CplMixVAE(saving_folder=folder, seed=seed)
    cpl.init_model(n_categories=92, input_dim=5032, n_arm=n_arm, lam=5.0,
                   batch_size=5000, epochs_per_jit=500, bf16=True,
                   rng_impl="rbg", shuffle_block=8, mode=mode,
                   align_arms_every=align_every)
    cpl.train(ds.log1p[tr], x_val=ds.log1p[te], n_epoch=n_epoch,
              n_epoch_p=n_epoch_p if prune_iters else 0,
              max_prun_it=prune_iters, early_stop_consensus=0.75,
              save_plots=False)

    # best-consensus state → north-star metrics on held-out cells
    cpl.load_model(f"{folder}/cpl_mixVAE_model_best_train.ckpt")
    from sklearn.metrics import adjusted_mutual_info_score
    labels = cpl._predict_labels(ds.log1p[te], 1.0)
    true = ds.cluster_id[te]
    res = cpl.eval_model(ds.log1p[te])
    out = {
        "folder": folder,
        "n_arm": n_arm,
        "align_every": align_every,
        "wall_min": round((time.time() - t0) / 60, 1),
        "final_epoch": int(cpl.state.epoch),
        "categories_remaining": int(np.asarray(cpl.state.mask).sum()),
        "test_consensus": float(res["consensus"]),
        "ami_vs_truth": [
            float(adjusted_mutual_info_score(true, labels[a]))
            for a in range(labels.shape[0])],
        "ami_arm_arm": float(np.mean([
            adjusted_mutual_info_score(labels[a], labels[b])
            for a in range(labels.shape[0]) for b in range(a)])),
    }
    if verbose:
        print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20000)
    ap.add_argument("--prune-iters", type=int, default=0)
    ap.add_argument("--folder", type=str, default="")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--mode", type=str, default="MSE",
                    choices=["MSE", "ZINB"],
                    help="reconstruction mode (ZINB: the three-head "
                         "zero-inflated NB loss, reference "
                         "nn_model.py:642-676)")
    ap.add_argument("--arms", type=int, default=2)
    ap.add_argument("--align_every", type=int, default=0,
                    help="Hungarian cross-arm category alignment cadence "
                         "(train/alignment.py; 0 = off)")
    args = ap.parse_args()
    run(n_epoch=args.epochs, prune_iters=args.prune_iters,
        folder=args.folder, seed=args.seed, mode=args.mode,
        n_arm=args.arms, align_every=args.align_every)
