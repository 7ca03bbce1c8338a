"""Train the VAE-GAN augmenter to convergence on the hard-synthetic data.

Produces the one reference production artifact that existed only as parts
before round 5: the *pretrained* frozen augmenter the canonical training
path always loads (reference train.py:97-113 reads ``aug_file`` from
mmidas.toml:27; the trainer applies it every batch,
cpl_mixvae.py:422-425).  The GAN loop itself is
``augment/train.train_augmenter`` (reference semantics:
mmidas/augmentation/train.py:10-157 — gated discriminator updates at the
log(2)/2 threshold, λ=[1, .5, .1, .5] augmenter loss); this script runs it
at the reference production cadence (n_epoch=10000, batch 5000, latent 10,
noise 50 — dist/train_agumenter.py:13-20) on the hard-synthetic train
split and commits:

  * the trained augmenter checkpoint (weights stored bf16 — the production
    loop consumes them bf16; ~24 MB), and
  * the full gated-D training curves (per-epoch A/D/gen/recon/triplet
    losses + the D-skip fraction, the reference's ``n_adv`` diagnostic,
    augmentation/train.py:53-57,:83-91).

Run: ``python -m dvae_tpu.examples.hard_augmenter [--mode MSE|ZINB
--epochs 10000]``; then feed the artifact to the quality study via
``python -m dvae_tpu.examples.hard_synthetic --aug_file <ckpt>``.
"""

from __future__ import annotations

import argparse
import json
import os
import time

_ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "artifacts",
    "hard_synthetic")


def run(mode: str = "MSE", n_epochs: int = 10000, batch_size: int = 5000,
        seed: int = 546, data_seed: int = 3, epochs_per_jit: int = 50,
        out: str = "", verbose: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.augment.augmenter import save_augmenter
    from dvae_tpu.augment.train import train_augmenter
    from dvae_tpu.data.pipeline import stratified_split_indices
    from dvae_tpu.examples.hard_synthetic import _dataset

    t0 = time.time()
    ds = _dataset(data_seed)
    tr, _ = stratified_split_indices(ds.cluster_label, 0.9, data_seed)
    x = ds.log1p[tr]

    params, bn, a_cfg, hist = train_augmenter(
        x, n_epochs=n_epochs, batch_size=batch_size, mode=mode,
        seed=seed, bf16=True, epochs_per_jit=epochs_per_jit,
        verbose=verbose)

    out = out or os.path.join(_ART, f"augmenter_{mode}.ckpt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    # store weights bf16: the production loop consumes the frozen
    # augmenter bf16 (cpl_mixvae._augment_fn under tcfg.bf16), and it
    # halves the committed artifact
    params16 = jax.tree_util.tree_map(
        lambda v: np.asarray(v, np.dtype(jnp.bfloat16))
        if np.asarray(v).dtype == np.float32 else np.asarray(v), params)
    save_augmenter(out, params16, bn, a_cfg,
                   extra={"mode": mode, "n_epochs": n_epochs,
                          "batch_size": batch_size, "seed": seed,
                          "data_seed": data_seed,
                          "history_tail": hist[-5:]})

    keys = list(hist[0])
    curves = {k: [round(h[k], 5) for h in hist] for k in keys}
    summary = {
        "ckpt": out,
        "mode": mode,
        "n_epochs": n_epochs,
        "batch_size": batch_size,
        "seed": seed,
        "data_seed": data_seed,
        "wall_min": round((time.time() - t0) / 60, 1),
        "first_epoch": {k: round(hist[0][k], 4) for k in keys},
        "last_epoch": {k: round(hist[-1][k], 4) for k in keys},
        # convergence evidence: per-decile means of the differentiable
        # recon term and the D-skip fraction (the gate saturating toward 1
        # = the discriminator no longer separates real from augmented)
        "recon_decile_means": [
            round(float(np.mean([h["mse_recon"] for h in dec])), 5)
            for dec in np.array_split(np.array(hist, dtype=object), 10)],
        "d_skip_decile_means": [
            round(float(np.mean([h["d_skipped"] for h in dec])), 4)
            for dec in np.array_split(np.array(hist, dtype=object), 10)],
    }
    # curves ride NEXT TO the checkpoint (a smoke run with a /tmp out must
    # not claim the committed artifacts/ curve slot)
    curve_path = os.path.splitext(out)[0] + "_curves.json"
    with open(curve_path, "w") as fh:
        json.dump({"summary": summary, "curves": curves}, fh)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="MSE", choices=["MSE", "ZINB"])
    ap.add_argument("--epochs", type=int, default=10000)
    ap.add_argument("--batch_size", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=546)
    ap.add_argument("--data_seed", type=int, default=3)
    ap.add_argument("--epochs_per_jit", type=int, default=50)
    ap.add_argument("--out", default="")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    run(mode=args.mode, n_epochs=args.epochs, batch_size=args.batch_size,
        seed=args.seed, data_seed=args.data_seed,
        epochs_per_jit=args.epochs_per_jit, out=args.out,
        verbose=args.verbose)
