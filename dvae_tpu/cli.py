"""Command-line entry points: train, evaluate, train-augmenter.

Equivalent capability to the reference CLIs — root ``train.py`` (argparse
:172-267, TOML dataset resolution :38-78, auto _RUN{n} folders :39-46),
``evaluation.py`` (:92-127), and ``dist/train_agumenter.py`` — unified as
subcommands of one CLI:

    python -m dvae_tpu.cli train --n_arm 2 --n_epoch 1000 ...
    python -m dvae_tpu.cli evaluate --ckpt ...
    python -m dvae_tpu.cli train-augmenter --n_epoch 50 ...

Flag names match the reference so SLURM scripts carry over.  When no
--dataset/--toml is given (or the h5ad is absent) a synthetic dataset with
the same statistical shape is used, so the full stack runs anywhere.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _add_model_flags(p: argparse.ArgumentParser) -> None:
    """The reference's mixVAE hyperparameter set (train.py:172-267)."""
    p.add_argument("--n_categories", type=int, default=92)
    p.add_argument("--state_dim", type=int, default=2)
    p.add_argument("--n_arm", type=int, default=2)
    p.add_argument("--temp", type=float, default=1.0)
    p.add_argument("--tau", type=float, default=0.005)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--lam", type=float, default=1.0)
    p.add_argument("--lam_pc", type=float, default=1.0)
    p.add_argument("--latent_dim", type=int, default=10)
    p.add_argument("--fc_dim", type=int, default=100)
    p.add_argument("--p_drop", type=float, default=0.5)
    p.add_argument("--s_drop", type=float, default=0.2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--hard", action="store_true")
    p.add_argument("--variational", type=bool, default=True)
    p.add_argument("--ref_pc", action="store_true",
                   help="couple to the reference prior (ref_prior mode)")
    p.add_argument("--loss_mode", type=str, default="MSE",
                   choices=["MSE", "ZINB"])
    p.add_argument("--pretrained_model", type=str, default=None)
    p.add_argument("--n_pr", type=int, default=0)


def _add_data_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--toml", type=str, default="dvae.toml")
    p.add_argument("--dataset", type=str, default="mouse_smartseq")
    p.add_argument("--n_gene", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="force synthetic data")
    p.add_argument("--syn_hard", action="store_true",
                   help="use the hard-mode ZINB-count synthetic generator "
                        "(library-size variation, dropout, hierarchically "
                        "overlapping types; data/anndata_io."
                        "hard_synthetic_dataset) instead of the planted-"
                        "Gaussian one")
    p.add_argument("--syn_cells", type=int, default=5000)
    p.add_argument("--syn_genes", type=int, default=500)
    p.add_argument("--syn_types", type=int, default=20)


def _load_dataset(args):
    """TOML-resolved h5ad when available, else synthetic."""
    from dvae_tpu.data.anndata_io import (hard_synthetic_dataset, load_data,
                                          synthetic_dataset)
    from dvae_tpu.utils.tools import get_paths

    if getattr(args, "syn_hard", False):
        print("using HARD synthetic dataset (ZINB counts)")
        return hard_synthetic_dataset(
            n_cells=args.syn_cells, n_genes=args.syn_genes,
            n_types=args.syn_types, seed=args.seed)
    if not args.synthetic and os.path.exists(args.toml):
        config = get_paths(toml_file=args.toml, sub_file=args.dataset)
        sec = config.get(args.dataset, {})
        f = (config["paths"]["main_dir"] / str(sec.get("data_path", ""))
             / str(sec.get("anndata_file", "")))
        if sec.get("anndata_file") and f.is_file():
            return load_data(str(f), n_gene=args.n_gene)
    print("using synthetic dataset")
    return synthetic_dataset(n_cells=args.syn_cells, n_genes=args.syn_genes,
                             n_types=args.syn_types, seed=args.seed)


def cmd_train(args) -> int:
    from dvae_tpu.config import MeshConfig
    from dvae_tpu.data.pipeline import stratified_split_indices
    from dvae_tpu.parallel.runtime import initialize_distributed
    from dvae_tpu.train.cpl_mixvae import CplMixVAE
    from dvae_tpu.utils.checkpoint import (latest_checkpoint,
                                           latest_run_dir, make_run_dir)

    # multi-host (DCN) bootstrap — no-op single-process (the reference's
    # rendezvous env block, mmidas/_dist_utils.py:12-48)
    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)
    ds = _load_dataset(args)
    run_prefix = (
        f"K{args.n_categories}_S{args.state_dim}_AUG{bool(args.aug_file)}"
        f"_LR{args.lr}_A{args.n_arm}_B{args.batch_size}"
        f"_E{args.n_epoch}_Ep{args.n_epoch_p}")
    if args.resume:
        # reuse the NEWEST existing run dir and continue from its latest
        # checkpoint (the preemption/elastic loop: a killed job restarts
        # with the same command + --resume)
        folder = latest_run_dir(args.saving_folder or "results/",
                                run_prefix)
        if folder is None:
            print("--resume: no existing run folder; starting fresh")
            folder = make_run_dir(args.saving_folder or "results/",
                                  run_prefix)
    else:
        folder = make_run_dir(args.saving_folder or "results/", run_prefix)
    print(f"run folder: {folder}")

    tr, te = stratified_split_indices(ds.cluster_label, 0.9, args.seed)
    cpl = CplMixVAE(saving_folder=folder, aug_file=args.aug_file,
                    seed=args.seed, use_wandb=args.wandb)
    mesh = MeshConfig(data=args.mesh_data, arm=args.mesh_arm,
                      fsdp=args.mesh_fsdp)
    cpl.init_model(
        n_categories=args.n_categories, state_dim=args.state_dim,
        input_dim=ds.n_genes, fc_dim=args.fc_dim, lowD_dim=args.latent_dim,
        x_drop=args.p_drop, s_drop=args.s_drop, lr=args.lr, lam=args.lam,
        lam_pc=args.lam_pc, n_arm=args.n_arm, temp=args.temp, tau=args.tau,
        beta=args.beta, hard=args.hard, variational=args.variational,
        ref_prior=args.ref_pc, trained_model=args.pretrained_model,
        n_pr=args.n_pr, mode=args.loss_mode, batch_size=args.batch_size,
        epochs_per_jit=args.epochs_per_jit, sharding=args.sharding,
        mesh=mesh, bf16=args.bf16, optimizer=args.optimizer,
        fused={"auto": None, "on": True, "off": False}[args.fused],
        shuffle_block=args.shuffle_block, stream=args.stream,
        ckpt_every=args.ckpt_every, eval_every=args.eval_every,
        rng_impl=args.rng_impl, align_arms_every=args.align_every,
        local_bn_stats=args.local_bn_stats)
    done = 0
    if args.resume:
        from dvae_tpu.utils.checkpoint import newest_checkpoint
        # epoch-numbered files first; fall back to tag-only checkpoints
        # (best_*) — e.g. after a NaN halt before the first every-k save
        ckpt = latest_checkpoint(folder) or newest_checkpoint(folder)
        if ckpt:
            epoch = cpl.load_model(ckpt)
            # subtract MAIN-phase epochs only: state.epoch also counts
            # pruning epochs, and the prune budget continues separately
            # via resume_progress["pr_it"] inside train()
            done = int(cpl.resume_progress.get("main_epochs", epoch))
            print(f"resumed from {ckpt} (epoch {epoch}, "
                  f"main epochs done {done})")
    path = cpl.train(ds.log1p[tr], x_val=ds.log1p[te],
                     n_epoch=max(args.n_epoch - done, 0),
                     n_epoch_p=args.n_epoch_p,
                     c_p=ds.c_p, train_idx=tr, val_idx=te,
                     min_con=args.min_con,
                     max_prun_it=args.max_prun_it, temp=args.temp)
    print(f"final checkpoint: {path}")
    return 0


def cmd_import_torch(args) -> int:
    from dvae_tpu.utils.torch_import import (_load_torch,
                                             import_augmenter_checkpoint,
                                             import_mixvae_checkpoint)
    kind, ckpt = args.kind, None
    if kind == "auto":
        ckpt = _load_torch(args.path)   # loaded once, reused below
        kind = "augmenter" if "netA" in ckpt else "model"
    if kind == "augmenter":
        out = import_augmenter_checkpoint(args.path, args.out, ckpt=ckpt)
    else:
        out = import_mixvae_checkpoint(
            args.path, args.out, import_optimizer=not args.no_optimizer,
            ckpt=ckpt)
    print(f"imported {kind} checkpoint -> {out}")
    return 0


def cmd_evaluate(args) -> int:
    from dvae_tpu.eval.evaluate import (avg_consensus, avg_max, mutinfo,
                                        summarize_inference)
    from dvae_tpu.train.cpl_mixvae import CplMixVAE
    from dvae_tpu.utils.checkpoint import latest_checkpoint

    ds = _load_dataset(args)
    ckpt = args.ckpt or latest_checkpoint(args.saving_folder or ".")
    if not ckpt:
        print("no checkpoint found", file=sys.stderr)
        return 1
    # NO init_model here: a fresh instance lets load_model (inside
    # summarize_inference) rebuild cfg/tcfg from the checkpoint metadata —
    # an init from CLI defaults would pin the wrong mode/arms/ref_prior
    # and crash or silently mis-evaluate non-default checkpoints
    cpl = CplMixVAE(saving_folder=args.saving_folder or ".")
    preds = summarize_inference(cpl, ckpt, ds.log1p)
    n_arm = preds["pred_label"].shape[0]
    if n_arm != args.n_arm:
        print(f"note: checkpoint has {n_arm} arms (flag said {args.n_arm})")
    mis = [avg_max(mutinfo(preds["c_prob"][a], ds.c_onehot.astype(int)))
           for a in range(n_arm)]
    consensus = avg_consensus(preds["pred_label"])
    res = {"pairwise": consensus["pairwise"], "all": consensus["all"],
           "mi": mis, "avg_mi": float(np.mean(mis)), "arms": n_arm,
           "consensus": preds["consensus"]}
    os.makedirs("evaluation", exist_ok=True)
    out = (f"evaluation/A{n_arm}-RUN{args.run}-E{args.n_epoch}.npy")
    np.save(out, res)  # reference artifact contract (evaluation.py:126)
    print(json.dumps(res, default=float))
    return 0


def cmd_train_augmenter(args) -> int:
    from dvae_tpu.augment.augmenter import AugmenterConfig
    from dvae_tpu.augment.train import train_augmenter

    ds = _load_dataset(args)
    cfg = AugmenterConfig(noise_dim=args.noise_dim, latent_dim=args.z_dim,
                          input_dim=ds.n_genes, n_dim=args.n_dim,
                          p_drop=args.p_drop)
    out = args.out or (f"trained_augmenter_bs_{args.batch_size}"
                       f"_dn_{args.noise_dim}_dz_{args.z_dim}"
                       f"_l1_{args.lambda_[0]}_l2_{args.lambda_[1]}"
                       f"_l3_{args.lambda_[2]}_l4_{args.lambda_[3]}.ckpt")
    train_augmenter(ds.log1p, cfg, n_epochs=args.n_epoch,
                    batch_size=args.batch_size, lr=args.lr,
                    lambdas=tuple(args.lambda_), alpha=args.alpha,
                    mode=args.mode, seed=args.seed, saving_path=out,
                    bf16=getattr(args, "gan_bf16", False))
    print(f"saved augmenter: {out}")
    return 0


def main(argv=None) -> int:
    # DVAE_PLATFORM=cpu|tpu pins the JAX backend.  The env-var route
    # (JAX_PLATFORMS) is dead on containers whose sitecustomize pins a
    # plugin; the config update post-import, pre-backend-init is reliable
    # (same recipe as tests/conftest.py).
    plat = os.environ.get("DVAE_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    # persistent executable cache: repeat invocations (resume, re-evaluate,
    # bench retries) skip the remote XLA compile — see tools.enable_compile_cache
    from dvae_tpu.utils.tools import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser(prog="dvae_tpu",
                                     description=__doc__.splitlines()[0])
    sub = parser.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train", help="train a coupled mixVAE")
    _add_model_flags(pt)
    _add_data_flags(pt)
    pt.add_argument("--n_epoch", type=int, default=50000)
    pt.add_argument("--n_epoch_p", type=int, default=0)
    pt.add_argument("--max_prun_it", type=int, default=0)
    pt.add_argument("--min_con", type=float, default=0.99)
    pt.add_argument("--batch_size", type=int, default=5000)
    pt.add_argument("--epochs_per_jit", type=int, default=10)
    pt.add_argument("--ckpt_every", type=int, default=10,
                    help="epoch-checkpoint cadence (reference "
                         "cpl_mixvae.py:777; raise for long runs — each "
                         "production-shape checkpoint is ~10s of MB)")
    pt.add_argument("--eval_every", type=int, default=10,
                    help="validation/consensus logging cadence (epochs)")
    pt.add_argument("--rng_impl", type=str, default="threefry2x32",
                    choices=["threefry2x32", "rbg"],
                    help="rbg = TPU hardware RNG (faster dropout/gumbel "
                         "draws; different stream than the default)")
    pt.add_argument("--aug_file", type=str, default=None)
    pt.add_argument("--saving_folder", type=str, default="")
    pt.add_argument("--seed", type=int, default=546)
    pt.add_argument("--optimizer", type=str, default="adam",
                    choices=["adam", "adamw"])
    pt.add_argument("--sharding", type=str, default="no",
                    choices=["full", "grad-op", "no", "hybrid",
                             "hybrid-zero2", "ddp"])
    pt.add_argument("--mesh_data", type=int, default=1)
    pt.add_argument("--mesh_arm", type=int, default=1)
    pt.add_argument("--mesh_fsdp", type=int, default=1)
    pt.add_argument("--coordinator", type=str, default=None,
                    help="multi-host coordinator address host:port "
                         "(jax.distributed.initialize)")
    pt.add_argument("--num_processes", type=int, default=None)
    pt.add_argument("--process_id", type=int, default=None)
    pt.add_argument("--bf16", action="store_true")
    pt.add_argument("--fused", type=str, default="auto",
                    choices=["auto", "on", "off"],
                    help="fused Pallas hot-path kernels (auto: on for TPU "
                         "backend in MSE mode)")
    pt.add_argument("--shuffle_block", type=int, default=1,
                    help="epoch-shuffle granularity in rows (1 = exact "
                         "per-row reshuffle, reference semantics)")
    pt.add_argument("--resume", action="store_true",
                    help="reuse the newest matching _RUN{n} folder and "
                         "continue from its latest checkpoint (the "
                         "preemption/elastic restart loop)")
    pt.add_argument("--stream", action="store_true",
                    help="keep the dataset on the host and double-buffer "
                         "batches to the device per step (for datasets "
                         "larger than HBM; data/stream.py)")
    pt.add_argument("--align_every", type=int, default=0,
                    help="cadence (epochs) of Hungarian cross-arm category "
                         "alignment (0 = off, reference semantics; "
                         "train/alignment.py — collapses the category-"
                         "index search that dominates consensus "
                         "convergence on hard data)")
    pt.add_argument("--local_bn_stats", action="store_true",
                    help="reference-DDP BN fidelity: per-shard (ghost) "
                         "batch-norm statistics over the data-parallel "
                         "row blocks instead of the default global "
                         "SyncBatchNorm-style stats (models/mixvae.py "
                         "_batch_norm; mmidas/nn_model.py:208-255 under "
                         "DDP)")
    pt.add_argument("--wandb", action="store_true")
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("evaluate", help="consensus + adjusted-MI metrics")
    _add_model_flags(pe)
    _add_data_flags(pe)
    pe.add_argument("--ckpt", type=str, default=None)
    pe.add_argument("--saving_folder", type=str, default="")
    pe.add_argument("--batch_size", type=int, default=5000)
    pe.add_argument("--run", type=int, default=0)
    pe.add_argument("--n_epoch", type=int, default=0)
    pe.add_argument("--seed", type=int, default=546)
    pe.set_defaults(fn=cmd_evaluate)

    pa = sub.add_parser("train-augmenter", help="train the VAE-GAN augmenter")
    _add_data_flags(pa)
    pa.add_argument("--n_epoch", type=int, default=50)
    pa.add_argument("--batch_size", type=int, default=1000)
    pa.add_argument("--noise_dim", type=int, default=50)
    pa.add_argument("--z_dim", type=int, default=10)
    pa.add_argument("--n_dim", type=int, default=500)
    pa.add_argument("--p_drop", type=float, default=0.5)
    pa.add_argument("--lr", type=float, default=1e-3)
    pa.add_argument("--alpha", type=float, default=0.2)
    pa.add_argument("--lambda", dest="lambda_", type=float, nargs=4,
                    default=[1.0, 0.5, 0.1, 0.5])
    pa.add_argument("--mode", type=str, default="MSE",
                    choices=["MSE", "ZINB"])
    pa.add_argument("--out", type=str, default=None)
    pa.add_argument("--seed", type=int, default=546)
    pa.add_argument("--gan_bf16", action="store_true",
                    help="mixed-precision GAN step (bf16 matmuls, f32 "
                         "loss math + master weights)")
    pa.set_defaults(fn=cmd_train_augmenter)

    pi = sub.add_parser(
        "import-torch",
        help="convert a reference PyTorch .pth checkpoint (trainer or "
             "augmenter) to the dvae_tpu checkpoint format")
    pi.add_argument("path", type=str, help=".pth file to convert")
    pi.add_argument("--out", type=str, default=None,
                    help="output path (default: alongside, .ckpt)")
    pi.add_argument("--kind", type=str, default="auto",
                    choices=["auto", "model", "augmenter"])
    pi.add_argument("--no-optimizer", action="store_true",
                    help="skip Adam-moment import (fresh optimizer state)")
    pi.set_defaults(fn=cmd_import_torch)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
