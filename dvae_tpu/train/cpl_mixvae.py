"""CplMixVAE — the training orchestrator (L4).

Equivalent capability to the reference ``cpl_mixVAE`` class
(mmidas/cpl_mixvae.py:152-1650: epoch loop, augmentation call, metric
logging, train/val consensus, checkpoint cadence, consensus early-stop,
category-pruning loop, eval_model, save/load) — re-architected around the
jitted multi-epoch runner (dvae_tpu/train/step.py):

  * The python epoch loop advances ``epochs_per_jit`` epochs per host
    iteration; everything inside is one compiled XLA program (the
    reference pays per-batch python dispatch + GPU→CPU syncs,
    cpl_mixvae.py:415-477).
  * Consensus is computed on device each epoch; the host only sees (E,)
    metric vectors at chunk boundaries.
  * Pruning is a (C,) multiplicative mask in the state (train/step.py
    ``_mask_params``), updated on host between chunks from per-category
    agreement — functionally identical to the reference's
    ``torch.nn.utils.prune.custom_from_mask`` masks (cpl_mixvae.py:1124-1161)
    with static shapes (no gather/scatter of surviving categories).

Method-name parity: ``init_model``, ``load_model``, ``train``,
``eval_model``, ``save_file``, ``load_file``
(reference build/lib/mmidas/cpl_mixvae.py:17-804).
"""

from __future__ import annotations

import os
import pickle
import signal
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.config import MeshConfig, ShardingStrategy, TrainConfig, VAEConfig
from dvae_tpu.eval.metrics import (consensus_device_both,
                                   consensus_from_labels,
                                   per_category_agreement)
from dvae_tpu.parallel.sharding import (make_mesh, put_dataset, replicated,
                                        strategy_shardings)
from dvae_tpu.train.step import (TrainState, init_train_state,
                                 make_epoch_runner, make_eval_runner,
                                 make_eval_step, make_optimizer)
from dvae_tpu.utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                       newest_checkpoint, save_checkpoint)
from dvae_tpu.utils.logging import MetricLogger, device_memory_mb, mprint


_EVAL_FLUSH_BYTES = 1 << 30  # eval_model drains device accumulators to host
                             # whenever the retained per-batch arrays pass
                             # this bound (caps peak HBM on huge datasets)

_HBM_DATASET_FRACTION = 0.7  # resident-path guard: above this share of a
                             # device's memory the dataset can't coexist
                             # with params/opt/activations — stream instead


class PreemptionGuard:
    """SIGTERM-safe training: trap the preemption signal, let the current
    on-device epoch chunk finish, checkpoint, and stop cleanly.

    TPU VMs (spot/preemptible pools, maintenance events) deliver SIGTERM
    with a grace window; the reference has no handling at all (a kill
    loses everything since its last manual save).  Here ``_run_phase``
    polls ``tripped`` at every chunk boundary — chunks are seconds, well
    inside any grace window — and resume is the existing deterministic
    ``load_model(latest_checkpoint(...))`` path.

    No-ops outside the main thread (signal handlers cannot be installed
    there); ``signals=()`` disables trapping entirely.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self.tripped = False
        self._signals = tuple(signals)
        self._prev: dict = {}

    def __enter__(self):
        for sig in self._signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except ValueError:  # not the main thread
                pass
        return self

    def _handler(self, signum, frame):
        self.tripped = True
        mprint(f"caught signal {signum}: checkpointing at the next chunk "
               "boundary, then stopping")

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            if prev is not None:
                signal.signal(sig, prev)
            else:
                # signal.signal returned None on entry: the previous handler
                # was installed at the C level and cannot be re-installed
                # from Python.  Restoring SIG_DFL at least keeps the process
                # terminable — leaving OUR handler in place would swallow
                # every later SIGTERM into a guard nobody polls.
                signal.signal(sig, signal.SIG_DFL)
        return False


def _dataset_exceeds_hbm(x: np.ndarray, store_dtype, mesh=None) -> bool:
    """True when committing ``x`` would occupy more than
    ``_HBM_DATASET_FRACTION`` of a device's memory.

    The resident epoch runner replicates the dataset on every device (batch
    gathers use global row indices, so a row-sharded dataset would turn each
    gather into an all-gather) — the per-device footprint is the FULL dataset
    even under a ``mesh``.  The mesh argument states the placement being
    guarded and keeps the signature honest if a sharded-dataset path ever
    lands.  Backends without ``memory_stats`` (CPU, some emulators) report
    no limit → never trips."""
    del mesh  # replicated placement: per-device footprint is mesh-independent
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    except Exception:
        return False
    if not limit:
        return False
    # shape product, not .size: for a scipy sparse matrix .size is nnz,
    # and what lands in HBM is the DENSE matrix
    nbytes = int(np.prod(x.shape)) * np.dtype(store_dtype).itemsize
    return nbytes > _HBM_DATASET_FRACTION * limit


class CplMixVAE:
    """Coupled mixture-VAE trainer."""

    def __init__(self, saving_folder: str = "", aug_file: Optional[str] = None,
                 device: Optional[str] = None, seed: int = 546,
                 use_wandb: bool = False):
        self.folder = saving_folder
        if saving_folder:
            os.makedirs(saving_folder, exist_ok=True)
        self.seed = seed
        self.use_wandb = use_wandb
        # persistent compile cache for EVERY trainer entry (examples,
        # studies, soaks — not just the CLI): a cold production-shape
        # remote compile costs minutes; repeat runs load the executable.
        # Idempotent; DVAE_COMPILE_CACHE=0 disables.
        from dvae_tpu.utils.tools import enable_compile_cache
        enable_compile_cache()
        self.aug_apply = None          # (key, x, n_arm) -> (A,B,D)
        self._aug_loaded = None        # (params, bn, cfg) of the augmenter
        self._aug_bf16_apply = None    # cached bf16-weights closure
        self._preempt = None           # PreemptionGuard while train() runs
        self.aug_file = aug_file
        if aug_file:
            self._load_augmenter(aug_file)
        self.cfg: Optional[VAEConfig] = None
        self.tcfg: Optional[TrainConfig] = None
        self.state: Optional[TrainState] = None
        self.mesh = None
        self.tx = None
        # phase-aware progress of a loaded checkpoint (public; populated
        # by load_model, consumed by the next train() call)
        self.resume_progress: dict = {}
        # multi-model registry filled by append() (reference self.models)
        self.models: list[dict] = []
        del device  # device placement is owned by the mesh/shardings

    # -- model lifecycle ----------------------------------------------------

    def _load_augmenter(self, aug_file: str) -> None:
        """Load a frozen pre-trained augmenter (reference ``mk_augmenter``,
        cpl_mixvae.py:128-149).  The (params, bn, cfg) triple is stashed so
        the compute-dtype cast in ``_augment_fn`` (tcfg is unknown at
        construction time) reuses the in-memory weights instead of
        re-reading the file."""
        from dvae_tpu.augment.augmenter import (load_augmenter,
                                                make_augment_apply)
        self._aug_loaded = load_augmenter(aug_file)
        self.aug_apply = make_augment_apply(*self._aug_loaded)
        self._reset_jit_caches()

    def _reset_jit_caches(self) -> None:
        """Drop every cached jitted closure.  They bake in cfg/tcfg/mesh
        and the augmenter weights at build time, so any re-init, checkpoint
        load, or augmenter swap must invalidate them — otherwise a later
        eval silently runs with the PREVIOUS model's config baked in."""
        self._eval_step = None
        self._eval_runner = None
        self._aug_bf16_apply = None

    def init_model(self, n_categories: int = 92, state_dim: int = 2,
                   input_dim: int = 5032, fc_dim: int = 100,
                   lowD_dim: int = 10, x_drop: float = 0.5,
                   s_drop: float = 0.2, lr: float = 1e-3, lam: float = 1.0,
                   lam_pc: float = 1.0, n_arm: int = 2, temp: float = 1.0,
                   tau: float = 0.005, beta: float = 1.0, hard: bool = False,
                   variational: bool = True, ref_prior: bool = False,
                   trained_model: Optional[str] = None, n_pr: int = 0,
                   mode: str = "MSE", optimizer: str = "adam",
                   batch_size: int = 5000, epochs_per_jit: int = 10,
                   sharding: str | ShardingStrategy = "no",
                   mesh: Optional[MeshConfig] = None, bf16: bool = False,
                   rng_impl: str = "threefry2x32",
                   fused: Optional[bool] = None,
                   shuffle_block: int = 1, stream: bool = False,
                   ckpt_every: int = 10, eval_every: int = 10,
                   align_arms_every: int = 0,
                   local_bn_stats: bool = False,
                   **extra) -> None:
        """Build config + mesh + optimizer + initial state
        (reference ``init_model``, cpl_mixvae.py:193-286).

        ``fused`` enables the fused Pallas hot-path kernels
        (ops/recon_pallas.py, ops/encoder_pallas.py — no (A, B, D) tensor
        touches HBM); default None auto-enables them on a TPU backend in
        MSE mode.  ``shuffle_block`` — see TrainConfig.shuffle_block.
        """
        if fused is None:
            fused = jax.default_backend() == "tpu"
        extra.setdefault("fused_recon", fused)
        extra.setdefault("fused_encoder", fused)
        if local_bn_stats:
            # reference-DDP fidelity: per-shard BN batch statistics (ghost
            # BN over the data-parallel row blocks — mmidas/nn_model.py:
            # 208-255 under train.py:141-143 DDP wrapping); global
            # SyncBatchNorm-style stats stay the default
            m = mesh or MeshConfig()
            extra.setdefault("bn_groups", max(1, m.data * m.fsdp))
        # fused_decoder stays opt-in: measured SLOWER at the production
        # shape (3.62 vs 2.60 ms/step, v5e-1 2026-08-17) — see config.py
        self.cfg = VAEConfig(
            n_categories=n_categories, state_dim=state_dim,
            input_dim=input_dim, fc_dim=fc_dim, lowD_dim=lowD_dim,
            x_drop=x_drop, s_drop=s_drop, lr=lr, lam=lam, lam_pc=lam_pc,
            n_arm=n_arm, temp=temp, tau=tau, beta=beta, hard=hard,
            variational=variational, ref_prior=ref_prior,
            trained_model=trained_model, n_pr=n_pr, mode=mode, **extra)
        self.tcfg = TrainConfig(
            batch_size=batch_size, epochs_per_jit=epochs_per_jit,
            optimizer=optimizer,
            sharding=ShardingStrategy(sharding),
            mesh=mesh or MeshConfig(), bf16=bf16, seed=self.seed,
            rng_impl=rng_impl, shuffle_block=shuffle_block, stream=stream,
            ckpt_every=ckpt_every, eval_every=eval_every,
            align_arms_every=align_arms_every)
        self.temp = temp

        self.mesh = make_mesh(self.tcfg.mesh) \
            if self.tcfg.mesh.n_devices > 1 else None
        self.tx = make_optimizer(self.cfg, optimizer)
        self.state = init_train_state(
            jax.random.key(self.seed), self.cfg, self.tx,
            rng_impl=self.tcfg.rng_impl)
        if n_pr > 0:
            # start with the n_pr lowest categories pruned (reference n_pr)
            mask = np.ones(n_categories, np.float32)
            mask[-n_pr:] = 0.0
            self.state = self.state._replace(mask=jnp.asarray(mask))
        if self.mesh is not None:
            shs = strategy_shardings(self.tcfg.sharding, self.mesh,
                                     self.state.params, self.state.bn,
                                     self.state.opt_state)
            self.state = self.state._replace(
                params=jax.device_put(self.state.params, shs[0]),
                bn=jax.device_put(self.state.bn, shs[1]),
                opt_state=jax.device_put(self.state.opt_state, shs[2]))
        self._reset_jit_caches()
        if trained_model:
            self.load_model(trained_model)

    def append(self, **kwargs) -> dict:
        """Build an additional (cfg, tcfg, state, optimizer) entry and
        append it to ``self.models`` (reference ``append``,
        cpl_mixvae.py:288-315 — a multi-model registry for holding several
        configured/loaded models side by side; part of the class surface
        though unused by the reference's entry points).

        Accepts the same kwargs as ``init_model`` (including
        ``trained_model=`` to load weights into the new entry).  The
        trainer's own ``cfg``/``state``/... are left untouched."""
        saved = (self.cfg, self.tcfg, self.state, self.mesh, self.tx,
                 getattr(self, "temp", None), self.resume_progress)
        try:
            self.init_model(**kwargs)
            entry = {"cfg": self.cfg, "tcfg": self.tcfg,
                     "state": self.state, "mesh": self.mesh, "tx": self.tx}
            self.models.append(entry)
            return entry
        finally:
            (self.cfg, self.tcfg, self.state, self.mesh, self.tx,
             temp, self.resume_progress) = saved
            if temp is not None:
                self.temp = temp

    def load_model(self, filename: str) -> int:
        """Restore model+optimizer state (reference ``load_model``,
        cpl_mixvae.py:317; ``init_model(trained_model=…)`` :276-283).
        Returns the stored epoch (or -1).

        Standalone-capable: on a fresh instance (no prior ``init_model``)
        the configs, optimizer, and mesh are rebuilt from the checkpoint
        metadata — the reference eval workflow (evaluation.py:15-23) is
        construct → load → eval with no explicit re-init."""
        tree, meta = load_checkpoint(filename)
        if self.state is None:
            if not meta.get("cfg"):
                raise ValueError(
                    f"{filename} has no 'cfg' metadata; call init_model "
                    "first to load a bare pytree checkpoint")
            cfg_d = dict(meta["cfg"])
            tcfg_d = dict(meta.get("tcfg") or {})
            mesh_d = tcfg_d.get("mesh")
            if isinstance(mesh_d, dict):
                tcfg_d["mesh"] = MeshConfig(**mesh_d)
            if "sharding" in tcfg_d:
                tcfg_d["sharding"] = ShardingStrategy(tcfg_d["sharding"])
            self.cfg = VAEConfig(**cfg_d)
            self.tcfg = TrainConfig(**tcfg_d)
            self.temp = self.cfg.temp
            # a multi-chip-trained checkpoint must stay loadable on a
            # smaller host (the reference eval workflow runs on CPU,
            # evaluation.py:19): inference needs no mesh, so fall back to
            # single-device placement instead of refusing to load
            want = self.tcfg.mesh
            if want.n_devices > 1 and want.n_devices > len(jax.devices()):
                mprint(f"checkpoint was trained on a {want.n_devices}-device "
                       f"mesh; this host has {len(jax.devices())} — loading "
                       "unsharded (fine for eval; re-init for training)")
                self.tcfg = self.tcfg.replace(mesh=MeshConfig())
                self.mesh = None
            else:
                self.mesh = make_mesh(want) if want.n_devices > 1 else None
            self.tx = make_optimizer(self.cfg, self.tcfg.optimizer)
            self.state = init_train_state(
                jax.random.key(self.seed), self.cfg, self.tx,
                rng_impl=self.tcfg.rng_impl)
        restored = jax.tree_util.tree_map(jnp.asarray, tree)
        if "key_data" in restored:
            # resume the PRNG chain where the run left off: without this a
            # repeatedly-preempted run replays epoch-0 shuffles/noise after
            # every restart
            key = jax.random.wrap_key_data(
                restored["key_data"],
                impl=self.tcfg.rng_impl if self.tcfg else None)
        else:
            # pre-key checkpoint: at least decorrelate the resumed segment
            # from the run's first epochs
            key = jax.random.fold_in(self.state.key,
                                     int(meta.get("epoch", 0)))
        self.state = TrainState(
            params=restored["params"], bn=restored["bn"],
            opt_state=jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.state.opt_state),
                jax.tree_util.tree_leaves(restored["opt_state"])),
            mask=restored["mask"], key=key,
            epoch=jnp.asarray(meta.get("epoch", 0), jnp.int32))
        # phase-aware progress (public; consumed by the next train() call):
        # lets a resumed run skip completed main epochs and continue the
        # pruning budget instead of restarting it.  Falls back to treating
        # the stored epoch as all-main for pre-progress checkpoints.
        self.resume_progress = dict(
            meta.get("progress", None)
            or {"main_epochs": int(meta.get("epoch", 0)), "pr_it": 0})
        if self.mesh is not None:
            # restored arrays land uncommitted on the default device —
            # re-apply the strategy placement so a resumed multi-device
            # run does not silently train replicated
            shs = strategy_shardings(self.tcfg.sharding, self.mesh,
                                     self.state.params, self.state.bn,
                                     self.state.opt_state)
            self.state = self.state._replace(
                params=jax.device_put(self.state.params, shs[0]),
                bn=jax.device_put(self.state.bn, shs[1]),
                opt_state=jax.device_put(self.state.opt_state, shs[2]))
        self._reset_jit_caches()
        return int(meta.get("epoch", -1))

    def save_checkpoint(self, tag: str) -> str:
        path = os.path.join(self.folder or ".",
                            f"cpl_mixVAE_model_{tag}.ckpt")
        ckpt = {"params": self.state.params, "bn": self.state.bn,
                "opt_state": self.state.opt_state, "mask": self.state.mask,
                # raw PRNG key bits so a resume continues the noise/shuffle
                # chain instead of replaying it from the seed
                "key_data": jax.random.key_data(self.state.key)}
        import dataclasses
        return save_checkpoint(
            path, ckpt,
            {"epoch": int(self.state.epoch),
             # phase-aware progress: state.epoch alone conflates main and
             # pruning epochs, so a --resume after a mid-prune kill would
             # mis-count the remaining main budget and restart the prune
             # budget from zero
             "progress": {"main_epochs": int(getattr(self, "_main_done", 0)),
                          "pr_it": int(getattr(self, "_pr_it", 0)),
                          # retraining epochs completed within the current
                          # (possibly unfinished) prune iteration
                          "prune_epochs": int(getattr(self, "_prune_done",
                                                      0))},
             "cfg": self.cfg.__dict__ if self.cfg else {},
             # plain-dict tcfg (enum → value) so a fresh instance can
             # rebuild the full config tree from metadata alone
             "tcfg": {**dataclasses.asdict(self.tcfg),
                      "sharding": self.tcfg.sharding.value}
             if self.tcfg else {}})

    # -- training -----------------------------------------------------------

    def _preempted(self) -> bool:
        return self._preempt is not None and self._preempt.tripped

    def _augment_fn(self):
        if self.aug_apply is None:
            return None
        noise = self.tcfg.aug_noise if self.tcfg else 0.1
        aug = self.aug_apply
        if (self.tcfg is not None and self.tcfg.bf16
                and self._aug_loaded is not None):
            # frozen closure with bf16 weights (cached; cast/closure rule
            # lives in make_augment_apply)
            if self._aug_bf16_apply is None:
                from dvae_tpu.augment.augmenter import make_augment_apply
                self._aug_bf16_apply = make_augment_apply(
                    *self._aug_loaded, dtype=jnp.bfloat16)
            aug = self._aug_bf16_apply

        def fn(key, x, n_arm):
            return aug(key, x, n_arm, noise)
        return fn

    def train(self, x_train: np.ndarray, x_val: Optional[np.ndarray] = None,
              n_epoch: int = 100, n_epoch_p: int = 0,
              c_p: Optional[np.ndarray] = None,
              train_idx: Optional[np.ndarray] = None,
              val_idx: Optional[np.ndarray] = None,
              min_con: float = 0.99, max_prun_it: int = 0,
              temp: Optional[float] = None,
              early_stop_consensus: Optional[float] = None,
              run_name: Optional[str] = None,
              save_plots: bool = True) -> str:
        """Main + pruning training phases (reference ``train``,
        cpl_mixvae.py:323-1448).  Returns the final checkpoint path.

        ``x_train``: (N, D) float32. ``c_p``: (N_total, C) ref-prior table
        gathered by ``train_idx`` when cfg.ref_prior (reference
        cpl_mixvae.py:427-432); ``val_idx`` gathers the validation rows'
        prior so the val loss runs under the same ref-prior semantics as
        training (the reference's val loop gathers c_p[n] per batch,
        cpl_mixvae.py:621-625).

        After ``load_model`` (or ``init_model(trained_model=...)``), the
        checkpoint's phase progress carries over: completed prune
        iterations count against ``max_prun_it`` (consistent with the
        restored mask, which already has those categories removed).
        """
        assert self.state is not None, "call init_model first"
        cfg, tcfg = self.cfg, self.tcfg
        temp = self.temp if temp is None else temp
        # resume bookkeeping (set by load_model, consumed once): completed
        # main-phase epochs and prune iterations survive a kill+restart
        prog = getattr(self, "resume_progress", None) or {}
        self._main_done = int(prog.get("main_epochs", 0))
        self._pr_it = int(prog.get("pr_it", 0))
        self._prune_done = int(prog.get("prune_epochs", 0))
        self.resume_progress = {}
        self._halted = False
        stop_con = (tcfg.good_enuf_consensus if early_stop_consensus is None
                    else early_stop_consensus)
        logger = MetricLogger(
            use_wandb=self.use_wandb, run_name=run_name,
            config={**cfg.__dict__, "n_epoch": n_epoch},
            jsonl_path=os.path.join(self.folder, "metrics.jsonl")
            if self.folder else None)

        try:
            n_train = x_train.shape[0]
            sharding = replicated(self.mesh) if self.mesh is not None else None
            # bf16 mode also stores the dataset in bf16: halves the HBM
            # footprint AND the per-step gather traffic
            store_dtype = jnp.bfloat16 if tcfg.bf16 else jnp.float32
            if not tcfg.stream and _dataset_exceeds_hbm(x_train, store_dtype,
                                                        self.mesh):
                mprint("dataset does not fit in device memory alongside the "
                       "training state — falling back to host→device "
                       "streaming (TrainConfig.stream)")
                tcfg = self.tcfg = tcfg.replace(stream=True)
            if tcfg.stream:
                # dataset stays on the HOST (datasets larger than HBM): cast
                # once to the storage dtype, batches double-buffer to device
                # per step (data/stream.py — the reference's DataLoader
                # semantics, dataloader.py:123-132).  A scipy sparse matrix
                # stays sparse (nnz-scale host RAM); the streamer densifies
                # and casts each (B, D) batch slice.
                if hasattr(x_train, "toarray"):
                    # normalize to CSR at ingestion: COO/BSR/DIA are not
                    # row-sliceable and CSC row gathers are pathological —
                    # _predict_labels/save_plots slice x_all directly, not
                    # just the streamer's internal copy
                    x_all = x_train.tocsr()
                else:
                    x_all = np.asarray(x_train, np.dtype(store_dtype))
                prior_all = None
                if cfg.ref_prior and c_p is not None:
                    idx = (np.arange(n_train) if train_idx is None
                           else train_idx)
                    prior_all = np.asarray(c_p[idx], np.float32)
                from dvae_tpu.data.stream import make_streaming_runner
                runner = make_streaming_runner(
                    cfg, tcfg, self.tx, n_train,
                    augment=self._augment_fn(), mesh=self.mesh)
            else:
                # put_dataset casts on host and pins a row-major device layout —
                # jnp.asarray's on-device convert commits column-major on v5e
                # and every runner call then re-layouts the whole dataset
                # (~0.6 ms)
                if hasattr(x_train, "toarray"):  # resident path is dense
                    x_train = x_train.toarray()
                x_all = put_dataset(x_train, store_dtype, sharding)
                prior_all = None
                if cfg.ref_prior and c_p is not None:
                    idx = (np.arange(n_train) if train_idx is None
                           else train_idx)
                    prior_all = put_dataset(c_p[idx], jnp.float32, sharding)

                # donating the carried state lets XLA update params/opt
                # buffers in place across chunk boundaries (no 2x state copy
                # per chunk)
                _runners = {}

                def runner(n_chunk: int):
                    if n_chunk not in _runners:
                        _runners[n_chunk] = jax.jit(make_epoch_runner(
                            cfg, tcfg, self.tx, n_train,
                            augment=self._augment_fn(),
                            epochs_per_chunk=n_chunk, mesh=self.mesh),
                            donate_argnums=(0,))
                    return _runners[n_chunk]

            self._eval_step = make_eval_step(cfg, tcfg, augment=self._augment_fn(),
                                             mesh=self.mesh)
            self._eval_runner = None  # lazily rebuilt against the new cfg/mesh

            # commit the validation set to device ONCE — validate() otherwise
            # re-uploads it on every eval_every chunk (hundreds of MB through a
            # slow tunnel, for data that never changes); its jnp.asarray then
            # no-ops.  The ref-prior rows for the val set ride along so the val
            # loss runs the same semantics as training (reference val loop
            # gathers c_p[n] per batch, cpl_mixvae.py:621-625).
            prior_val = None
            if x_val is not None and not hasattr(x_val, "toarray"):
                x_val = jnp.asarray(np.asarray(x_val), self._eval_dtype())
            if x_val is not None and cfg.ref_prior and c_p is not None:
                if val_idx is not None:
                    prior_val = jnp.asarray(np.asarray(c_p[val_idx], np.float32))
                else:
                    mprint("ref_prior: no val_idx given — validation runs "
                           "WITHOUT the prior (val loss omits the prior-"
                           "coupling terms; pass val_idx to fix)")

            # SIGTERM (spot-VM preemption, maintenance) → checkpoint at the
            # next chunk boundary and stop cleanly; resume via load_model
            self._preempt = PreemptionGuard()
            with self._preempt:
                self._run_phase(runner, x_all, prior_all, x_val, n_epoch, temp,
                                stop_con, logger, phase="train",
                                prior_val=prior_val)

                # ---- pruning phase (reference cpl_mixvae.py:996-1444; working
                #      semantics from build/lib/mmidas/cpl_mixvae.py:318-604) ----
                if (n_epoch_p > 0 and max_prun_it > 0 and not self._preempted()
                        and not self._halted):
                    pr_it = self._pr_it  # resume continues the prune budget
                    # a kill mid-retraining leaves the current iteration with
                    # prune_epochs < n_epoch_p: finish ITS remaining epochs
                    # first (the category was already pruned when pr_it bumped).
                    # prune_epochs == 0 with pr_it > 0 is the kill-right-after-
                    # the-before_pruning-checkpoint state — the iteration's
                    # ENTIRE retraining is still owed (prune_epochs only ever
                    # reads 0 there: each completed chunk accumulates it, and a
                    # finished iteration leaves it at n_epoch_p)
                    if self._prune_done < n_epoch_p and pr_it > 0:
                        self._run_phase(runner, x_all, prior_all, x_val,
                                        n_epoch_p - self._prune_done, temp,
                                        stop_con, logger,
                                        phase=f"prune{pr_it - 1}",
                                        prior_val=prior_val)
                    while (pr_it < max_prun_it and not self._preempted()
                           and not self._halted):
                        labels = self._predict_labels(x_all, temp)
                        agreement = per_category_agreement(labels,
                                                           cfg.n_categories)
                        mask = np.array(self.state.mask)  # writable copy
                        active = np.where(mask > 0)[0]
                        agree_active = agreement[active]
                        if float(np.min(agree_active)) > min_con:
                            mprint("No more pruning!")
                            break
                        kill = active[int(np.argmin(agree_active))]
                        mask[kill] = 0.0
                        mprint(f"pruning iteration {pr_it}: pruned category "
                               f"{kill} (agreement {agreement[kill]:.3f}); "
                               f"{int(mask.sum())}/{cfg.n_categories} remain")
                        self.state = self.state._replace(mask=jnp.asarray(mask))
                        self._pr_it = pr_it + 1  # this kill is now in the mask
                        self._prune_done = 0     # fresh retraining budget
                        self.save_checkpoint(
                            f"before_pruning_{pr_it}_A{cfg.n_arm}")
                        self._run_phase(runner, x_all, prior_all, x_val,
                                        n_epoch_p, temp, stop_con, logger,
                                        phase=f"prune{pr_it}",
                                        prior_val=prior_val)
                        pr_it += 1

                if self._halted:
                    # do NOT save the NaN-poisoned state — it would become the
                    # newest *_epoch_* file and --resume would restore it; the
                    # halt message points at the last good checkpoint instead.
                    # newest_checkpoint also sees best_* files (a halt before
                    # the first every-k save has no *_epoch_* file yet) and
                    # returns None for folder="" (never a CWD stranger).
                    path = (latest_checkpoint(self.folder)
                            if self.folder else None) \
                        or newest_checkpoint(self.folder) or ""
                else:
                    path = self.save_checkpoint(
                        f"epoch_{int(self.state.epoch)}")
                if (self.folder and save_plots and not self._preempted()
                        and not self._halted):
                    from dvae_tpu.utils.plots import save_training_artifacts
                    labels = self._predict_labels(x_all, temp)
                    save_training_artifacts(self.folder, logger.history,
                                            labels=labels, K=cfg.n_categories)
        finally:
            # always release the preemption guard and close the
            # logger (wandb run) — even when a runtime error
            # propagates out of a phase
            self._preempt = None
            logger.finish()
        return path

    def _run_phase(self, runner, x_all, prior_all, x_val, n_epoch, temp,
                   stop_con, logger, phase: str, prior_val=None) -> None:
        """``runner``: chunk-size → jitted epoch-runner factory."""
        cfg, tcfg = self.cfg, self.tcfg
        E = tcfg.epochs_per_jit
        done = 0
        best_con = -1.0   # consensus can peak and decay (coupled clusterings
        #                   drift apart with overtraining); keep the best

        def crossed(cadence: int) -> bool:
            # did a multiple of ``cadence`` fall inside the last chunk?
            c = max(cadence, 1)
            return (done // c) > ((done - n_chunk) // c)

        while done < n_epoch:
            n_chunk = min(E, n_epoch - done)   # exact epoch budget
            t0 = time.perf_counter()
            self.state, ems = runner(n_chunk)(self.state, x_all, prior_all,
                                              temp)
            total = np.asarray(ems.total)       # forces completion
            dt = time.perf_counter() - t0
            cons = np.asarray(ems.consensus)
            rec = np.asarray(ems.loss_rec)
            joint = np.asarray(ems.loss_joint)
            negent = np.asarray(ems.neg_entropy)
            c_dist = np.asarray(ems.c_dist)
            c_l2 = np.asarray(ems.c_l2_dist)
            mem = device_memory_mb()
            base = int(self.state.epoch) - n_chunk
            for e in range(n_chunk):
                row = {
                    f"{phase}/loss": float(total[e]),
                    f"{phase}/loss_joint": float(joint[e]),
                    f"{phase}/neg_joint_entropy": float(negent[e]),
                    f"{phase}/simplex_distance": float(c_dist[e]),
                    f"{phase}/l2_distance": float(c_l2[e]),
                    f"{phase}/consensus": float(cons[e]),
                    f"{phase}/epoch_time_s": dt / n_chunk,
                    f"{phase}/device_mb": mem,
                    **{f"{phase}/rec_loss_arm{a}": float(rec[e, a])
                       for a in range(cfg.n_arm)},
                }
                logger.log(row, step=base + e)
            done += n_chunk
            # phase-aware resume accounting
            if phase == "train":
                self._main_done = getattr(self, "_main_done", 0) + n_chunk
            elif phase.startswith("prune"):
                self._prune_done = getattr(self, "_prune_done", 0) + n_chunk
            epoch = int(self.state.epoch)
            mprint(f"[{phase}] epoch {epoch}: loss={total[-1]:.3f} "
                   f"consensus={cons[-1]:.3f} ({dt / n_chunk:.3f}s/epoch)")

            # non-finite loss: Adam moments are already poisoned and no
            # later epoch recovers — stop the phase instead of burning
            # the remaining budget (the ZINB lgamma-overflow incident
            # trained 25k NaN epochs before this guard existed).  The
            # best_/epoch_ checkpoint trail preserves the last good state.
            if tcfg.halt_on_nan and not np.isfinite(total[-1]):
                mprint(f"HALT: non-finite loss at epoch {epoch} "
                       f"(total={total[-1]}); last good checkpoint is the "
                       f"newest best_/epoch_ file. Set halt_on_nan=False "
                       f"for the reference's keep-stepping behavior.")
                # poisons the rest of the run: train() skips the pruning
                # phase, the final checkpoint save, and the plot pass
                self._halted = True
                break

            # cross-arm category alignment (train/alignment.py; TPU-build
            # extension, off by default): main + prune phases — under a
            # pruned mask the match restricts to active categories (the
            # shared mask is invariant under the permutation); ref_prior
            # pins the index space, so it stays gated
            if (tcfg.align_arms_every and cfg.n_arm > 1
                    and not cfg.ref_prior
                    and crossed(tcfg.align_arms_every)):
                from dvae_tpu.train.alignment import align_state
                from dvae_tpu.eval.metrics import consensus_from_labels
                n_sub = min(x_all.shape[0], 4 * tcfg.batch_size)
                lab = self._predict_labels(x_all[:n_sub], temp,
                                           batch_size=tcfg.batch_size)
                self.state, m, moved = align_state(
                    self.state, lab, cfg, mask=np.asarray(self.state.mask))
                if moved:
                    from dvae_tpu.train.alignment import moved_counts
                    _, active = moved_counts(m, lab)
                    con0 = consensus_from_labels(lab, cfg.n_categories)
                    lab_new = np.take_along_axis(m, lab, axis=1)
                    con1 = consensus_from_labels(lab_new,
                                                 cfg.n_categories)
                    mprint(f"[align] epoch {epoch}: remapped {moved} "
                           f"category indices ({active} active); "
                           f"label consensus {con0:.3f} -> {con1:.3f}")
                    logger.log({f"{phase}/align_moved": moved,
                                f"{phase}/align_moved_active": active,
                                f"{phase}/align_consensus": con1},
                               step=epoch)

            if x_val is not None and crossed(tcfg.eval_every):
                val = self.validate(x_val, temp, c_p=prior_val)
                logger.log({f"val/{k}": v for k, v in val.items()},
                           step=epoch)
                mprint(f"[val] loss={val['loss']:.3f} "
                       f"consensus={val['consensus']:.3f}")

            if crossed(tcfg.ckpt_every):
                self.save_checkpoint(f"epoch_{epoch}")
            if float(cons[-1]) > best_con:
                best_con = float(cons[-1])
                self.save_checkpoint(f"best_{phase}")

            # consensus early-stop (reference cpl_mixvae.py:851-927)
            if stop_con and float(cons[-1]) >= stop_con:
                mprint(f"early stop: consensus {cons[-1]:.3f} >= {stop_con}")
                self.save_checkpoint(f"epoch_{epoch}")
                break

            # preemption (SIGTERM): checkpoint and stop this phase; the
            # caller skips the remaining phases too (PreemptionGuard)
            if self._preempted():
                self.save_checkpoint(f"preempt_epoch_{epoch}")
                mprint(f"preempted: checkpointed at epoch {epoch}")
                break

    # -- evaluation ---------------------------------------------------------

    def _eval_dtype(self):
        """Dataset dtype for eval: the training compute dtype — eval in f32
        when training ran bf16 would diverge from the consensus labels the
        early-stop saw, and pays 2× the HBM traffic (make_eval_step)."""
        return (jnp.bfloat16 if self.tcfg is not None and self.tcfg.bf16
                else jnp.float32)

    def _ensure_eval_fns(self):
        """Lazily build the jitted eval step + the scanned eval runner
        (both depend on cfg/augmenter/mesh; ``train`` resets them)."""
        if getattr(self, "_eval_step", None) is None:
            self._eval_step = make_eval_step(self.cfg, self.tcfg,
                                             augment=self._augment_fn(),
                                             mesh=self.mesh)
            self._eval_runner = None
        if getattr(self, "_eval_runner", None) is None:
            self._eval_runner = make_eval_runner(self.cfg, self.tcfg,
                                                 augment=self._augment_fn(),
                                                 mesh=self.mesh)

    def _eval_batches(self, x_all, batch_size: int, c_p=None):
        """The ONE batch-driving protocol for every eval surface: yield
        ``("chunk", x (K,B,D), prior (K,B,C)|None)`` K-batch device chunks
        for the scanned eval runner, then ``("batch", x (b,D), prior)``
        per-batch leftovers for the eval step.

        Dense single-device datasets ride the runner (each per-batch
        dispatch costs a host round trip comparable to the step's own
        ~1 ms device time on a tunneled chip; the runner amortizes it per
        chunk — see make_eval_runner, incl. why its scan must unroll).
        Sparse (stream-mode) datasets stay per-batch with host densify;
        multi-chip meshes stay per-batch (chunk slices would need their
        own sharding story)."""
        sparse = hasattr(x_all, "toarray")
        n = x_all.shape[0]
        i = 0
        K = min(8, n // batch_size)
        if not sparse and self.mesh is None and K >= 2:
            while n - i >= K * batch_size:
                chunk = jnp.asarray(x_all[i: i + K * batch_size]).reshape(
                    K, batch_size, *x_all.shape[1:])
                pc = (None if c_p is None else
                      jnp.asarray(c_p[i: i + K * batch_size],
                                  jnp.float32).reshape(K, batch_size, -1))
                yield "chunk", chunk, pc
                i += K * batch_size
        for i in range(i, n, batch_size):
            xb = x_all[i: i + batch_size]
            if sparse:
                # cast to the eval dtype: a densified f32 batch under bf16
                # training would retrace the eval step for a second input
                # signature (a 30-60 s remote compile, for nothing)
                xb = jnp.asarray(xb.toarray(), self._eval_dtype())
            pb = (None if c_p is None else
                  jnp.asarray(c_p[i: i + batch_size], jnp.float32))
            yield "batch", xb, pb

    def _predict_labels(self, x_all, temp, batch_size: int = 5000):
        """Eval-mode argmax labels over a dataset → (A, N) numpy (the
        pruning phase's label pass over the whole train set).  Labels are
        argmaxed from the categorical posterior, which does not consume
        the ref prior — no c_p needed."""
        self._ensure_eval_fns()
        outs = []
        for kind, xb, _ in self._eval_batches(x_all, batch_size):
            if kind == "chunk":
                _, f = self._eval_runner(self.state, xb, temp)
                outs.append(np.asarray(f.lab))
            else:
                _, labels, _ = self._eval_step(self.state, xb, None, temp)
                outs.append(np.asarray(labels))
        return np.concatenate(outs, axis=1)

    def validate(self, x_val: np.ndarray, temp: float = 1.0,
                 batch_size: int = 5000, c_p=None) -> dict:
        """Validation losses + consensus (reference val loop,
        cpl_mixvae.py:563-761).  ``c_p``: the validation rows' ref-prior
        table under cfg.ref_prior (reference gathers c_p[n] per batch,
        cpl_mixvae.py:621-625) — without it the val loss omits the
        prior-coupling terms and is not comparable to the train loss."""
        self._ensure_eval_fns()
        # scipy-sparse validation sets stay sparse on host — _eval_batches
        # densifies each (B, D) slice; a blanket jnp.asarray raises on
        # sparse input (and train() deliberately leaves a sparse x_val
        # unconverted for exactly this path)
        if hasattr(x_val, "toarray"):
            x = x_val.tocsr() if getattr(x_val, "format", "csr") != "csr" \
                else x_val
        else:
            x = jnp.asarray(x_val, self._eval_dtype())
        tot, recs, labels, sizes = [], [], [], []
        for kind, xb, pb in self._eval_batches(x, batch_size, c_p):
            # keep device arrays; one transfer per field below (a float()/
            # np.asarray per batch is a ~30 ms tunnel round trip each)
            if kind == "chunk":
                aux, f = self._eval_runner(self.state, xb, temp, pb)
                tot.append(aux.total)           # (K,)
                recs.append(aux.loss_rec)       # (K, A)
                labels.append(f.lab)
                sizes.extend([batch_size] * xb.shape[0])
            else:
                aux, lab, _ = self._eval_step(self.state, xb, pb, temp)
                tot.append(aux.total[None])
                recs.append(aux.loss_rec[None])
                labels.append(lab)
                sizes.append(xb.shape[0])
        tot = [float(t) for t in np.asarray(jnp.concatenate(tot))]
        recs = list(np.asarray(jnp.concatenate(recs, axis=0)))
        # both consensus variants from ONE device confusion-matrix pass
        # while the per-batch label arrays are still on device (the old
        # form computed them twice: once on host, once re-uploading the
        # full (A, N) matrix through the tunnel)
        lab_dev = jnp.concatenate(labels, axis=1)
        cons, cons_active = (
            float(v) for v in np.asarray(jnp.stack(consensus_device_both(
                lab_dev, self.cfg.n_categories))))
        # weight per-batch means by batch size (a trailing partial batch
        # must not get equal weight)
        rec = np.average(recs, axis=0, weights=sizes)
        return {"loss": float(np.average(tot, weights=sizes)),
                "consensus": cons,
                "consensus_active": cons_active,
                **{f"rec_loss_arm{a}": float(rec[a])
                   for a in range(self.cfg.n_arm)}}

    def eval_model(self, x: np.ndarray, temp: float = 1.0,
                   batch_size: int = 5000, c_p=None) -> dict:
        """Batched no-grad inference over a dataset (reference
        ``eval_model``, cpl_mixvae.py:1450-1619).

        Returns the reference summary dict fields: per-arm categorical
        probabilities ``c_prob`` (A,N,C), the posterior state statistics
        ``state_mu``/``state_logvar`` (A,N,S), the low-D embedding
        ``x_low``, argmax labels ``pred_label`` (A,N), reconstruction
        losses, total loss, and the consensus over arms.

        ``c_p``: (N, C) ref-prior rows aligned with ``x`` under
        cfg.ref_prior (reference eval_model's c_p arg, cpl_mixvae.py:1457):
        the state head consumes the prior instead of the categorical
        sample, and the loss includes the prior-coupling terms.
        """
        self._ensure_eval_fns()
        # scipy-sparse input stays sparse on host; each batch slice
        # densifies separately (the dataset may not fit dense anywhere).
        # Normalized to CSR: COO/BSR/DIA are not row-sliceable and CSC
        # row gathers are pathological.
        sparse = hasattr(x, "toarray")
        xj = x.tocsr() if sparse else jnp.asarray(x, self._eval_dtype())
        # accumulate per-batch DEVICE arrays and transfer whole fields in
        # few large copies: every np.asarray is a host round trip (7 per
        # batch in the old form), and dispatch stays async so batches
        # pipeline.  Accumulated device bytes are bounded: when the
        # retained per-batch arrays exceed ``_EVAL_FLUSH_BYTES`` (~1 GB)
        # they are drained to host mid-loop, so a many-million-cell
        # eval cannot OOM HBM while short evals still pay one transfer
        # per field.
        fields = {k: {"dev": [], "host": []}
                  for k in ("c", "s_mean", "s_logvar", "x_low", "lab")}
        recs, totals, sizes = [], [], []
        pending = 0

        def _drain_field(d):
            if d["dev"]:
                d["host"].append(
                    np.asarray(jnp.concatenate(d["dev"], axis=1)))
                d["dev"].clear()

        def drain():
            nonlocal pending
            for d in fields.values():
                _drain_field(d)
            pending = 0

        # batches driven by the shared protocol (_eval_batches): K-batch
        # runner chunks for dense single-device datasets, per-batch
        # leftovers/sparse/multi-chip.  Numerics are identical either way
        # (same state.key every batch).
        for kind, xb, pb in self._eval_batches(xj, batch_size, c_p):
            if kind == "chunk":
                aux, f = self._eval_runner(self.state, xb, temp, pb)
                for k in ("c", "s_mean", "s_logvar", "x_low", "lab"):
                    v = getattr(f, k)
                    fields[k]["dev"].append(v)
                    pending += v.nbytes
                recs.append(aux.loss_rec)       # (K, A)
                totals.append(aux.total)        # (K,)
                sizes.extend([batch_size] * xb.shape[0])
            else:
                aux, lab, outs = self._eval_step(self.state, xb, pb, temp)
                for k in ("c", "s_mean", "s_logvar", "x_low"):
                    v = getattr(outs, k)
                    fields[k]["dev"].append(v)
                    pending += v.nbytes
                fields["lab"]["dev"].append(lab)
                pending += lab.nbytes
                recs.append(aux.loss_rec[None])     # (1, A)
                totals.append(aux.total[None])      # (1,)
                sizes.append(xb.shape[0])
            if pending >= _EVAL_FLUSH_BYTES:
                drain()

        def flush(key):
            d = fields.pop(key)
            _drain_field(d)
            parts = d["host"]
            return parts[0] if len(parts) == 1 else np.concatenate(parts,
                                                                   axis=1)

        labels = flush("lab")
        # per-batch means weighted by batch size: a trailing partial batch
        # must not get equal weight (same rule as validate())
        w = np.asarray(sizes, np.float64)
        totals = np.asarray(jnp.concatenate(totals))       # (n_batches,)
        recs = np.asarray(jnp.concatenate(recs, axis=0))   # (n_batches, A)
        return {
            "c_prob": flush("c"),
            "state_mu": flush("s_mean"),
            "state_logvar": flush("s_logvar"),
            "x_low": flush("x_low"),
            "pred_label": labels,
            "total_loss": float(np.average(totals, weights=w)),
            "total_loss_rec": np.average(recs, axis=0, weights=w),
            "consensus": consensus_from_labels(labels, self.cfg.n_categories),
            "mask": np.asarray(self.state.mask),
        }

    # -- misc parity helpers --------------------------------------------------

    def save_file(self, fname: str, **kwargs) -> None:
        """Pickle named arrays (reference ``save_file``,
        cpl_mixvae.py:1621-1639)."""
        with open(fname, "wb") as f:
            pickle.dump(kwargs, f, protocol=pickle.HIGHEST_PROTOCOL)

    def load_file(self, fname: str) -> dict:
        """Unpickle (reference ``load_file``, cpl_mixvae.py:1641-1650)."""
        with open(fname, "rb") as f:
            return pickle.load(f)
