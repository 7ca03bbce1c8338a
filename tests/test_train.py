"""Trainer tests: step semantics, epoch runner, pruning masks, checkpoints.

The reference ships no trainer unit tests at all (its tests/test_train.py is
a stub — SURVEY.md §4); these cover the jitted step + CplMixVAE surface.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.config import TrainConfig, VAEConfig
from dvae_tpu.data.anndata_io import synthetic_dataset
from dvae_tpu.data.pipeline import stratified_split_indices
from dvae_tpu.train.step import (TrainState, init_train_state,
                                 make_epoch_runner, make_eval_step,
                                 make_optimizer, make_train_step,
                                 _mask_params)

CFG = VAEConfig(n_categories=8, input_dim=48, fc_dim=16, lowD_dim=8,
                state_dim=2, n_arm=2, tau=0.1)
TCFG = TrainConfig(batch_size=32, epochs_per_jit=3)

rng = np.random.default_rng(3)


@pytest.fixture(scope="module")
def data():
    ds = synthetic_dataset(n_cells=200, n_genes=48, n_types=8, seed=0)
    return jnp.asarray(ds.log1p)


@pytest.fixture(scope="module")
def tx():
    return make_optimizer(CFG)


def test_train_step_reduces_loss(data, tx):
    state = init_train_state(jax.random.key(0), CFG, tx)
    step = jax.jit(lambda s, x: make_train_step(CFG, TCFG, tx)(s, x, None, 1.0))
    x = data[:32]
    losses = []
    for _ in range(20):
        state, m, labels = step(state, x)
        losses.append(float(m.total))
    assert losses[-1] < losses[0]
    assert labels.shape == (2, 32)


def test_epoch_runner_epoch_counter_and_metric_shapes(data, tx):
    state = init_train_state(jax.random.key(0), CFG, tx)
    run = jax.jit(make_epoch_runner(CFG, TCFG, tx, n_train=data.shape[0]))
    state2, ems = run(state, data, None, 1.0)
    E = TCFG.epochs_per_jit
    assert int(state2.epoch) == E
    assert ems.total.shape == (E,)
    assert ems.loss_rec.shape == (E, CFG.n_arm)
    assert np.isfinite(np.asarray(ems.total)).all()
    c = np.asarray(ems.consensus)
    assert ((0 <= c) & (c <= 1)).all()


def test_mask_params_zeroes_category_units(tx):
    state = init_train_state(jax.random.key(1), CFG, tx)
    mask = jnp.ones(CFG.n_categories).at[3].set(0.0)
    p = _mask_params(state.params, mask, CFG)
    assert np.all(np.asarray(p["fcc"]["w"])[:, :, 3] == 0)
    assert np.all(np.asarray(p["fcc"]["b"])[:, 3] == 0)
    assert np.all(np.asarray(p["fc_mu"]["w"])[:, CFG.lowD_dim + 3, :] == 0)
    assert np.all(np.asarray(p["fc6"]["w"])[:, 3, :] == 0)
    # unmasked categories untouched
    assert np.allclose(np.asarray(p["fcc"]["w"])[:, :, 2],
                       np.asarray(state.params["fcc"]["w"])[:, :, 2])


def test_masked_category_never_predicted(data, tx):
    """With category k masked, the tau-softmax renormalizes over survivors
    and k can never be argmax (reference gather/scatter mask semantics,
    mmidas/nn_model.py:333-335)."""
    state = init_train_state(jax.random.key(2), CFG, tx)
    mask = jnp.ones(CFG.n_categories).at[5].set(0.0)
    state = state._replace(mask=mask,
                           params=_mask_params(state.params, mask, CFG))
    ev = make_eval_step(CFG, TCFG)
    _, labels, outs = ev(state, data[:64], None, 1.0)
    assert not np.any(np.asarray(labels) == 5)
    assert np.all(np.asarray(outs.c)[..., 5] == 0)


def test_cpl_mixvae_train_prune_checkpoint_roundtrip(tmp_path):
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=160, n_genes=48, n_types=8, seed=1)
    tr, te = stratified_split_indices(ds.cluster_label, 0.9, 546)
    cpl = CplMixVAE(saving_folder=str(tmp_path))
    kw = dict(n_categories=8, input_dim=48, fc_dim=16, lowD_dim=8,
              n_arm=2, tau=0.1, batch_size=32, epochs_per_jit=2)
    cpl.init_model(**kw)
    path = cpl.train(ds.log1p[tr], n_epoch=4, n_epoch_p=2,
                     min_con=0.99, max_prun_it=1)
    assert os.path.exists(path)
    res = cpl.eval_model(ds.log1p[te])
    assert res["pred_label"].shape[0] == 2
    assert 0 <= res["consensus"] <= 1
    # one category pruned
    assert int(np.sum(res["mask"])) == 7

    cpl2 = CplMixVAE(saving_folder=str(tmp_path))
    cpl2.init_model(**kw)
    epoch = cpl2.load_model(path)
    assert epoch == 6  # 4 main + 2 pruning epochs
    res2 = cpl2.eval_model(ds.log1p[te])
    np.testing.assert_allclose(res2["mask"], res["mask"])
    np.testing.assert_allclose(res2["c_prob"], res["c_prob"],
                               rtol=1e-5, atol=1e-5)


def test_science_quality_pinned_seed(tmp_path):
    """Fast CI proxy for the production quality claim (README: AMI
    0.90-0.94 over three seeds at the full Smart-seq shape; reference
    consensus early-stop contract cpl_mixvae.py:336,851): a pinned-seed
    planted-structure run recovers the types.  ~30 s on the CPU mesh;
    thresholds leave wide margin (measured AMI 0.94/0.95, consensus 0.76)."""
    from sklearn.metrics.cluster import adjusted_mutual_info_score

    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=400, n_genes=32, n_types=8, seed=0)
    cpl = CplMixVAE(saving_folder=str(tmp_path), seed=546)
    cpl.init_model(n_categories=8, input_dim=32, fc_dim=16, lowD_dim=8,
                   n_arm=2, tau=0.1, batch_size=100, epochs_per_jit=100)
    cpl.train(ds.log1p, n_epoch=300)
    res = cpl.eval_model(ds.log1p)
    for a in range(2):
        ami = adjusted_mutual_info_score(ds.cluster_label,
                                         res["pred_label"][a])
        assert ami > 0.8, f"arm {a} AMI {ami:.3f} below the quality bar"
    assert res["consensus"] > 0.6


def test_standalone_load_without_init(tmp_path):
    """construct → ``load_model(path)`` → ``eval_model`` with NO prior
    ``init_model``: configs/optimizer/mesh rebuilt from checkpoint
    metadata (the reference eval workflow, evaluation.py:15-23)."""
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=120, n_genes=48, n_types=6, seed=2)
    cpl = CplMixVAE(saving_folder=str(tmp_path))
    cpl.init_model(n_categories=6, input_dim=48, fc_dim=16, lowD_dim=8,
                   n_arm=2, tau=0.1, batch_size=24, epochs_per_jit=2)
    path = cpl.train(ds.log1p, n_epoch=2)
    res = cpl.eval_model(ds.log1p)

    fresh = CplMixVAE(saving_folder=str(tmp_path))
    epoch = fresh.load_model(path)          # no init_model
    assert epoch == 2
    assert fresh.cfg.n_categories == 6 and fresh.cfg.input_dim == 48
    assert fresh.tcfg.batch_size == 24
    res2 = fresh.eval_model(ds.log1p)
    np.testing.assert_allclose(res2["c_prob"], res["c_prob"],
                               rtol=1e-5, atol=1e-5)


def test_eval_model_chunked_drain_identical(tmp_path, monkeypatch):
    """The size-bounded mid-loop host drain in eval_model must be
    invisible: tiny flush bound → many drains → identical outputs."""
    from dvae_tpu.train import cpl_mixvae as cm

    ds = synthetic_dataset(n_cells=90, n_genes=32, n_types=4, seed=5)
    cpl = cm.CplMixVAE(saving_folder=str(tmp_path))
    cpl.init_model(n_categories=4, input_dim=32, fc_dim=12, lowD_dim=6,
                   n_arm=2, tau=0.1, batch_size=30, epochs_per_jit=1)
    cpl.train(ds.log1p, n_epoch=1)
    ref = cpl.eval_model(ds.log1p, batch_size=30)
    monkeypatch.setattr(cm, "_EVAL_FLUSH_BYTES", 1)
    chunked = cpl.eval_model(ds.log1p, batch_size=30)
    for k in ("c_prob", "state_mu", "state_logvar", "x_low", "pred_label"):
        np.testing.assert_array_equal(ref[k], chunked[k])
    assert ref["total_loss"] == chunked["total_loss"]


def test_ref_prior_path(data, tx):
    cfg = CFG.replace(ref_prior=True)
    state = init_train_state(jax.random.key(0), cfg, tx)
    prior = jax.nn.softmax(
        jnp.asarray(rng.random((data.shape[0], cfg.n_categories)),
                    jnp.float32), axis=-1)
    run = jax.jit(make_epoch_runner(cfg, TCFG, tx, n_train=data.shape[0]))
    state2, ems = run(state, data, prior, 1.0)
    assert np.isfinite(np.asarray(ems.total)).all()


def test_consensus_per_chunk_mode(data, tx):
    run = jax.jit(make_epoch_runner(CFG, TCFG, tx, n_train=data.shape[0],
                                    consensus_every_epoch=False))
    state = init_train_state(jax.random.key(0), CFG, tx)
    _, ems = run(state, data, None, 1.0)
    c = np.asarray(ems.consensus)
    assert (c[:-1] == -1.0).all()        # skipped epochs are sentinels
    assert 0.0 <= c[-1] <= 1.0           # chunk-final epoch is real


def test_resume_from_checkpoint(tmp_path):
    """Train → checkpoint → fresh trainer resumes at the stored epoch with
    identical predictions (reference init_model(trained_model=...),
    cpl_mixvae.py:276-283)."""
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=120, n_genes=48, n_types=8, seed=2)
    kw = dict(n_categories=8, input_dim=48, fc_dim=16, lowD_dim=8,
              n_arm=2, tau=0.1, batch_size=32, epochs_per_jit=2)
    c1 = CplMixVAE(saving_folder=str(tmp_path))
    c1.init_model(**kw)
    path = c1.train(ds.log1p, n_epoch=2, save_plots=False)
    r1 = c1.eval_model(ds.log1p)

    c2 = CplMixVAE(saving_folder=str(tmp_path))
    c2.init_model(**kw, trained_model=path)
    assert int(c2.state.epoch) == 2
    r2 = c2.eval_model(ds.log1p)
    np.testing.assert_allclose(r2["c_prob"], r1["c_prob"], rtol=1e-5)


def test_opt_state_host_offload_placement(data, tx):
    from dvae_tpu.config import MeshConfig, ShardingStrategy
    from dvae_tpu.parallel.sharding import make_mesh, opt_state_shardings

    state = init_train_state(jax.random.key(0), CFG, tx)
    mesh = make_mesh(MeshConfig(data=2, arm=2, fsdp=2))
    sh = opt_state_shardings(state.opt_state, mesh,
                             ShardingStrategy.FULL_SHARD, offload_host=True)
    placed = jax.device_put(state.opt_state, sh)
    leaf = jax.tree_util.tree_leaves(placed)[1]
    assert leaf.sharding.memory_kind == "pinned_host"


def test_zinb_mode_through_trainer(tmp_path):
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=100, n_genes=40, n_types=6, seed=4)
    cpl = CplMixVAE(saving_folder=str(tmp_path))
    cpl.init_model(n_categories=6, input_dim=40, fc_dim=16, lowD_dim=8,
                   n_arm=2, tau=0.1, batch_size=32, epochs_per_jit=2,
                   mode="ZINB")
    path = cpl.train(ds.log1p, n_epoch=2, save_plots=False)
    res = cpl.eval_model(ds.log1p)
    assert np.isfinite(res["total_loss"])
    assert os.path.exists(path)


def test_trainer_augmenter_plus_fused_kernels(tmp_path):
    """Full CplMixVAE training with a frozen augmenter AND the fused
    Pallas kernels forced on — the per-arm-x fused-recon path and the
    per-arm-views fused-encoder path through the real trainer."""
    from dvae_tpu.augment.augmenter import AugmenterConfig
    from dvae_tpu.augment.train import train_augmenter
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    x = rng.gamma(2.0, 1.0, (160, 48)).astype(np.float32)
    x *= rng.random((160, 48)) > 0.6
    aug_path = str(tmp_path / "aug.ckpt")
    train_augmenter(x, AugmenterConfig(noise_dim=8, latent_dim=4,
                                       input_dim=48, n_dim=20, p_drop=0.2),
                    n_epochs=3, batch_size=40, saving_path=aug_path,
                    verbose=False)

    cpl = CplMixVAE(saving_folder=str(tmp_path / "run"), aug_file=aug_path,
                    seed=0)
    cpl.init_model(n_categories=8, input_dim=48, fc_dim=16, lowD_dim=8,
                   n_arm=2, tau=0.1, batch_size=40, epochs_per_jit=2,
                   fused=True)
    assert cpl.cfg.fused_recon and cpl.cfg.fused_encoder
    cpl.train(x, n_epoch=4, save_plots=False)
    res = cpl.eval_model(x)
    assert np.isfinite(res["total_loss"]).all()
    assert 0.0 <= res["consensus"] <= 1.0


def test_eval_step_fused_matches_unfused(data, tx):
    """make_eval_step with cfg.fused_recon must produce the same loss and
    labels as the materializing XLA path (eval was previously always
    unfused — 8x the train step's cost at production shape)."""
    from dvae_tpu.train.step import make_eval_step
    x = data[:32]
    for mode in ("MSE", "ZINB"):
        base = CFG.replace(mode=mode)
        state = init_train_state(jax.random.key(2), base, make_optimizer(base))
        aux0, lab0, _ = make_eval_step(base, TCFG)(state, x, None, 1.0)
        auxf, labf, _ = make_eval_step(
            base.replace(fused_recon=True), TCFG)(state, x, None, 1.0)
        np.testing.assert_allclose(float(aux0.total), float(auxf.total),
                                   rtol=2e-4)
        np.testing.assert_allclose(np.asarray(aux0.loss_rec),
                                   np.asarray(auxf.loss_rec), rtol=2e-4)
        np.testing.assert_array_equal(np.asarray(lab0), np.asarray(labf))


def test_preemption_sigterm_checkpoints_and_stops(tmp_path, monkeypatch):
    """SIGTERM mid-training (spot-VM preemption) → the trainer finishes the
    in-flight chunk, writes a preempt checkpoint, skips the remaining
    phases, and returns; resume picks the checkpoint up."""
    import glob
    import signal

    import dvae_tpu.train.cpl_mixvae as tm

    ds = synthetic_dataset(n_cells=160, n_genes=48, n_types=8, seed=1)
    tr, _ = stratified_split_indices(ds.cluster_label, 0.9, 546)
    cpl = tm.CplMixVAE(saving_folder=str(tmp_path))
    kw = dict(n_categories=8, input_dim=48, fc_dim=16, lowD_dim=8,
              n_arm=2, tau=0.1, batch_size=32, epochs_per_jit=2)
    cpl.init_model(**kw)

    calls = {"n": 0}
    real_mem = tm.device_memory_mb

    def mem_then_sigterm():
        calls["n"] += 1
        if calls["n"] == 2:  # during the 2nd chunk's host window
            os.kill(os.getpid(), signal.SIGTERM)
        return real_mem()

    monkeypatch.setattr(tm, "device_memory_mb", mem_then_sigterm)
    # 40 epochs requested; preempted after chunk 2 (epoch 4).  Pruning
    # phase requested too — must be skipped under preemption.
    path = cpl.train(ds.log1p[tr], n_epoch=40, n_epoch_p=4, max_prun_it=2,
                     min_con=0.99, save_plots=False)
    assert os.path.exists(path)
    assert int(np.asarray(cpl.state.epoch)) == 4  # stopped early
    pre = glob.glob(os.path.join(str(tmp_path), "*preempt_epoch_4*"))
    assert pre, "no preemption checkpoint written"
    # the previous handler was restored on exit from the guard
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    # resume: discovery finds the latest (final epoch_4) checkpoint
    from dvae_tpu.utils.checkpoint import latest_checkpoint
    found = latest_checkpoint(str(tmp_path))
    assert found is not None
    cpl2 = tm.CplMixVAE(saving_folder=str(tmp_path))
    cpl2.init_model(**kw)
    assert cpl2.load_model(found) == 4


def test_halt_on_nan_stops_phase(tmp_path, capsys):
    """A non-finite loss stops the phase at the chunk boundary instead of
    burning the remaining epoch budget (halt_on_nan, default on)."""
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=160, n_genes=48, n_types=8, seed=1)
    cpl = CplMixVAE(saving_folder=str(tmp_path))
    cpl.init_model(n_categories=8, input_dim=48, fc_dim=16, lowD_dim=8,
                   n_arm=2, tau=0.1, batch_size=32, epochs_per_jit=2)
    # poison one weight: every forward from now on is NaN
    p = jax.tree_util.tree_map(lambda x: x, cpl.state.params)
    p["fc1"]["w"] = p["fc1"]["w"].at[0, 0, 0].set(jnp.nan)
    cpl.state = cpl.state._replace(params=p)
    path = cpl.train(ds.log1p, n_epoch=40, n_epoch_p=2, max_prun_it=1,
                     min_con=1.01, save_plots=True)
    assert int(np.asarray(cpl.state.epoch)) == 2  # stopped after chunk 1
    assert "HALT: non-finite loss" in capsys.readouterr().out
    # the poisoned state must NOT be saved: no *_epoch_* file exists for
    # --resume to restore, the pruning phase was skipped (mask untouched),
    # and no plot pass ran on NaN activations
    assert path == ""
    assert not glob.glob(os.path.join(str(tmp_path), "*_epoch_*"))
    assert int(np.asarray(cpl.state.mask).sum()) == 8


def test_resume_finishes_interrupted_prune_retraining(tmp_path,
                                                      monkeypatch):
    """A kill mid-prune-retraining must not cost the iteration its
    remaining epochs: resume finishes them (prune_epochs progress) instead
    of skipping to the end because pr_it already reached the budget."""
    import signal

    import dvae_tpu.train.cpl_mixvae as tm

    ds = synthetic_dataset(n_cells=160, n_genes=48, n_types=8, seed=1)
    kw = dict(n_categories=8, input_dim=48, fc_dim=16, lowD_dim=8,
              n_arm=2, tau=0.1, batch_size=32, epochs_per_jit=2)
    c1 = tm.CplMixVAE(saving_folder=str(tmp_path))
    c1.init_model(**kw)

    calls = {"n": 0}
    real_mem = tm.device_memory_mb

    def mem_then_sigterm():
        calls["n"] += 1
        if calls["n"] == 2:  # chunk 2 = the FIRST prune-retraining chunk
            os.kill(os.getpid(), signal.SIGTERM)
        return real_mem()

    monkeypatch.setattr(tm, "device_memory_mb", mem_then_sigterm)
    # 2 main epochs (1 chunk) + 4 retraining epochs (2 chunks); preempted
    # after retraining chunk 1 -> 2 of 4 retraining epochs done
    c1.train(ds.log1p, n_epoch=2, n_epoch_p=4, max_prun_it=1,
             min_con=1.01, save_plots=False)
    assert int(np.asarray(c1.state.epoch)) == 4
    monkeypatch.setattr(tm, "device_memory_mb", real_mem)

    from dvae_tpu.utils.checkpoint import latest_checkpoint
    c2 = tm.CplMixVAE(saving_folder=str(tmp_path))
    c2.init_model(**kw)
    c2.load_model(latest_checkpoint(str(tmp_path)))
    assert c2.resume_progress == {"main_epochs": 2, "pr_it": 1,
                                  "prune_epochs": 2}
    c2.train(ds.log1p, n_epoch=0, n_epoch_p=4, max_prun_it=1,
             min_con=1.01, save_plots=False)
    # the interrupted iteration got its remaining 2 epochs, no new kills
    assert int(np.asarray(c2.state.epoch)) == 6
    assert int(np.asarray(c2.state.mask).sum()) == 7


def test_newest_checkpoint_sees_tag_only_files(tmp_path):
    """newest_checkpoint finds best_* files that carry no epoch number
    (the NaN-halt-before-first-save fallback) and never scans CWD."""
    import time as _t

    from dvae_tpu.utils.checkpoint import latest_checkpoint, newest_checkpoint

    a = tmp_path / "cpl_mixVAE_model_best_train.ckpt"
    a.write_bytes(b"x")
    _t.sleep(0.01)
    b = tmp_path / "cpl_mixVAE_model_best_prune0.ckpt"
    b.write_bytes(b"x")
    assert latest_checkpoint(str(tmp_path)) is None   # no epoch files
    assert newest_checkpoint(str(tmp_path)) == str(b)
    assert newest_checkpoint("") is None


def test_resume_progress_survives_pruning(tmp_path):
    """Phase-aware resume accounting: after a run that finished its main
    budget and pruned, load_model reports MAIN epochs only (so callers
    don't over-subtract) and a follow-up train() continues the prune
    budget instead of restarting it."""
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=160, n_genes=48, n_types=8, seed=1)
    kw = dict(n_categories=8, input_dim=48, fc_dim=16, lowD_dim=8,
              n_arm=2, tau=0.1, batch_size=32, epochs_per_jit=2)
    c1 = CplMixVAE(saving_folder=str(tmp_path))
    c1.init_model(**kw)
    # min_con > 1 forces pruning every iteration; budget = 1 iteration
    path = c1.train(ds.log1p, n_epoch=4, n_epoch_p=2, max_prun_it=1,
                    min_con=1.01, save_plots=False)
    assert int(np.asarray(c1.state.epoch)) == 6       # 4 main + 2 prune
    assert int(np.asarray(c1.state.mask).sum()) == 7  # one category killed

    c2 = CplMixVAE(saving_folder=str(tmp_path))
    c2.init_model(**kw)
    assert c2.load_model(path) == 6        # total epoch (API contract)
    done = c2.resume_progress["main_epochs"]
    assert done == 4                       # main epochs, for budget math
    assert c2.resume_progress["pr_it"] == 1
    # restart with the same budgets (the --resume workflow): no main
    # epochs remain and the prune budget is already spent — nothing new
    # gets pruned
    c2.train(ds.log1p, n_epoch=max(4 - done, 0), n_epoch_p=2,
             max_prun_it=1, min_con=1.01, save_plots=False)
    assert int(np.asarray(c2.state.mask).sum()) == 7
    assert int(np.asarray(c2.state.epoch)) == 6


def test_resume_right_after_prune_checkpoint_retrains(tmp_path):
    """A kill between the ``before_pruning_{k}`` checkpoint and the first
    retraining chunk leaves pr_it=k+1 with prune_epochs=0 — resume must
    run iteration k's ENTIRE retraining (it is owed in full), not skip to
    pruning a second category with an untrained mask."""
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=160, n_genes=48, n_types=8, seed=1)
    kw = dict(n_categories=8, input_dim=48, fc_dim=16, lowD_dim=8,
              n_arm=2, tau=0.1, batch_size=32, epochs_per_jit=2)
    c1 = CplMixVAE(saving_folder=str(tmp_path))
    c1.init_model(**kw)
    c1.train(ds.log1p, n_epoch=4, n_epoch_p=2, max_prun_it=1,
             min_con=1.01, save_plots=False)

    # the state the kill would leave behind: the before_pruning checkpoint
    # (saved right after the kill-category mask update, before any
    # retraining) records pr_it=1, prune_epochs=0, epoch=4
    ckpts = glob.glob(os.path.join(str(tmp_path), "**",
                                   "*before_pruning_0*"), recursive=True)
    assert ckpts, "before_pruning checkpoint not found"
    c2 = CplMixVAE(saving_folder=str(tmp_path))
    c2.init_model(**kw)
    assert c2.load_model(ckpts[0]) == 4
    assert c2.resume_progress["pr_it"] == 1
    assert c2.resume_progress["prune_epochs"] == 0
    assert int(np.asarray(c2.state.epoch)) == 4

    c2.train(ds.log1p, n_epoch=0, n_epoch_p=2, max_prun_it=1,
             min_con=1.01, save_plots=False)
    # iteration 0's retraining ran in full (4 main + 2 prune epochs) and
    # the spent prune budget (pr_it=1 == max_prun_it) pruned nothing new
    assert int(np.asarray(c2.state.epoch)) == 6
    assert int(np.asarray(c2.state.mask).sum()) == 7


def test_standalone_load_of_bigger_mesh_checkpoint(tmp_path):
    """A checkpoint whose tcfg.mesh wants more devices than this host has
    must load UNSHARDED (eval needs no mesh) instead of raising in
    make_mesh (review finding: multi-chip-trained runs were un-evaluable
    on a single chip)."""
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=96, n_genes=32, n_types=4, seed=3)
    cpl = CplMixVAE(saving_folder=str(tmp_path))
    cpl.init_model(n_categories=4, input_dim=32, fc_dim=12, lowD_dim=6,
                   n_arm=2, tau=0.1, batch_size=24, epochs_per_jit=1)
    path = cpl.train(ds.log1p, n_epoch=1)
    ref = cpl.eval_model(ds.log1p)

    # rewrite the checkpoint metadata to claim a 16-device training mesh
    import pickle
    with open(path, "rb") as f:
        blob = pickle.load(f)
    blob["metadata"]["tcfg"]["mesh"] = {"data": 4, "arm": 2, "fsdp": 2}
    big = str(tmp_path / "big_mesh.ckpt")
    with open(big, "wb") as f:
        pickle.dump(blob, f)

    fresh = CplMixVAE(saving_folder=str(tmp_path))
    assert fresh.load_model(big) == 1
    assert fresh.mesh is None                      # fell back, no raise
    res = fresh.eval_model(ds.log1p)
    np.testing.assert_allclose(res["c_prob"], ref["c_prob"],
                               rtol=1e-5, atol=1e-5)


def test_preemption_guard_restores_default_over_c_handler():
    """When the pre-existing SIGTERM handler was C-level (signal.signal
    returned None), __exit__ must restore SIG_DFL — leaving the guard's
    handler installed would swallow every later SIGTERM (review finding)."""
    import signal
    from dvae_tpu.train.cpl_mixvae import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    try:
        g = PreemptionGuard()
        with g:
            g._prev[signal.SIGTERM] = None  # simulate a C-level previous
        assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_append_multi_model_registry(tmp_path):
    """append() (reference cpl_mixvae.py:288-315) builds extra model entries
    without disturbing the trainer's own state, and trained_model= loads
    checkpoint weights into the new entry."""
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=60, n_genes=24, n_types=4, seed=0)
    kw = dict(n_categories=4, input_dim=24, fc_dim=8, lowD_dim=4, n_arm=2,
              tau=0.1, batch_size=30, epochs_per_jit=1)
    cpl = CplMixVAE(str(tmp_path))
    cpl.init_model(**kw)
    path = cpl.train(ds.log1p, n_epoch=1, save_plots=False)
    own_state = cpl.state

    entry3 = cpl.append(**{**kw, "n_arm": 3})
    loaded = cpl.append(**kw, trained_model=path)

    assert cpl.state is own_state          # trainer state untouched
    assert len(cpl.models) == 2
    assert entry3["cfg"].n_arm == 3
    assert entry3["state"].params["fc1"]["w"].shape[0] == 3
    # trained_model entry carries the checkpointed weights
    np.testing.assert_array_equal(
        np.asarray(loaded["state"].params["fc1"]["w"]),
        np.asarray(own_state.params["fc1"]["w"]))
    # and its registry entry differs from a fresh init
    assert not np.allclose(np.asarray(entry3["state"].params["fc1"]["w"][:2]),
                           np.asarray(own_state.params["fc1"]["w"]))


def test_reinit_invalidates_cached_eval_closures(tmp_path):
    """Re-calling init_model (same shapes, different hyperparameters) must
    rebuild the jitted eval closures — a stale closure would silently eval
    with the previous cfg baked in."""
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=80, n_genes=24, n_types=4, seed=0)
    kw = dict(n_categories=4, input_dim=24, fc_dim=8, lowD_dim=4, n_arm=2,
              batch_size=40, epochs_per_jit=1)
    cpl = CplMixVAE(str(tmp_path))
    cpl.init_model(**kw, tau=0.1, beta=1.0)
    cpl.train(ds.log1p, n_epoch=1, save_plots=False)
    r1 = cpl.eval_model(ds.log1p)
    assert cpl._eval_step is not None
    cpl.init_model(**kw, tau=0.1, beta=100.0)    # same shapes, new beta
    assert cpl._eval_step is None                # caches invalidated
    r2 = cpl.eval_model(ds.log1p)
    # beta scales the KL inside the eval total: a stale closure would
    # reproduce r1's total exactly
    assert r2["total_loss"] != r1["total_loss"]


def test_resume_continues_prng_chain(tmp_path):
    """Checkpoints carry the PRNG key: a resumed run continues the
    noise/shuffle chain instead of replaying the run's first epochs."""
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=80, n_genes=24, n_types=4, seed=0)
    kw = dict(n_categories=4, input_dim=24, fc_dim=8, lowD_dim=4, n_arm=2,
              tau=0.1, batch_size=40, epochs_per_jit=1)
    cpl = CplMixVAE(str(tmp_path))
    cpl.init_model(**kw)
    init_key_data = np.asarray(jax.random.key_data(cpl.state.key)).copy()
    path = cpl.train(ds.log1p, n_epoch=2, save_plots=False)
    trained_key_data = np.asarray(jax.random.key_data(cpl.state.key))
    assert not np.array_equal(trained_key_data, init_key_data)

    fresh = CplMixVAE(str(tmp_path))
    fresh.load_model(path)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(fresh.state.key)), trained_key_data)
