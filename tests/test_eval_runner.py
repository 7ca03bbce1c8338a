"""The scanned eval runner (train/step.make_eval_runner) must be
batch-for-batch identical to looping the eval step — it only changes how
many batches ride per dispatch (reference hot loop:
mmidas/cpl_mixvae.py:1450-1619, driven per batch from python there)."""

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.config import TrainConfig, VAEConfig
from dvae_tpu.data.anndata_io import synthetic_dataset
from dvae_tpu.train.step import (init_train_state, make_eval_runner,
                                 make_eval_step, make_optimizer)

CFG = VAEConfig(n_categories=6, input_dim=40, fc_dim=16, lowD_dim=8,
                state_dim=2, n_arm=3, tau=0.1)
TCFG = TrainConfig(batch_size=16)


def test_runner_matches_per_batch_loop():
    tx = make_optimizer(CFG)
    state = init_train_state(jax.random.key(0), CFG, tx)
    ds = synthetic_dataset(n_cells=64, n_genes=40, n_types=6, seed=0)
    x = jnp.asarray(ds.log1p)
    K, B = 4, TCFG.batch_size

    ev = make_eval_step(CFG, TCFG)
    run = make_eval_runner(CFG, TCFG)

    aux_r, f = run(state, x.reshape(K, B, -1), 1.0)
    assert f.lab.shape == (CFG.n_arm, K * B)
    assert f.c.shape == (CFG.n_arm, K * B, CFG.n_categories)

    for k in range(K):
        aux_b, lab_b, outs_b = ev(state, x[k * B: (k + 1) * B], None, 1.0)
        np.testing.assert_array_equal(
            np.asarray(f.lab[:, k * B: (k + 1) * B]), np.asarray(lab_b))
        np.testing.assert_allclose(
            np.asarray(f.c[:, k * B: (k + 1) * B]), np.asarray(outs_b.c),
            rtol=1e-6, atol=1e-6)
        for name in ("s_mean", "s_logvar", "x_low"):
            np.testing.assert_allclose(
                np.asarray(getattr(f, name)[:, k * B: (k + 1) * B]),
                np.asarray(getattr(outs_b, name)), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(aux_r.total[k]),
                                   np.asarray(aux_b.total), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(aux_r.loss_rec[k]),
                                   np.asarray(aux_b.loss_rec), rtol=1e-6)


def test_eval_model_runner_and_tail_paths_agree(tmp_path):
    """eval_model with a dataset spanning runner chunks + a leftover full
    batch + a partial tail must equal a pure per-batch pass (forced by a
    batch_size that disables the runner: fewer than 2 full batches)."""
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=150, n_genes=40, n_types=6, seed=1)
    cpl = CplMixVAE(saving_folder=str(tmp_path))
    cpl.init_model(n_categories=6, input_dim=40, fc_dim=16, lowD_dim=8,
                   n_arm=2, tau=0.1, batch_size=16, epochs_per_jit=1)
    # n=150, B=16: K=8 runner chunk covers 128, then one full batch of 16
    # and a 6-row tail go per-batch
    res = cpl.eval_model(ds.log1p, batch_size=16)
    assert res["pred_label"].shape == (2, 150)

    # manual per-batch reference at the SAME batch size (the pre-runner
    # eval_model loop): labels must be bit-identical, posteriors close
    x = jnp.asarray(ds.log1p, np.float32)
    labs, cs = [], []
    for i in range(0, 150, 16):
        _, lab_b, outs_b = cpl._eval_step(cpl.state, x[i: i + 16], None, 1.0)
        labs.append(np.asarray(lab_b))
        cs.append(np.asarray(outs_b.c))
    np.testing.assert_array_equal(res["pred_label"],
                                  np.concatenate(labs, axis=1))
    np.testing.assert_allclose(res["c_prob"], np.concatenate(cs, axis=1),
                               rtol=1e-6, atol=1e-7)


def test_ref_prior_flows_through_eval_surfaces(tmp_path):
    """Under cfg.ref_prior the validation/eval loss must include the
    prior-coupling terms and the state head must consume the prior
    (reference val loop gathers c_p[n] per batch, cpl_mixvae.py:621-625;
    eval_model's c_p arg :1457) — and the runner-chunk path must agree
    with the per-batch path when a prior rides along."""
    from dvae_tpu.data.anndata_io import synthetic_dataset
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=96, n_genes=40, n_types=6, seed=3)
    cpl = CplMixVAE(saving_folder=str(tmp_path))
    cpl.init_model(n_categories=6, input_dim=40, fc_dim=16, lowD_dim=8,
                   n_arm=2, tau=0.1, ref_prior=True, batch_size=16,
                   epochs_per_jit=1)
    cpl.train(ds.log1p, n_epoch=1, c_p=ds.c_p, save_plots=False)

    # prior changes the loss (coupling terms + state-head input)
    v_with = cpl.validate(ds.log1p, c_p=ds.c_p, batch_size=16)
    v_without = cpl.validate(ds.log1p, batch_size=16)
    assert v_with["loss"] != v_without["loss"]

    res = cpl.eval_model(ds.log1p, batch_size=16, c_p=ds.c_p)
    # runner chunks (K=6 covers all 96 rows) vs pure per-batch: same prior
    # rows per batch -> identical states/labels
    x = jnp.asarray(ds.log1p, np.float32)
    mus, labs = [], []
    for i in range(0, 96, 16):
        pb = jnp.asarray(ds.c_p[i: i + 16], jnp.float32)
        _, lab_b, outs_b = cpl._eval_step(cpl.state, x[i: i + 16], pb, 1.0)
        mus.append(np.asarray(outs_b.s_mean))
        labs.append(np.asarray(lab_b))
    np.testing.assert_array_equal(res["pred_label"],
                                  np.concatenate(labs, axis=1))
    np.testing.assert_allclose(res["state_mu"], np.concatenate(mus, axis=1),
                               rtol=1e-6, atol=1e-7)
    # without the prior the state head consumes c_smp instead -> different
    res_np = cpl.eval_model(ds.log1p, batch_size=16)
    assert not np.allclose(res["state_mu"], res_np["state_mu"])


def test_runner_zinb_fused_matches_per_batch_loop():
    """ZINB mode with the fused kernels on (interpret mode off-TPU): the
    serving path bench.py measures as infer_throughput_A5_zinb — the
    fwd-only fused ZINB loss in an UNROLLED scan (the SMEM-output rule,
    train/step.make_eval_runner docstring) must equal the per-batch loop."""
    cfg = CFG.replace(mode="ZINB", fused_recon=True, fused_encoder=True)
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(1), cfg, tx)
    ds = synthetic_dataset(n_cells=32, n_genes=40, n_types=6, seed=2)
    x = jnp.asarray(ds.log1p)
    K, B = 2, TCFG.batch_size

    ev = make_eval_step(cfg, TCFG)
    run = make_eval_runner(cfg, TCFG)
    aux_r, f = run(state, x.reshape(K, B, -1), 1.0)
    assert np.isfinite(np.asarray(aux_r.total)).all()
    for k in range(K):
        aux_b, lab_b, _ = ev(state, x[k * B: (k + 1) * B], None, 1.0)
        np.testing.assert_array_equal(
            np.asarray(f.lab[:, k * B: (k + 1) * B]), np.asarray(lab_b))
        np.testing.assert_allclose(np.asarray(aux_r.total[k]),
                                   np.asarray(aux_b.total), rtol=1e-6)
