"""Model-forward tests: shapes, BN semantics vs torch, eval determinism, masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.config import ReparamNoise, VAEConfig
from dvae_tpu.models import apply, init_bn_state, init_params, param_count
from dvae_tpu.models.mixvae import _batch_norm
from dvae_tpu.models.sampling import gumbel_softmax, hard_one_hot_st

rng = np.random.default_rng(7)

CFG = VAEConfig(n_categories=10, input_dim=40, fc_dim=16, lowD_dim=8,
                state_dim=2, n_arm=2, tau=0.1)


def _setup(cfg=CFG):
    params = init_params(jax.random.key(0), cfg)
    bn = init_bn_state(cfg)
    xs = jnp.asarray(rng.random((cfg.n_arm, 24, cfg.input_dim)).astype(np.float32))
    return params, bn, xs


def test_output_shapes():
    params, bn, xs = _setup()
    outs, bn2 = apply(params, bn, CFG, xs, jax.random.key(1), train=True)
    A, B = CFG.n_arm, 24
    assert outs.x_rec.shape == (A, B, CFG.input_dim)
    assert outs.c.shape == (A, B, CFG.n_categories)
    assert outs.c_smp.shape == (A, B, CFG.n_categories)
    assert outs.s_smp.shape == (A, B, CFG.state_dim)
    assert outs.x_low.shape == (A, B, CFG.lowD_dim)
    # BN state updated in train mode
    assert not np.allclose(np.asarray(bn2["bn1"]["mean"]),
                           np.asarray(bn["bn1"]["mean"]))


def test_param_count_matches_reference_formula():
    """A=2 smart-seq-shaped model ≈ 22M params (reference dist/fsdp.py:672-675)."""
    cfg = VAEConfig()  # defaults: D=5032, F=100, L=10, C=92, S=2, A=2
    n = param_count(init_params(jax.random.key(0), cfg))
    # per-arm: encoder D*100+100 + 3*(100*100+100) + 100*10+10 + fcc 10*92+92
    #          + mu/sigma 2*(102*2+2) + dec 94*10+10 + 10*100+100 + 3*(100*100+100)
    #          + 100*D+D
    per_arm = (5032 * 100 + 100) + 3 * (100 * 100 + 100) + (100 * 10 + 10) \
        + (10 * 92 + 92) + 2 * ((10 + 92) * 2 + 2) + ((92 + 2) * 10 + 10) \
        + (10 * 100 + 100) + 3 * (100 * 100 + 100) + (100 * 5032 + 5032)
    assert n == 2 * per_arm
    assert 1.0e6 < n < 3.0e6  # ~1.07M/arm: reference "22M" counts A=10-ish shapes


def test_eval_deterministic_and_onehot():
    params, bn, xs = _setup()
    o1, _ = apply(params, bn, CFG, xs, jax.random.key(1), train=False)
    o2, _ = apply(params, bn, CFG, xs, jax.random.key(99), train=False)
    # eval has no sampling in c_smp and no dropout; only reparam noise differs
    np.testing.assert_allclose(np.asarray(o1.c), np.asarray(o2.c), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(o1.c_smp), np.asarray(o2.c_smp))
    smp = np.asarray(o1.c_smp)
    np.testing.assert_allclose(smp.sum(-1), 1.0, rtol=1e-6)
    assert np.all(smp.max(-1) == 1.0)  # hard one-hot


def test_eval_does_not_update_bn():
    params, bn, xs = _setup()
    _, bn2 = apply(params, bn, CFG, xs, jax.random.key(1), train=False)
    for k in bn:
        np.testing.assert_array_equal(np.asarray(bn2[k]["mean"]),
                                      np.asarray(bn[k]["mean"]))


def test_batch_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(64, 12)).astype(np.float32) * 2 + 1
    stats = {"mean": jnp.zeros(12), "var": jnp.ones(12)}
    mom, eps = 0.01, 1e-8

    y, new_stats = _batch_norm(jnp.asarray(x), stats, True, mom, eps)

    tbn = torch.nn.BatchNorm1d(12, eps=eps, momentum=mom, affine=False)
    tbn.train()
    ty = tbn(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats["mean"]),
                               tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_stats["var"]),
                               tbn.running_var.numpy(), atol=1e-5)

    # eval mode with running stats
    y2, _ = _batch_norm(jnp.asarray(x), new_stats, False, mom, eps)
    tbn.eval()
    ty2 = tbn(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(y2), ty2.detach().numpy(), atol=1e-5)


def test_pruning_mask_zeroes_categories():
    params, bn, xs = _setup()
    mask = jnp.asarray([1, 1, 0, 1, 0, 1, 1, 1, 0, 1], dtype=jnp.float32)
    outs, _ = apply(params, bn, CFG, xs, jax.random.key(1), train=False, mask=mask)
    c = np.asarray(outs.c)
    assert np.all(c[..., [2, 4, 8]] == 0)
    np.testing.assert_allclose(c.sum(-1), 1.0, rtol=1e-5)
    # argmax never lands on a pruned category
    assert not np.isin(np.argmax(c, -1), [2, 4, 8]).any()


def test_gumbel_softmax_properties():
    phi = jax.nn.softmax(jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32)),
                         axis=-1)
    y = gumbel_softmax(jax.random.key(0), phi, 1.0, 1e-8)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, rtol=1e-5)
    yh = gumbel_softmax(jax.random.key(0), phi, 1.0, 1e-8, hard=True)
    assert np.all(np.asarray(yh).max(-1) == 1.0)


def test_straight_through_gradient():
    phi = jax.nn.softmax(jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32)))

    def f(p):
        return jnp.sum(hard_one_hot_st(p) ** 2)

    g = jax.grad(f)(phi)
    # ST estimator: d(hard)/d(soft) = identity → grad = 2*hard
    np.testing.assert_allclose(np.asarray(g),
                               2 * np.asarray(hard_one_hot_st(phi)), rtol=1e-5)


def test_uniform_reparam_flag():
    cfg = CFG.replace(reparam_noise=ReparamNoise.UNIFORM)
    params, bn, xs = _setup(cfg)
    outs, _ = apply(params, bn, cfg, xs, jax.random.key(1), train=True)
    # uniform noise in [0,1): s_smp - mean = e*std >= 0 elementwise
    delta = np.asarray(outs.s_smp) - np.asarray(outs.s_mean)
    assert np.all(delta >= 0)


def test_ref_prior_path():
    cfg = CFG.replace(ref_prior=True)
    params, bn, xs = _setup(cfg)
    prior = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(24, cfg.n_categories)).astype(np.float32)), axis=-1)
    outs, _ = apply(params, bn, cfg, xs, jax.random.key(1), train=True,
                    prior_c=prior)
    assert outs.s_mean.shape == (2, 24, cfg.state_dim)
    from dvae_tpu.models import mixvae_loss
    lo = mixvae_loss(cfg, outs, xs, prior_c=prior)
    assert np.isfinite(float(lo.total))


def test_ref_prior_scalers_match_reference():
    """ref_prior mode uses scaler=A and n_comb=A(A+1)/2 (reference
    build/lib nn_model.py:406-408): total = A·Σ(rec+βKL) + loss_joint, and
    the additive constant inside loss_joint carries the n_comb multiplier."""
    import math

    from dvae_tpu.models import mixvae_loss

    for A in (2, 3):
        cfg = CFG.replace(ref_prior=True, n_arm=A)
        params, bn, xs = _setup(cfg)
        prior = jax.nn.softmax(jnp.asarray(
            rng.normal(size=(24, cfg.n_categories)).astype(np.float32)), -1)
        outs, _ = apply(params, bn, cfg, xs, jax.random.key(1), train=True,
                        prior_c=prior)
        lo = mixvae_loss(cfg, outs, xs, prior_c=prior)
        n_comb = A * (A + 1) // 2
        # total decomposes with the ref_prior scaler A
        ind = float(jnp.sum(lo.loss_rec + cfg.beta * lo.kl))
        np.testing.assert_allclose(float(lo.total),
                                   A * ind + float(lo.loss_joint), rtol=1e-5)
        # loss_joint = lam·Σd + Σ(−H) + n_comb·const, where the returned
        # c_dist/neg_entropy metrics are the per-term means over n_comb
        const = n_comb * ((cfg.n_categories / 2) * math.log(2 * math.pi)
                          - 0.5 * math.log(2 * cfg.lam))
        rebuilt = (cfg.lam * float(lo.c_dist) * n_comb
                   + float(lo.neg_entropy) * n_comb + const)
        np.testing.assert_allclose(float(lo.loss_joint), rebuilt, rtol=1e-4)
        # no-prior mode keeps the old scalers on the same outputs
        lo0 = mixvae_loss(cfg.replace(ref_prior=False), outs, xs)
        ind0 = float(jnp.sum(lo0.loss_rec + cfg.beta * lo0.kl))
        np.testing.assert_allclose(
            float(lo0.total), max(A - 1, 1) * ind0 + float(lo0.loss_joint),
            rtol=1e-5)


def test_apply_accepts_legacy_uint32_keys():
    params, bn, xs = _setup()
    outs, _ = apply(params, bn, CFG, xs, jax.random.PRNGKey(3), train=False)
    assert np.isfinite(np.asarray(outs.x_rec)).all()


def test_state_changes_honors_uniform_reparam_flag():
    """With ReparamNoise.UNIFORM the traversal resamples with U[0,1) noise
    (one-sided above the mean for positive std), matching the reference's
    rand_like quirk; Gaussian stays two-sided."""
    from dvae_tpu.models.mixvae import state_changes

    params, bn, xs = _setup()
    x = xs[0]
    for noise, one_sided in ((ReparamNoise.UNIFORM, True),
                             (ReparamNoise.GAUSSIAN, False)):
        cfg = CFG.replace(reparam_noise=noise)
        recon, s_vals = state_changes(params, bn, cfg, x, d_s=0,
                                      key=jax.random.key(2), n_samp=16)
        outs, _ = apply(params, bn, cfg, xs, jax.random.key(2), temp=1.0,
                        train=False)
        mean0 = np.asarray(outs.s_mean[..., 0])          # (A, B)
        delta = np.asarray(s_vals) - mean0[:, None, :]   # (A, n_samp, B)
        if one_sided:
            assert (delta >= -1e-6).all()
        else:
            assert (delta < 0).any() and (delta > 0).any()
