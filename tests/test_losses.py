"""Loss-function oracle tests.

Strategy (SURVEY.md §4): every optimized/vectorized implementation is checked
against (a) an independent numpy oracle written from the published equations
and (b) torch CPU functional ops where the reference relies on subtle torch
semantics (BCE log-clamp, unbiased variance).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.config import VAEConfig
from dvae_tpu.models import apply, init_bn_state, init_params, mixvae_loss
from dvae_tpu.models.losses import (
    bce,
    binarize,
    coupling_distance,
    coupling_distance_naive,
    inv_sd,
    kl_gaussian,
    l2_pair_sum_naive,
    neg_entropy,
    recon_loss_mse,
    zinb_loss,
    _pair_sums_from_gram,
)

rng = np.random.default_rng(42)
EPS = 1e-8


def test_binarize():
    x = jnp.array([0.0, 0.05, 0.1, 0.11, 3.0])
    np.testing.assert_array_equal(binarize(x, 0.1), [0, 0, 0, 1, 1])


def test_bce_matches_torch_on_binary_inputs():
    torch = pytest.importorskip("torch")
    p = (rng.random((64, 32)) > 0.5).astype(np.float32)
    t = (rng.random((64, 32)) > 0.5).astype(np.float32)
    ours = float(bce(jnp.asarray(p), jnp.asarray(t)))
    theirs = float(torch.nn.functional.binary_cross_entropy(
        torch.tensor(p), torch.tensor(t)))
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_bce_matches_torch_on_soft_inputs():
    torch = pytest.importorskip("torch")
    p = rng.random((50, 20)).astype(np.float32) * 0.98 + 0.01
    t = rng.random((50, 20)).astype(np.float32)
    ours = float(bce(jnp.asarray(p), jnp.asarray(t)))
    theirs = float(torch.nn.functional.binary_cross_entropy(
        torch.tensor(p), torch.tensor(t)))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_kl_oracle():
    mu = rng.normal(size=(128, 2)).astype(np.float32)
    logvar = rng.normal(size=(128, 2)).astype(np.float32) * 0.3
    # KL(N(mu, sigma²) || N(0,1)) mean over batch, summed over dims
    expect = (-0.5 * np.mean(1 + logvar - mu**2 - np.exp(logvar), axis=0)).sum()
    got = float(kl_gaussian(jnp.asarray(mu), jnp.asarray(logvar)))
    assert got == pytest.approx(float(expect), rel=1e-5)


def test_recon_loss_mse_oracle():
    x = rng.random((40, 30)).astype(np.float32)
    xr = rng.random((40, 30)).astype(np.float32)
    got = float(recon_loss_mse(jnp.asarray(xr), jnp.asarray(x)))
    mse = 0.5 * np.sum((xr - x) ** 2) / 40
    pb, tb = (xr > 0.1).astype(np.float64), (x > 0.1).astype(np.float64)
    bce_term = 0.5 * 100.0 * np.mean(pb != tb)
    assert got == pytest.approx(mse + bce_term, rel=1e-4)


def test_recon_bce_term_carries_no_gradient():
    x = jnp.asarray(rng.random((16, 8)).astype(np.float32))

    def f(xr):
        return recon_loss_mse(xr, x)

    xr = jnp.asarray(rng.random((16, 8)).astype(np.float32))
    g = jax.grad(f)(xr)
    np.testing.assert_allclose(np.asarray(g), (np.asarray(xr) - np.asarray(x)) / 16,
                               rtol=1e-5)


def test_inv_sd_unbiased_matches_torch():
    torch = pytest.importorskip("torch")
    c = rng.random((3, 200, 9)).astype(np.float32)
    ours = np.asarray(inv_sd(jnp.asarray(c), EPS))
    tv = torch.tensor(c).var(dim=1, keepdim=True)  # unbiased by default
    theirs = (1.0 / (tv + EPS)).sqrt().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_coupling_distance_matches_naive():
    for A in [2, 3, 5]:
        c = jax.nn.softmax(jnp.asarray(
            rng.normal(size=(A, 64, 12)).astype(np.float32)) * 3, axis=-1)
        fast = float(coupling_distance(c, EPS))
        naive = float(coupling_distance_naive(c, EPS))
        assert fast == pytest.approx(naive, rel=1e-3)


def test_pair_sums_from_gram_matches_naive():
    v = jnp.asarray(rng.normal(size=(4, 50, 7)).astype(np.float32))
    assert float(_pair_sums_from_gram(v)) == pytest.approx(
        float(l2_pair_sum_naive(v)), rel=1e-4)


def test_neg_entropy_oracle():
    c = jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 30, 6)).astype(np.float32)),
                       axis=-1)
    logc = jnp.log(c + EPS)
    got = np.asarray(neg_entropy(c, logc))
    expect = np.mean(np.sum(np.asarray(c) * np.asarray(logc), axis=-1), axis=-1)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_zinb_loss_finite_and_oracle():
    x = jnp.asarray(np.log1p(rng.poisson(2.0, (20, 15))).astype(np.float32))
    xr = jnp.asarray(rng.random((20, 15)).astype(np.float32) * 3)
    xp = jnp.asarray(rng.random((20, 15)).astype(np.float32) * 0.9 + 0.05)
    zr = jnp.asarray(rng.random((20, 15)).astype(np.float32) * 0.9 + 0.05)
    val = float(zinb_loss(xr, xp, zr, x))
    assert np.isfinite(val)
    # numpy oracle from the ZINB log-likelihood decomposition
    eps = 1e-6
    k = np.exp(np.asarray(x)) - 1.0
    r = np.asarray(xr) + eps
    p = (1 - eps) * (np.asarray(xp) + eps)
    z = (1 - eps) * (np.asarray(zr) + eps)
    nz = (np.asarray(x) > 0).astype(np.float64)
    from scipy.special import gammaln
    lz = (nz - 1.0) * np.log(z + (1 - z) * (1 - p) ** r)
    lnz = nz * (-gammaln(k + r) + gammaln(r) - k * np.log(p)
                - r * np.log(1 - p) - np.log(1 - z))
    assert val == pytest.approx(float(np.mean(lz + lnz)), rel=1e-3)


def _numpy_total_loss(cfg, outs, xs):
    """Independent total-loss oracle per the published formula:
    total = max(A-1,1)·Σ(rec + β·KL) + λ·Σd + Σ(-H) + P·((C/2)·log2π − ½·log2λ)
    """
    A, C = cfg.n_arm, cfg.n_categories
    B = xs.shape[1]
    total_ind = 0.0
    for a in range(A):
        x, xr = np.asarray(xs[a]), np.asarray(outs.x_rec[a])
        mse = 0.5 * np.sum((xr - x) ** 2) / B
        pb, tb = (xr > 0.1), (x > 0.1)
        rec = mse + 0.5 * 100.0 * np.mean(pb != tb)
        mu, lv = np.asarray(outs.s_mean[a]), np.asarray(outs.s_logvar[a])
        kl = (-0.5 * np.mean(1 + lv - mu**2 - np.exp(lv), axis=0)).sum()
        total_ind += rec + cfg.beta * kl
    sum_d, sum_e = 0.0, 0.0
    c_np = np.asarray(outs.c, dtype=np.float64)
    for a in range(A):
        ca = c_np[a]
        va = ca.var(axis=0, ddof=1)
        pa = np.log(ca + cfg.eps) * np.sqrt(1 / (va + cfg.eps))
        ha = np.mean(np.sum(ca * np.log(ca + cfg.eps), axis=-1))
        for b in range(a + 1, A):
            cb = c_np[b]
            vb = cb.var(axis=0, ddof=1)
            pb_ = np.log(cb + cfg.eps) * np.sqrt(1 / (vb + cfg.eps))
            hb = np.mean(np.sum(cb * np.log(cb + cfg.eps), axis=-1))
            sum_d += np.mean(np.sum((pa - pb_) ** 2, axis=-1))
            sum_e += ha + hb
    P = max(A * (A - 1) // 2, 1)
    const = P * ((C / 2) * math.log(2 * math.pi) - 0.5 * math.log(2 * cfg.lam))
    joint = cfg.lam * sum_d + sum_e + const
    return max(A - 1, 1) * total_ind + joint


@pytest.mark.parametrize("A", [2, 3])
def test_full_loss_matches_numpy_oracle(A):
    cfg = VAEConfig(n_categories=8, input_dim=32, fc_dim=12, lowD_dim=6,
                    state_dim=2, n_arm=A, tau=0.1)
    params = init_params(jax.random.key(0), cfg)
    bn = init_bn_state(cfg)
    xs = jnp.asarray(rng.random((A, 48, 32)).astype(np.float32))
    outs, _ = apply(params, bn, cfg, xs, jax.random.key(1), train=True)
    got = float(mixvae_loss(cfg, outs, xs).total)
    expect = _numpy_total_loss(cfg, outs, xs)
    assert got == pytest.approx(expect, rel=1e-3)


def test_loss_metrics_denominators():
    cfg = VAEConfig(n_categories=6, input_dim=16, fc_dim=8, lowD_dim=4,
                    state_dim=2, n_arm=3, tau=0.5)
    params = init_params(jax.random.key(0), cfg)
    bn = init_bn_state(cfg)
    xs = jnp.asarray(rng.random((3, 20, 16)).astype(np.float32))
    outs, _ = apply(params, bn, cfg, xs, jax.random.key(1), train=True)
    lo = mixvae_loss(cfg, outs, xs)
    # c_dist is the per-pair mean
    assert float(lo.c_dist) == pytest.approx(
        float(coupling_distance(outs.c, cfg.eps)) / 3, rel=1e-5)


def test_full_loss_matches_naive_oracle():
    """Vectorized mixvae_loss.total == the python pair-loop transcription of
    the reference accumulation (the loss_naive/loss_vectorize idiom,
    mmidas/nn_model.py:600-628)."""
    from dvae_tpu.models.losses import mixvae_loss_naive

    cfg = VAEConfig(n_categories=7, input_dim=30, fc_dim=12, lowD_dim=6,
                    state_dim=2, n_arm=4, tau=0.1, lam=2.5, beta=1.3)
    params = init_params(jax.random.key(0), cfg)
    bn = init_bn_state(cfg)
    xs = jnp.asarray(rng.random((4, 20, 30)).astype(np.float32))
    outs, _ = apply(params, bn, cfg, xs, jax.random.key(1), train=True)
    fast = float(mixvae_loss(cfg, outs, xs).total)
    slow = float(mixvae_loss_naive(cfg, outs, xs))
    assert fast == pytest.approx(slow, rel=1e-5)


def test_recon_bce_metric_flag_gradient_identical():
    """recon_bce_metric=False changes the loss VALUE but not gradients
    (the BCE term is zero-gradient in the reference too)."""
    cfg_on = VAEConfig(n_categories=6, input_dim=24, fc_dim=12, lowD_dim=6,
                       n_arm=2, tau=0.1)
    cfg_off = cfg_on.replace(recon_bce_metric=False)
    params = init_params(jax.random.key(0), cfg_on)
    bn = init_bn_state(cfg_on)
    xs = jnp.asarray(rng.random((2, 16, 24)).astype(np.float32))

    def total(p, cfg):
        outs, _ = apply(p, bn, cfg, xs, jax.random.key(1), train=True)
        return mixvae_loss(cfg, outs, xs).total

    g_on = jax.grad(total)(params, cfg_on)
    g_off = jax.grad(total)(params, cfg_off)
    for (ka, a), b in zip(sorted(g_on.items()), 
                          [v for _, v in sorted(g_off.items())]):
        np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]),
                                   rtol=1e-6, err_msg=ka)
    # values differ (the BCE term is positive)
    assert float(total(params, cfg_on)) > float(total(params, cfg_off))


def test_coupling_distance_survives_dead_categories():
    """Regression: with sharp posteriors (dead categories at exact zero,
    the production tau=0.005 regime), the uncentered Gram form cancels
    catastrophically in f32 and returned 0.0; the centered form must
    match the naive pair-loop oracle."""
    rng2 = np.random.default_rng(0)
    A, B, C = 2, 512, 92
    logits = rng2.normal(size=(A, B, 10)).astype(np.float32) * 3
    c = np.zeros((A, B, C), np.float32)
    c[:, :, :10] = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    c = jnp.asarray(c)
    v = float(coupling_distance(c, 1e-8))
    n = float(coupling_distance_naive(c, 1e-8))
    assert n > 100.0  # the regime is nontrivial
    np.testing.assert_allclose(v, n, rtol=2e-3)


def test_named_pairwise_helpers_match_gram_forms():
    """l2_dist/simplex_dist/arm_combs (reference nn_model.py:48-62) agree
    with the Gram-matrix pair sums used in the production loss."""
    import itertools

    from dvae_tpu.models.losses import (arm_combs, coupling_distance, inv_sd,
                                        l2_dist, l2_pair_sum_naive,
                                        simplex_dist)

    assert arm_combs(1) == 1 and arm_combs(2) == 1 and arm_combs(5) == 10

    rng_ = np.random.default_rng(3)
    A, B, C = 4, 16, 6
    c = jax.nn.softmax(jnp.asarray(rng_.normal(size=(A, B, C)),
                                   jnp.float32), axis=-1)
    eps = 1e-8
    logc = jnp.log(c + eps)
    prec = inv_sd(c, eps)
    # per-pair batch-mean of the named form, summed == Gram coupling distance
    total = sum(
        float(jnp.mean(simplex_dist((logc[a], prec[a]), (logc[b], prec[b]))))
        for a, b in itertools.combinations(range(A), 2))
    np.testing.assert_allclose(total, float(coupling_distance(c, eps)),
                               rtol=2e-4)
    # l2_dist batch-means summed over pairs == l2 pair-sum oracle
    total_l2 = sum(float(jnp.mean(l2_dist(c[a], c[b])))
                   for a, b in itertools.combinations(range(A), 2))
    np.testing.assert_allclose(total_l2, float(l2_pair_sum_naive(c)),
                               rtol=1e-5)
