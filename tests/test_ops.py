"""Pallas-kernel oracle tests (interpret mode on CPU; compiled on TPU).

The reference's dominant test idiom is naive-vs-optimized equivalence
(SURVEY.md §4); here every Pallas kernel is checked against the XLA
implementation it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.models.losses import coupling_distance
from dvae_tpu.models.sampling import gumbel_softmax_sample
from dvae_tpu.ops.coupling_pallas import (coupling_distance_pallas,
                                          coupling_gram_pallas)
from dvae_tpu.ops.gumbel_pallas import gumbel_softmax_pallas

rng = np.random.default_rng(5)
EPS = 1e-8


def _probs(A, B, C):
    x = rng.random((A, B, C)).astype(np.float32)
    return jnp.asarray(x / x.sum(-1, keepdims=True))


class TestCouplingPallas:
    def test_gram_matches_xla(self):
        for A, B, C in [(2, 64, 10), (5, 300, 92), (3, 1025, 17)]:
            c = _probs(A, B, C)
            g = np.asarray(coupling_gram_pallas(c, EPS)) / B
            # XLA oracle gram — centered like the kernel (and like
            # losses._pair_sums_from_gram): distances are shift-invariant
            logc = jnp.log(c + EPS)
            var = jnp.var(c, axis=1, keepdims=True, ddof=1)
            prec = logc * jnp.sqrt(1.0 / (var + EPS))
            prec = prec - jnp.mean(prec, axis=(0, 1))
            g_ref = np.asarray(
                jnp.einsum("abc,dbc->ad", prec, prec) / B)
            np.testing.assert_allclose(g, g_ref, rtol=2e-4, atol=1e-5)

    def test_distance_matches_xla(self):
        c = _probs(4, 500, 30)
        ours = float(coupling_distance_pallas(c, EPS))
        ref = float(coupling_distance(c, EPS))
        assert ours == pytest.approx(ref, rel=2e-4)

    def test_gradient_matches_xla(self):
        c = _probs(3, 100, 12)
        g1 = jax.grad(lambda x: coupling_distance_pallas(x, EPS))(c)
        g2 = jax.grad(lambda x: coupling_distance(x, EPS))(c)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4)

    def test_sharp_posteriors_with_dead_categories(self):
        """Production regime (tau=0.005): near-one-hot posteriors with
        categories that are exactly 0 in EVERY arm.  Without centering the
        f32 Gram cancels catastrophically and the fused value collapses to
        ~0 (models/losses.py _pair_sums_from_gram documents the failure)."""
        rng_ = np.random.default_rng(7)
        A, B, C = 3, 400, 24
        live = 16                       # categories 16..23 dead everywhere
        labels = rng_.integers(0, live, (A, B))
        c = np.zeros((A, B, C), np.float32)
        for a in range(A):
            c[a, np.arange(B), labels[a]] = 1.0
        c = jnp.asarray(c)
        ref = float(coupling_distance(c, EPS))
        ours = float(coupling_distance_pallas(c, EPS))
        assert ref > 1.0               # arms genuinely disagree
        assert ours == pytest.approx(ref, rel=5e-3)

    def test_collapsed_arm_constant_category_no_nan(self):
        """An arm collapsed onto one category makes the one-pass variance
        formula go slightly negative in f32; the kernel must clamp instead
        of returning NaN, matching the XLA two-pass variance to ~eps."""
        rng_ = np.random.default_rng(8)
        A, B, C = 2, 5000, 12
        c = jax.nn.softmax(jnp.asarray(
            rng_.normal(size=(A, B, C)), jnp.float32) / 0.05, axis=-1)
        # arm 0 collapses: category 3 gets ~1-1e-7 mass in every row
        col = np.full((B, C), 1e-8, np.float32)
        col[:, 3] = 1.0
        c = c.at[0].set(jnp.asarray(col / col.sum(-1, keepdims=True)))
        ours = float(coupling_distance_pallas(c, EPS))
        ref = float(coupling_distance(c, EPS))
        assert np.isfinite(ours)
        assert ours == pytest.approx(ref, rel=5e-3)


class TestGumbelPallas:
    def test_exact_match_vs_xla_with_same_noise(self):
        """With identical uniform noise the kernel must match the XLA
        formula bit-for-bit (up to float tolerance)."""
        phi = _probs(3, 150, 12)
        u = jnp.asarray(rng.random(phi.shape).astype(np.float32))
        y_pallas = gumbel_softmax_pallas(jnp.int32(0), phi, u, 0.8, EPS, False)
        g = -jnp.log(-jnp.log(u + EPS) + EPS)
        y_ref = jax.nn.softmax((jnp.log(phi + EPS) + g) / 0.8, axis=-1)
        np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_output_is_simplex(self):
        phi = _probs(2, 200, 16)
        y = gumbel_softmax_pallas(jnp.int32(7), phi, None, 1.0, EPS, False)
        y = np.asarray(y)
        np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-5)
        assert (y >= 0).all()

    def test_hard_is_one_hot(self):
        phi = _probs(2, 100, 8)
        y = np.asarray(
            gumbel_softmax_pallas(jnp.int32(3), phi, None, 1.0, EPS, True))
        np.testing.assert_allclose(y.sum(-1), 1.0)
        assert set(np.unique(y)) <= {0.0, 1.0}

    def test_distribution_matches_xla_marginals(self):
        """Different PRNG streams, same distribution: argmax frequencies of
        the Pallas sampler must match the XLA sampler's within tolerance."""
        C = 6
        phi_row = np.asarray([0.4, 0.25, 0.15, 0.1, 0.07, 0.03], np.float32)
        N = 4000
        phi = jnp.asarray(np.tile(phi_row, (N, 1)))
        y_p = np.asarray(gumbel_softmax_pallas(
            jnp.int32(11), phi, None, 0.5, EPS, True))
        y_x = np.asarray(gumbel_softmax_sample(
            jax.random.key(0), phi, 0.5, EPS))
        freq_p = np.bincount(y_p.argmax(-1), minlength=C) / N
        freq_x = np.bincount(y_x.argmax(-1), minlength=C) / N
        np.testing.assert_allclose(freq_p, freq_x, atol=0.04)

    def test_seed_changes_sample(self):
        phi = _probs(1, 50, 8)
        y1 = np.asarray(gumbel_softmax_pallas(jnp.int32(1), phi, None, 1.0,
                                              EPS, False))
        y2 = np.asarray(gumbel_softmax_pallas(jnp.int32(2), phi, None, 1.0,
                                              EPS, False))
        assert not np.allclose(y1, y2)

    def test_gradient_matches_softmax_vjp(self):
        """With the noise fixed, the analytical VJP must equal autodiff of
        softmax((log(phi+eps)+g)/T)."""
        phi = _probs(1, 40, 8)

        def pallas_loss(p):
            y = gumbel_softmax_pallas(jnp.int32(5), p, None, 0.7, EPS, False)
            return jnp.sum(y ** 2)

        g_pallas = jax.grad(pallas_loss)(phi)

        # reconstruct the same noise by running the fwd kernel on a
        # known phi and inverting: instead, check VJP consistency via
        # finite differences on the pallas function itself.
        eps_fd = 1e-3
        d = jnp.zeros_like(phi).at[0, 7, 3].set(1.0)
        f0 = pallas_loss(phi - eps_fd * d)
        f1 = pallas_loss(phi + eps_fd * d)
        fd = (f1 - f0) / (2 * eps_fd)
        assert float(g_pallas[0, 7, 3]) == pytest.approx(float(fd), rel=5e-2)

    @pytest.mark.parametrize("t0", [0.3, 1.0, 3.0])
    def test_temp_gradient_matches_xla(self, t0):
        """The temperature cotangent must equal autodiff of the XLA
        formula — it used to be silently zero (temp-annealing through the
        Pallas path froze).  Non-512-multiple row count exercises the
        padded-row guard in the backward kernel."""
        phi = _probs(1, 700, 12).reshape(700, 12)
        u = jnp.asarray(rng.random(phi.shape).astype(np.float32))

        def xla(p, t):
            g = -jnp.log(-jnp.log(u + EPS) + EPS)
            return jax.nn.softmax((jnp.log(p + EPS) + g) / t, axis=-1)

        def loss(fn):
            return lambda p, t: jnp.sum(fn(p, t) ** 2)

        pl_fn = lambda p, t: gumbel_softmax_pallas(jnp.int32(0), p, u, t)
        gp_x, gt_x = jax.grad(loss(xla), argnums=(0, 1))(
            phi, jnp.float32(t0))
        gp_p, gt_p = jax.grad(loss(pl_fn), argnums=(0, 1))(
            phi, jnp.float32(t0))
        assert float(gt_x) != 0.0
        np.testing.assert_allclose(float(gt_p), float(gt_x), rtol=3e-4)
        np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_x),
                                   rtol=1e-3, atol=1e-6)

    def test_temp_gradient_hard_path_finite(self):
        phi = _probs(1, 60, 8)
        u = jnp.asarray(rng.random(phi.shape).astype(np.float32))
        g = jax.grad(lambda t: jnp.sum(gumbel_softmax_pallas(
            jnp.int32(0), phi, u, t, EPS, True) ** 2))(jnp.float32(1.0))
        assert np.isfinite(float(g))


class TestFusedRecon:
    """ops/recon_pallas.fused_recon_mse vs the materializing XLA oracle,
    and the fused train-loss path vs the unfused one (same idiom as the
    reference's loss_naive/loss_vectorize pair, mmidas/nn_model.py:600-628)."""

    def _data(self, A=3, B=70, F=16, D=40):
        r = np.random.default_rng(3)
        h = jnp.asarray(r.normal(size=(A, B, F)).astype(np.float32))
        w = jnp.asarray(0.1 * r.normal(size=(A, F, D)).astype(np.float32))
        b = jnp.asarray(0.1 * r.normal(size=(A, D)).astype(np.float32))
        x = jnp.asarray(
            np.maximum(r.normal(0.5, 1, (B, D)), 0).astype(np.float32))
        return h, w, b, x

    def test_values_match_oracle(self):
        from dvae_tpu.ops.recon_pallas import (fused_recon_mse,
                                               recon_mse_reference)
        # B=600 exercises the partial edge tile (tile 512 + 88-row edge)
        for B in (70, 600):
            h, w, b, x = self._data(B=B)
            A = h.shape[0]
            xa = jnp.broadcast_to(x, (A,) + x.shape)
            for xt in (x, xa):  # shared and per-arm targets
                for with_mism in (True, False):
                    s, m = fused_recon_mse(h, w, b, xt, 0.1, with_mism)
                    s0, m0 = recon_mse_reference(h, w, b, xa)
                    np.testing.assert_allclose(np.asarray(s),
                                               np.asarray(s0), rtol=1e-5)
                    if with_mism:
                        np.testing.assert_allclose(np.asarray(m),
                                                   np.asarray(m0))

    @pytest.mark.parametrize("B", [70, 600])
    def test_gradients_match_oracle(self, B):
        from dvae_tpu.ops.recon_pallas import (fused_recon_mse,
                                               recon_mse_reference)
        h, w, b, x = self._data(B=B)
        A = h.shape[0]
        xa = jnp.broadcast_to(x, (A,) + x.shape)
        wgt = jnp.arange(1, A + 1, dtype=jnp.float32)

        def f(h, w, b):
            return jnp.sum(fused_recon_mse(h, w, b, x)[0] * wgt)

        def f0(h, w, b):
            return jnp.sum(recon_mse_reference(h, w, b, xa)[0] * wgt)

        g = jax.grad(f, (0, 1, 2))(h, w, b)
        g0 = jax.grad(f0, (0, 1, 2))(h, w, b)
        for a, e in zip(g, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=2e-4, atol=1e-4)

    def test_bce_metric_identity(self):
        """100·mismatch-fraction ≡ the clamped-log BCE on binarized inputs
        (reference mmidas/nn_model.py:39-40,:544-545)."""
        from dvae_tpu.models.losses import bce, binarize
        from dvae_tpu.ops.recon_pallas import recon_mse_reference
        h, w, b, x = self._data(A=2)
        xa = jnp.broadcast_to(x, (2,) + x.shape)
        r = jax.nn.relu(jnp.einsum("abf,afd->abd", h, w) + b[:, None, :])
        _, mism = recon_mse_reference(h, w, b, xa)
        B, D = x.shape
        for a in range(2):
            ref = float(bce(binarize(r[a], 0.1), binarize(x, 0.1)))
            ours = 100.0 * float(mism[a]) / (B * D)
            assert ours == pytest.approx(ref, rel=1e-6)

    def test_fused_train_loss_equals_unfused(self):
        """Full loss_fn value, metrics and parameter gradients agree
        between cfg.fused_recon True/False (both x_shared modes)."""
        from dvae_tpu.config import VAEConfig
        from dvae_tpu.models import mixvae
        from dvae_tpu.train.step import loss_fn

        cfg0 = VAEConfig(n_arm=3, input_dim=120, n_categories=10, fc_dim=24,
                         lowD_dim=6)
        cfg1 = cfg0.replace(fused_recon=True)
        params = mixvae.init_params(jax.random.key(0), cfg0)
        bn = mixvae.init_bn_state(cfg0)
        B = 70
        x = jnp.asarray(np.maximum(
            np.random.default_rng(1).normal(0.5, 1, (B, cfg0.input_dim)),
            0).astype(np.float32))
        xs = jnp.broadcast_to(x, (cfg0.n_arm, B, cfg0.input_dim))
        mask = jnp.ones((cfg0.n_categories,))
        kf = jax.random.key(7)

        for x_shared in (None, x):
            (t0, (aux0, _, _)), g0 = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bn, cfg0, xs, kf, 1.0, mask,
                                       None, None, x_shared)
            (t1, (aux1, _, _)), g1 = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bn, cfg1, xs, kf, 1.0, mask,
                                       None, None, x_shared)
            np.testing.assert_allclose(float(t0), float(t1), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(aux0.loss_rec),
                                       np.asarray(aux1.loss_rec), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(aux0.ll),
                                       np.asarray(aux1.ll), rtol=1e-5)
            assert np.isfinite(np.asarray(aux1.ll)).all()  # fused MSE keeps ll
            assert np.isnan(np.asarray(aux0.rec_nll)).all()  # NLL is ZINB-only
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
                g0, g1)


class TestFusedEncoder:
    """ops/encoder_pallas.fused_dropout_fc1 vs the materializing oracle."""

    def _data(self, A=3, B=600, D=48, F=16):
        r = np.random.default_rng(9)
        x = jnp.asarray(r.normal(size=(B, D)).astype(np.float32))
        w = jnp.asarray(0.1 * r.normal(size=(A, D, F)).astype(np.float32))
        b = jnp.asarray(0.1 * r.normal(size=(A, F)).astype(np.float32))
        return x, w, b

    @pytest.mark.parametrize("B", [70, 600])
    def test_values_and_grads_match_oracle(self, B):
        from dvae_tpu.ops.encoder_pallas import (dropout_fc1_reference,
                                                 dropout_mask_host,
                                                 fused_dropout_fc1)
        x, w, b = self._data(B=B)
        A, D, F = w.shape
        mask = dropout_mask_host(3, (A, B, D), 0.5)
        for xt in (x, jnp.broadcast_to(x, (A, B, D))):
            y = fused_dropout_fc1(jnp.int32(3), xt, w, b, 0.5, mask)
            y0 = dropout_fc1_reference(xt, w, b, 0.5, mask)
            np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                                       rtol=1e-5, atol=1e-5)

            def f(w, b):
                return jnp.sum(jnp.sin(
                    fused_dropout_fc1(jnp.int32(3), xt, w, b, 0.5, mask)))

            def f0(w, b):
                return jnp.sum(jnp.sin(
                    dropout_fc1_reference(xt, w, b, 0.5, mask)))

            g = jax.grad(f, (0, 1))(w, b)
            g0 = jax.grad(f0, (0, 1))(w, b)
            for a, e in zip(g, g0):
                np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                           rtol=2e-4, atol=1e-5)

    def test_fused_encoder_train_loss_equals_plain_with_same_masks(self):
        """With the host-mask hook returning the plain path's exact per-arm
        bernoulli masks, the fully fused loss must equal the plain loss
        bit-for-bit."""
        from dvae_tpu.config import VAEConfig
        from dvae_tpu.models import mixvae
        from dvae_tpu.train.step import loss_fn
        import dvae_tpu.ops.encoder_pallas as ep

        base = VAEConfig(n_arm=3, input_dim=120, n_categories=10, fc_dim=24,
                         lowD_dim=6, x_drop=0.5)
        cfgf = base.replace(fused_recon=True, fused_encoder=True)
        params = mixvae.init_params(jax.random.key(0), base)
        bn = mixvae.init_bn_state(base)
        B = 70
        x = jnp.asarray(np.maximum(
            np.random.default_rng(1).normal(0.5, 1, (B, base.input_dim)),
            0).astype(np.float32))
        xs = jnp.broadcast_to(x, (base.n_arm, B, base.input_dim))
        mk = jnp.ones((base.n_categories,))
        kf = jax.random.key(3)

        # reconstruct the plain path's arm dropout masks (mixvae.apply's
        # key-split structure)
        _, k_rest = jax.random.split(kf)
        arm_keys = jax.random.split(k_rest, base.n_arm * 3).reshape(
            base.n_arm, 3)
        masks = jnp.stack([
            jax.random.bernoulli(arm_keys[a, 0], 0.5, (B, base.input_dim))
            for a in range(base.n_arm)])

        orig = ep.dropout_mask_host
        ep.dropout_mask_host = lambda seed, shape, rate: masks
        try:
            t1 = float(loss_fn(params, bn, cfgf, xs, kf, 1.0, mk,
                               None, None, x)[0])
        finally:
            ep.dropout_mask_host = orig
        t0 = float(loss_fn(params, bn, base, xs, kf, 1.0, mk,
                           None, None, x)[0])
        np.testing.assert_allclose(t0, t1, rtol=1e-5)


class TestFusedZINB:
    """ops/zinb_pallas: the elementary-op lgamma/digamma and the fused
    three-head ZINB kernel vs the materializing jax.lax.lgamma oracle."""

    def test_lgamma_digamma_accuracy(self):
        from dvae_tpu.ops.zinb_pallas import digamma, lgamma
        xs = jnp.asarray((10 ** np.linspace(-6, 6, 3000)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(lgamma(xs)),
                                   np.asarray(jax.lax.lgamma(xs)),
                                   rtol=3e-5, atol=2e-4)
        np.testing.assert_allclose(np.asarray(digamma(xs)),
                                   np.asarray(jax.lax.digamma(xs)),
                                   rtol=2e-4, atol=3e-4)

    def test_lgdg_diff_accuracy_and_totality(self):
        # the difference form the kernels consume: lnГ(r)−lnГ(k+r),
        # ψ(r)−ψ(k+r) (one ratio log instead of two shift-polynomial logs)
        from scipy.special import digamma as sp_dg, gammaln

        from dvae_tpu.ops.zinb_pallas import _div, _lgdg_diff

        r = np.asarray(10 ** np.linspace(-6, 6, 200), np.float32)
        r64 = r.astype(np.float64)
        for k in (0.0, 1.0, 7.0, 1e3, 1e6):
            dlg, ddg = _lgdg_diff(jnp.float32(k), jnp.asarray(r), _div)
            want_lg = gammaln(r64) - gammaln(r64 + k)
            want_dg = sp_dg(r64) - sp_dg(r64 + k)
            # the difference cancels intermediates of size ~lnГ(r+k): an
            # f32 evaluation (either form — the old two-lgamma one
            # identically) carries that magnitude's rounding, so the
            # tolerance scales with it on top of the usual rtol/atol
            big = np.abs(gammaln(r64 + k))
            err = np.abs(np.asarray(dlg, np.float64) - want_lg)
            tol = 3e-4 + 3e-5 * np.abs(want_lg) + 4e-7 * big
            assert (err <= tol).all(), \
                f"k={k}: worst {err.max()} at r={r[np.argmax(err - tol)]}"
            np.testing.assert_allclose(np.asarray(ddg), want_dg,
                                       rtol=2e-4, atol=4e-4, err_msg=f"k={k}")
        # totality at the clamp extremes: huge counts against tiny rates
        # (the q-ratio overflows f32 — must clip, not inf/NaN) and huge
        # rates (P4(r) at _P4_CLAMP — the ratio clips to its true 1)
        for k, rr in ((1e12, 1e-6), (1e12, 1e6), (0.0, 5e9), (1e12, 5e9)):
            dlg, ddg = _lgdg_diff(jnp.float32(k), jnp.float32(rr), _div)
            assert np.isfinite(float(dlg)) and np.isfinite(float(ddg)), \
                (k, rr, float(dlg), float(ddg))

    def _data(self, A=2, B=70, F=16, D=40):
        r = np.random.default_rng(11)
        h = jnp.asarray(r.normal(size=(A, B, F)).astype(np.float32))
        mk = lambda: (
            jnp.asarray(0.1 * r.normal(size=(A, F, D)).astype(np.float32)),
            jnp.asarray(0.1 * r.normal(size=(A, D)).astype(np.float32)))
        x = jnp.asarray((np.maximum(r.normal(0.8, 1, (B, D)), 0)
                         * (r.random((B, D)) > 0.5)).astype(np.float32))
        return h, mk(), mk(), mk(), x

    @pytest.mark.parametrize("B", [70, 600])
    def test_values_and_grads_match_oracle(self, B):
        from dvae_tpu.ops.zinb_pallas import fused_zinb, zinb_heads_reference
        h, (wr, br), (wp, bp), (wz, bz), x = self._data(B=B)
        A = h.shape[0]
        xa = jnp.broadcast_to(x, (A,) + x.shape)
        for xt in (x, xa):
            s = fused_zinb(h, wr, br, wp, bp, wz, bz, xt)
            s0 = zinb_heads_reference(h, wr, br, wp, bp, wz, bz, xa)
            np.testing.assert_allclose(np.asarray(s), np.asarray(s0),
                                       rtol=2e-4)

            def f(*a):
                return jnp.sum(fused_zinb(*a, xt) * jnp.arange(1, A + 1))

            def f0(*a):
                return jnp.sum(zinb_heads_reference(*a, xa)
                               * jnp.arange(1, A + 1))

            g = jax.grad(f, tuple(range(7)))(h, wr, br, wp, bp, wz, bz)
            g0 = jax.grad(f0, tuple(range(7)))(h, wr, br, wp, bp, wz, bz)
            for a, e in zip(g, g0):
                np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                           rtol=5e-3, atol=3e-3)

    def test_fused_zinb_train_loss_equals_unfused(self):
        from dvae_tpu.config import VAEConfig
        from dvae_tpu.models import mixvae
        from dvae_tpu.train.step import loss_fn

        base = VAEConfig(n_arm=3, input_dim=120, n_categories=10, fc_dim=24,
                         lowD_dim=6, x_drop=0.0, mode="ZINB")
        cfgf = base.replace(fused_recon=True)
        params = mixvae.init_params(jax.random.key(0), base)
        bn = mixvae.init_bn_state(base)
        B = 70
        r0 = np.random.default_rng(1)
        x = jnp.asarray((np.maximum(r0.normal(0.5, 1, (B, base.input_dim)),
                                    0)
                         * (r0.random((B, base.input_dim)) > 0.5))
                        .astype(np.float32))
        xs = jnp.broadcast_to(x, (base.n_arm, B, base.input_dim))
        mk = jnp.ones((base.n_categories,))
        kf = jax.random.key(7)
        for x_shared in (None, x):
            (t0, (aux0, _, _)), g0 = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bn, base, xs, kf, 1.0, mk,
                                       None, None, x_shared)
            (t1, (aux1, _, _)), g1 = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bn, cfgf, xs, kf, 1.0, mk,
                                       None, None, x_shared)
            np.testing.assert_allclose(float(t0), float(t1), rtol=1e-4)
            np.testing.assert_allclose(np.asarray(aux0.loss_rec),
                                       np.asarray(aux1.loss_rec), rtol=1e-4)
            # ll/rec_nll contract (LossOutputs field docs): the fused ZINB
            # kernel never materializes x_rec, so its ll is NaN — never a
            # silently different number; rec_nll is the honest NLL in both
            assert np.isnan(np.asarray(aux1.ll)).all()
            assert np.isfinite(np.asarray(aux0.ll)).all()
            np.testing.assert_allclose(np.asarray(aux0.rec_nll),
                                       np.asarray(aux0.loss_rec), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(aux1.rec_nll),
                                       np.asarray(aux1.loss_rec), rtol=1e-6)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=3e-3, atol=2e-3),
                g0, g1)


def test_sharpen_gumbel_fused_tau_matches_xla():
    """ops/gumbel_pallas.sharpen_gumbel_pallas (fused tau-softmax + gumbel)
    vs the two-stage XLA formula with the same injected noise."""
    from dvae_tpu.ops.gumbel_pallas import sharpen_gumbel_pallas

    logits = jnp.asarray(rng.normal(size=(2, 150, 12)).astype(np.float32))
    tau = 0.1
    u = jnp.asarray(rng.random(logits.shape).astype(np.float32))
    y = sharpen_gumbel_pallas(jnp.int32(0), logits, tau, 0.8, EPS, False,)
    # distribution check only for the PRNG path is covered elsewhere; here
    # drive the with-u kernel through the public fused-tau wrapper
    from dvae_tpu.ops.gumbel_pallas import _gumbel_fwd_pallas
    y = _gumbel_fwd_pallas(jnp.int32(0), logits, 0.8, EPS, tau, False, u)
    phi = jax.nn.softmax(logits / tau, axis=-1)
    g = -jnp.log(-jnp.log(u + EPS) + EPS)
    y_ref = jax.nn.softmax((jnp.log(phi + EPS) + g) / 0.8, axis=-1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


class TestFusedFwdBwdConsistency:
    """The fused loss+gradient kernels' unscaled gradients must equal the
    separate backward kernels at cotangent 1 — pins the two implementations
    (the separate ones still serve the partitioned eval paths and act as
    oracles here) against drift."""

    def test_recon_fused_equals_separate_bwd(self):
        from dvae_tpu.ops import recon_pallas as rp

        rng = np.random.default_rng(11)
        A, B, F, D = 2, 70, 8, 24          # deliberate partial edge tile
        h = jnp.asarray(rng.normal(0, 1, (A, B, F)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.3, (A, F, D)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (A, D)), jnp.float32)
        x = jnp.asarray(rng.random((B, D)), jnp.float32)
        (s, m), dh, dw, db = rp._fwdbwd_call(h, w, b, x, 0.1, True)
        s0, m0 = rp._fwd(h, w, b, x, 0.1, True)
        dh0, dw0, db0 = rp._bwd_call(jnp.ones((A,), jnp.float32), h, w, b, x)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(db), np.asarray(db0),
                                   rtol=1e-5, atol=1e-5)

    def test_zinb_fused_equals_separate_bwd(self):
        from dvae_tpu.ops import zinb_pallas as zp

        rng = np.random.default_rng(12)
        A, B, F, D = 2, 50, 6, 16
        h = jnp.asarray(rng.normal(0, 1, (A, B, F)), jnp.float32)
        heads = tuple(
            (jnp.asarray(rng.normal(0, 0.3, (A, F, D)), jnp.float32),
             jnp.asarray(rng.normal(0, 0.1, (A, D)), jnp.float32))
            for _ in range(3))
        k = jnp.asarray(np.expm1(rng.random((B, D)) * 3), jnp.float32)
        loss, dh, g1, g2, g3 = zp._fwdbwd_call(h, heads, k, 1e-6)
        loss0 = zp._fwd(h, heads, k, 1e-6)
        dh0, g10, g20, g30 = zp._bwd_call(jnp.ones((A,), jnp.float32),
                                          h, heads, k, 1e-6)
        np.testing.assert_allclose(np.asarray(loss), np.asarray(loss0),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh0),
                                   rtol=1e-4, atol=1e-4)
        for got, want in zip((g1, g2, g3), (g10, g20, g30)):
            np.testing.assert_allclose(np.asarray(got[0]),
                                       np.asarray(want[0]),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(got[1]),
                                       np.asarray(want[1]),
                                       rtol=1e-4, atol=1e-4)


class TestFusedDecoder:
    """ops/decoder_pallas.fused_decoder_mse (full trunk fc6..fc11 + loss in
    one pass) vs the materializing XLA oracle, and the fused_decoder train
    path vs the fused_recon one."""

    def _data(self, A=3, B=70, Z=10, L=6, F=16, D=40, seed=9):
        r = np.random.default_rng(seed)
        mk = lambda *s: jnp.asarray(0.3 * r.normal(size=s), jnp.float32)
        z = mk(A, B, Z)
        # reference trunk widths: fc6 Z->L, fc7 L->F, fc8..fc10 F->F
        ws = [mk(A, Z, L), mk(A, L, F), mk(A, F, F), mk(A, F, F),
              mk(A, F, F), mk(A, F, D)]
        bs = [mk(A, L), mk(A, F), mk(A, F), mk(A, F), mk(A, F), mk(A, D)]
        x = jnp.asarray(np.maximum(r.normal(0.5, 1, (B, D)), 0), jnp.float32)
        args = [z]
        for w, b in zip(ws, bs):
            args += [w, b]
        return args, x

    @pytest.mark.parametrize("B", [70, 600])  # 600: partial edge tile (256)
    def test_values_match_oracle(self, B):
        from dvae_tpu.ops.decoder_pallas import (decoder_mse_reference,
                                                 fused_decoder_mse)
        args, x = self._data(B=B)
        A = args[0].shape[0]
        xa = jnp.broadcast_to(x, (A,) + x.shape)
        for xt in (x, xa):
            s, m = fused_decoder_mse(*args, xt)
            s0, m0 = decoder_mse_reference(*args, xa)
            np.testing.assert_allclose(np.asarray(s), np.asarray(s0),
                                       rtol=1e-5)
            np.testing.assert_allclose(np.asarray(m), np.asarray(m0))

    @pytest.mark.parametrize("B", [70, 600])
    def test_gradients_match_oracle(self, B):
        from dvae_tpu.ops.decoder_pallas import (decoder_mse_reference,
                                                 fused_decoder_mse)
        args, x = self._data(B=B)
        A = args[0].shape[0]
        xa = jnp.broadcast_to(x, (A,) + x.shape)
        wgt = jnp.arange(1, A + 1, dtype=jnp.float32)

        def f(*a):
            return jnp.sum(fused_decoder_mse(*a, x)[0] * wgt)

        def f0(*a):
            return jnp.sum(decoder_mse_reference(*a, xa)[0] * wgt)

        argnums = tuple(range(13))
        g = jax.grad(f, argnums)(*args)
        g0 = jax.grad(f0, argnums)(*args)
        for i, (a, e) in enumerate(zip(g, g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=3e-4, atol=1e-4,
                                       err_msg=f"arg {i}")

    def test_fused_decoder_train_loss_equals_fused_recon(self):
        """Full loss_fn value, metrics and parameter gradients agree
        between cfg.fused_decoder and the fc11-only fused_recon path —
        the SAME dropout/gumbel draws flow through both (the trunk split
        point does not consume randomness)."""
        from dvae_tpu.config import VAEConfig
        from dvae_tpu.models import mixvae
        from dvae_tpu.train.step import loss_fn

        cfg0 = VAEConfig(n_arm=3, input_dim=120, n_categories=10, fc_dim=24,
                         lowD_dim=6, fused_recon=True)
        cfg1 = cfg0.replace(fused_decoder=True)
        params = mixvae.init_params(jax.random.key(0), cfg0)
        bn = mixvae.init_bn_state(cfg0)
        B = 70
        x = jnp.asarray(np.maximum(
            np.random.default_rng(1).normal(0.5, 1, (B, cfg0.input_dim)),
            0).astype(np.float32))
        xs = jnp.broadcast_to(x, (cfg0.n_arm, B, cfg0.input_dim))
        mask = jnp.ones((cfg0.n_categories,))
        kf = jax.random.key(7)

        for x_shared in (None, x):
            (t0, (aux0, _, _)), g0 = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bn, cfg0, xs, kf, 1.0, mask,
                                       None, None, x_shared)
            (t1, (aux1, _, _)), g1 = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bn, cfg1, xs, kf, 1.0, mask,
                                       None, None, x_shared)
            np.testing.assert_allclose(float(t0), float(t1), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(aux0.loss_rec),
                                       np.asarray(aux1.loss_rec), rtol=1e-5)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-5),
                g0, g1)

    def test_eval_value_path_matches(self):
        """Value-only (no-grad) calls run the forward kernel — same sums."""
        from dvae_tpu.ops.decoder_pallas import (_fwd, _fwdbwd_call,
                                                 fused_decoder_mse)
        args, x = self._data()
        trunk = [(args[1 + 2 * i], args[2 + 2 * i]) for i in range(5)]
        s, m = fused_decoder_mse(*args, x)
        (s2, m2), _, _, _, _ = _fwdbwd_call(args[0], trunk, args[11],
                                            args[12], x, 0.1, True)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2))


class TestZINBLargeCounts:
    """Regression: the shifted-Stirling p4 product overflows f32 at
    x ≳ 4.3e9; clamps keep the kernel total (the production ZINB study
    NaN'ed on a synthetic gene with counts ≈ 5e9 before the fix)."""

    def test_lgamma_finite_and_accurate_past_p4_overflow(self):
        from dvae_tpu.ops.zinb_pallas import digamma, lgamma
        sp = pytest.importorskip("scipy.special")
        xs = np.array([1e9, 4e9, 6e9, 1e10, 1e12], np.float32)
        got = np.asarray(lgamma(jnp.asarray(xs)))
        want = sp.gammaln(xs.astype(np.float64))
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, rtol=1e-6)
        dg = np.asarray(digamma(jnp.asarray(xs)))
        assert np.isfinite(dg).all()
        # at the count-clamp boundary (1e12) the saturated p4 leaves a
        # ~5e-4 relative artifact on the digamma shift ratio — documented
        # in _P4_CLAMP; everywhere real it is exact to f32 rounding
        np.testing.assert_allclose(dg, sp.digamma(xs.astype(np.float64)),
                                   rtol=1e-3)

    def test_fused_zinb_huge_counts_loss_and_grads_finite(self):
        from dvae_tpu.ops.zinb_pallas import fused_zinb, zinb_heads_reference
        r = np.random.default_rng(5)
        A, B, F, D = 2, 16, 8, 24
        h = jnp.asarray(r.normal(size=(A, B, F)).astype(np.float32))
        w = lambda i: jnp.asarray(
            0.1 * r.normal(size=(A, F, D)).astype(np.float32))
        b = jnp.zeros((A, D), jnp.float32)
        x = jnp.full((B, D), 23.0, jnp.float32)  # counts ≈ 9.7e9
        args = (h, w(1), b, w(2), b, w(3), b, x)
        loss = np.asarray(fused_zinb(*args))
        oracle = np.asarray(zinb_heads_reference(*args))
        assert np.isfinite(loss).all()
        np.testing.assert_allclose(loss, oracle, rtol=1e-5)
        grads = jax.grad(lambda *a: fused_zinb(*a).sum(),
                         argnums=tuple(range(7)))(*args)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
