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
            # XLA oracle gram
            logc = jnp.log(c + EPS)
            var = jnp.var(c, axis=1, keepdims=True, ddof=1)
            prec = logc * jnp.sqrt(1.0 / (var + EPS))
            g_ref = np.asarray(
                jnp.einsum("abc,dbc->ad", prec, prec) / B)
            np.testing.assert_allclose(g, g_ref, rtol=2e-4)

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
