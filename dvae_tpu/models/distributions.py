"""Count likelihoods: NB / ZINB / NB-mixture log-probs and distributions.

Equivalent capability to the reference ``mmidas/utils/distributions.py``
(scvi-tools-style): ``log_zinb_positive`` :15, ``log_nb_positive`` :65,
``log_mixture_nb`` :100, ``NegativeBinomial`` :224,
``ZeroInflatedNegativeBinomial`` :323, ``NegativeBinomialMixture`` :418 —
re-written as pure JAX (lgamma via jax.lax, sampling via gamma-Poisson
mixture with explicit keys).

Parameterization matches the reference: NB with mean ``mu`` and inverse
dispersion ``theta``; ZINB adds zero-inflation logits ``zi_logits``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


def _lgamma(x):
    return jax.lax.lgamma(x)


def log_nb_positive(x: jax.Array, mu: jax.Array, theta: jax.Array,
                    eps: float = 1e-8) -> jax.Array:
    """NB(mu, theta) log-prob (reference distributions.py:65-97)."""
    log_theta_mu_eps = jnp.log(theta + mu + eps)
    return (theta * (jnp.log(theta + eps) - log_theta_mu_eps)
            + x * (jnp.log(mu + eps) - log_theta_mu_eps)
            + _lgamma(x + theta) - _lgamma(theta) - _lgamma(x + 1))


def log_zinb_positive(x: jax.Array, mu: jax.Array, theta: jax.Array,
                      pi: jax.Array, eps: float = 1e-8) -> jax.Array:
    """ZINB log-prob with zero-inflation logits ``pi``
    (reference distributions.py:15-62)."""
    softplus_pi = jax.nn.softplus(-pi)
    log_theta_eps = jnp.log(theta + eps)
    log_theta_mu_eps = jnp.log(theta + mu + eps)
    pi_theta_log = -pi + theta * (log_theta_eps - log_theta_mu_eps)

    case_zero = jax.nn.softplus(pi_theta_log) - softplus_pi
    case_non_zero = (-softplus_pi + pi_theta_log
                     + x * (jnp.log(mu + eps) - log_theta_mu_eps)
                     + _lgamma(x + theta) - _lgamma(theta) - _lgamma(x + 1))
    return jnp.where(x < eps, case_zero, case_non_zero)


def log_mixture_nb(x: jax.Array, mu_1: jax.Array, mu_2: jax.Array,
                   theta_1: jax.Array, theta_2: Optional[jax.Array],
                   pi_logits: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Two-component NB mixture log-prob (reference distributions.py:100-165).

    When ``theta_2`` is None both components share ``theta_1`` (the
    reference's shared-dispersion convention).
    """
    theta_2 = theta_1 if theta_2 is None else theta_2
    lp1 = log_nb_positive(x, mu_1, theta_1, eps)
    lp2 = log_nb_positive(x, mu_2, theta_2, eps)
    log_pi = -jax.nn.softplus(-pi_logits)        # log sigmoid(pi)
    log_1m_pi = -jax.nn.softplus(pi_logits)
    return jnp.logaddexp(lp1 + log_pi, lp2 + log_1m_pi)


# ---------------------------------------------------------------------------
# NB parameterization conversions (reference distributions.py:171-220)
# ---------------------------------------------------------------------------

def _convert_mean_disp_to_counts_logits(mu, theta, eps: float = 1e-6):
    """(mu, theta) → (total_count, logits) NB parameterization
    (reference :171-194)."""
    if (mu is None) != (theta is None):
        raise ValueError(
            "If using the mu/theta NB parameterization, both parameters "
            "must be specified")
    logits = jnp.log(mu + eps) - jnp.log(theta + eps)
    return theta, logits


def _convert_counts_logits_to_mean_disp(total_count, logits):
    """(total_count, logits) → (mu, theta) NB parameterization
    (reference :197-213)."""
    theta = total_count
    mu = jnp.exp(logits) * theta
    return mu, theta


@dataclass(frozen=True)
class Gamma:
    """Gamma(concentration, rate) — the latent mixing distribution of the
    NB's gamma-Poisson representation (reference ``_gamma`` :216-221,
    torch.distributions.Gamma; rate = 1/scale)."""

    concentration: jax.Array
    rate: jax.Array

    @property
    def mean(self):
        return self.concentration / self.rate

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            jnp.shape(self.concentration), jnp.shape(self.rate))
        return jax.random.gamma(key, self.concentration, shape) / self.rate

    def log_prob(self, x):
        c, r = self.concentration, self.rate
        # xlogy keeps the exponential case (c == 1) finite at x == 0
        return (c * jnp.log(r) + jax.scipy.special.xlogy(c - 1, x)
                - r * x - _lgamma(c))


def _gamma(theta, mu) -> Gamma:
    """The NB(mu, theta) mixing Gamma (reference :216-221)."""
    return Gamma(concentration=theta, rate=theta / mu)


# ---------------------------------------------------------------------------
# Distribution objects (sample / mean / variance / log_prob)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class NegativeBinomial:
    """NB(mu, theta) — gamma-Poisson mixture (reference :224-320)."""

    mu: jax.Array
    theta: jax.Array
    eps: float = 1e-8

    @property
    def mean(self):
        return self.mu

    @property
    def variance(self):
        return self.mu + self.mu ** 2 / self.theta

    def log_prob(self, x):
        return log_nb_positive(x, self.mu, self.theta, self.eps)

    def sample(self, key, sample_shape=()):
        kg, kp = jax.random.split(key)
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            jnp.shape(self.mu), jnp.shape(self.theta))
        # Gamma(theta, scale=mu/theta) → Poisson
        gamma = (jax.random.gamma(kg, self.theta, shape)
                 * (self.mu / self.theta))
        return jax.random.poisson(kp, gamma).astype(jnp.float32)


@dataclass(frozen=True)
class ZeroInflatedNegativeBinomial:
    """ZINB(mu, theta, zi_logits) (reference :323-415)."""

    mu: jax.Array
    theta: jax.Array
    zi_logits: jax.Array
    eps: float = 1e-8

    @property
    def zi_probs(self):
        return jax.nn.sigmoid(self.zi_logits)

    @property
    def mean(self):
        return (1 - self.zi_probs) * self.mu

    @property
    def variance(self):
        p = self.zi_probs
        nb_var = self.mu + self.mu ** 2 / self.theta
        return (1 - p) * (nb_var + p * self.mu ** 2)

    def log_prob(self, x):
        return log_zinb_positive(x, self.mu, self.theta, self.zi_logits,
                                 self.eps)

    def sample(self, key, sample_shape=()):
        knb, kz = jax.random.split(key)
        nb = NegativeBinomial(self.mu, self.theta).sample(knb, sample_shape)
        dropout = jax.random.bernoulli(kz, self.zi_probs, nb.shape)
        return jnp.where(dropout, 0.0, nb)


@dataclass(frozen=True)
class NegativeBinomialMixture:
    """Two-component NB mixture (reference :418-518)."""

    mu1: jax.Array
    mu2: jax.Array
    theta1: jax.Array
    mixture_logits: jax.Array
    theta2: Optional[jax.Array] = None
    eps: float = 1e-8

    @property
    def mixture_probs(self):
        return jax.nn.sigmoid(self.mixture_logits)

    @property
    def mean(self):
        p = self.mixture_probs
        return p * self.mu1 + (1 - p) * self.mu2

    def log_prob(self, x):
        return log_mixture_nb(x, self.mu1, self.mu2, self.theta1,
                              self.theta2, self.mixture_logits, self.eps)

    def sample(self, key, sample_shape=()):
        km, k1 = jax.random.split(key)
        comp1 = jax.random.bernoulli(km, self.mixture_probs)
        mu = jnp.where(comp1, self.mu1, self.mu2)
        theta = (self.theta1 if self.theta2 is None
                 else jnp.where(comp1, self.theta1, self.theta2))
        return NegativeBinomial(mu, theta).sample(k1, sample_shape)
