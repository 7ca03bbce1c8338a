"""Stochastic sampling primitives: Gumbel-softmax and reparameterization.

Pure-XLA implementations; fused Pallas versions live in dvae_tpu/ops and are
oracle-tested against these (the reference keeps naive/vectorized pairs the
same way, e.g. mmidas/nn_model.py:600-628).

Reference semantics:
  * ``sample_gumbel``          — mmidas/nn_model.py:430-441
  * ``gumbel_softmax_sample``  — mmidas/nn_model.py:443-455
  * ``gumbel_softmax``         — mmidas/nn_model.py:457-493 (straight-through
    one-hot at :487-493)
  * ``reparameterize``         — mmidas/nn_model.py:413-428 (note the
    uniform-noise quirk at :427; see config.ReparamNoise)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvae_tpu.config import ReparamNoise


def sample_gumbel(key: jax.Array, shape, eps: float, dtype=jnp.float32) -> jax.Array:
    """-log(-log(U + eps) + eps) with U ~ Uniform[0, 1)."""
    u = jax.random.uniform(key, shape, dtype=dtype)
    return -jnp.log(-jnp.log(u + eps) + eps)


def gumbel_softmax_sample(
    key: jax.Array, phi: jax.Array, temperature: float, eps: float
) -> jax.Array:
    """Softmax((log(phi + eps) + Gumbel noise) / temperature).

    ``phi`` holds category *probabilities* (the reference feeds the
    tau-sharpened softmax output back in, mmidas/nn_model.py:337-345).
    """
    logits = jnp.log(phi + eps) + sample_gumbel(key, phi.shape, eps, phi.dtype)
    return jax.nn.softmax(logits / temperature, axis=-1)


def hard_one_hot_st(y: jax.Array) -> jax.Array:
    """Straight-through hard one-hot: forward = argmax one-hot, backward = identity."""
    idx = jnp.argmax(y, axis=-1)
    y_hard = jax.nn.one_hot(idx, y.shape[-1], dtype=y.dtype)
    return y - jax.lax.stop_gradient(y) + jax.lax.stop_gradient(y_hard)


def gumbel_softmax(
    key: jax.Array,
    phi: jax.Array,
    temperature: float,
    eps: float,
    hard: bool = False,
    gumbel_noise: bool = True,
) -> jax.Array:
    """Gumbel-softmax / ST-Gumbel-softmax sample over the last axis.

    ``gumbel_noise=False, hard=True`` is the eval path (deterministic argmax
    one-hot, reference mmidas/nn_model.py:341-343).
    """
    y = gumbel_softmax_sample(key, phi, temperature, eps) if gumbel_noise else phi
    return hard_one_hot_st(y) if hard else y


def reparameterize(
    key: jax.Array,
    mean: jax.Array,
    logvar: jax.Array,
    noise: ReparamNoise = ReparamNoise.GAUSSIAN,
) -> jax.Array:
    """Sample mean + eps * std with std = sqrt(exp(logvar)).

    ``noise=UNIFORM`` reproduces the reference bit-for-bit behavior class
    (torch.rand_like at mmidas/nn_model.py:427 — U[0,1) noise, not N(0,1)).
    """
    std = jnp.sqrt(jnp.exp(logvar))
    if noise == ReparamNoise.UNIFORM:
        e = jax.random.uniform(key, mean.shape, dtype=mean.dtype)
    else:
        e = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return mean + e * std
