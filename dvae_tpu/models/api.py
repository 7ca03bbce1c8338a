"""Typed functional inference API — the reference's next-generation surface.

Equivalent capability to ``mmidas/model.py`` (the author's WIP typed
refactor): ``generate`` :77-149 (batched inference dict), ``load_vae``
:176-181, ``mk_run``/``mk_config``/``get_weights``/``load_weights``
:199-239 (checkpoint discovery by glob + max epoch), ``VAE`` :242-294
(clean single-arm reference implementation).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.config import TrainConfig, VAEConfig
from dvae_tpu.models import mixvae
from dvae_tpu.models.losses import mixvae_loss
from dvae_tpu.utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                       parse_epoch)


def mk_config(**kw) -> VAEConfig:
    """Config constructor (reference mk_config, model.py:199-210)."""
    return VAEConfig(**kw)


def is_normalized(xs, atol: float = 1e-6):
    """Whether each last-axis slice sums to 1 (reference ``is_normalized``,
    model.py:48-55 — exact ``== 1`` there; a float tolerance here because
    softmax outputs are never bit-exactly 1)."""
    xs = jnp.asarray(xs)
    return jnp.abs(jnp.sum(xs, axis=-1) - 1.0) <= atol


def clr(prob):
    """Centered log-ratio transform of a probability simplex over the last
    axis: ``log(p) - mean(log(p))`` (reference ``clr``, model.py:57-58 — a
    TODO stub that only asserts its input is a normalized simplex; the
    transform it names is implemented here).  Inputs are validated the same
    way the stub did."""
    prob = jnp.asarray(prob)
    if not bool(jnp.all((prob >= 0) & (prob <= 1))) or not bool(
            jnp.all(is_normalized(prob))):
        raise ValueError("clr expects rows on the probability simplex")
    logp = jnp.log(prob)
    return logp - jnp.mean(logp, axis=-1, keepdims=True)


def mk_run(folder: str) -> dict:
    """Discover a run directory's latest checkpoint + metadata
    (reference mk_run/get_weights, model.py:211-229)."""
    ckpt = latest_checkpoint(folder)
    return {"folder": folder, "checkpoint": ckpt,
            "epoch": parse_epoch(ckpt) if ckpt else -1}


def get_weights(folder: str):
    """Latest checkpoint's parameter pytree (reference get_weights)."""
    ckpt = latest_checkpoint(folder)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint under {folder}")
    return load_weights(ckpt)


def load_weights(path: str):
    """(params, bn, mask, metadata) from a checkpoint file."""
    tree, meta = load_checkpoint(path)
    as_jnp = jax.tree_util.tree_map(jnp.asarray, tree)
    return as_jnp["params"], as_jnp["bn"], as_jnp.get("mask"), meta


def load_vae(path: str, cfg: Optional[VAEConfig] = None):
    """Rehydrate (cfg, params, bn, mask) from a checkpoint
    (reference load_vae, model.py:176-181)."""
    params, bn, mask, meta = load_weights(path)
    if cfg is None:
        cfg_dict = dict(meta.get("cfg", {}))
        if not cfg_dict:
            raise ValueError(f"{path} stores no config; pass cfg=")
        known = {f.name for f in
                 __import__("dataclasses").fields(VAEConfig)}
        cfg = VAEConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    if mask is None:
        mask = jnp.ones((cfg.n_categories,), jnp.float32)
    return cfg, params, bn, mask


import functools


@functools.lru_cache(maxsize=32)
def _generate_fwd(cfg: VAEConfig, temp: float):
    """Jitted inference forward, cached per (cfg, temp) — a fresh closure
    per generate() call would recompile every time (30-60 s through this
    container's remote TPU compiler)."""

    @jax.jit
    def fwd(params, bn, xs, key, mask, prior_c):
        outs, _ = mixvae.apply(params, bn, cfg, xs, key, temp=temp,
                               train=False, mask=mask, prior_c=prior_c)
        aux = mixvae_loss(cfg, outs, xs, prior_c=prior_c)
        return outs, aux

    return fwd


def generate(cfg: VAEConfig, params, bn, x: np.ndarray,
             mask: Optional[jax.Array] = None,
             key: Optional[jax.Array] = None,
             temp: float = 1.0, batch_size: int = 5000,
             c_p: Optional[np.ndarray] = None,
             pad_final: bool = True) -> dict:
    """Batched inference dict (reference ``generate``, model.py:77-149).

    Returns numpy arrays keyed like the reference: 'recon' (A,N,D),
    'c_prob' (A,N,C), 'c_smp', 'state' (A,N,S), 'state_mu', 'state_logvar',
    'x_low', 'pred_label' (A,N), 'loss_rec' (A,).

    ``c_p``: optional (N, C) reference prior — REQUIRED for checkpoints
    trained with ``cfg.ref_prior`` (the state head consumed the prior at
    train time; without it the forward silently substitutes ``c_smp`` and
    every state-dependent output is off-distribution).

    ``pad_final``: a partial last batch is padded by repeating its own rows
    up to ``batch_size`` so every dispatch has one jitted shape (a fresh
    shape costs a 30-60 s compile through this container's remote TPU
    compiler); array outputs are trimmed exactly, and only the (A,) summary
    'loss_rec' of that one batch averages over the repeated rows.  Pass
    ``False`` for the reference's exact ragged-tail evaluation (one extra
    compile per distinct remainder shape).
    """
    key = jax.random.key(0) if key is None else key
    if mask is None:
        mask = jnp.ones((cfg.n_categories,), jnp.float32)
    if cfg.ref_prior and c_p is None:
        raise ValueError(
            "cfg.ref_prior is set: pass c_p= (the (N, C) prior the state "
            "head was trained on)")
    fwd = _generate_fwd(cfg, float(temp))

    xj = jnp.asarray(x, jnp.float32)
    prior_all = None if c_p is None else jnp.asarray(c_p, jnp.float32)
    n = xj.shape[0]
    acc = {k: [] for k in ("recon", "c_prob", "c_smp", "state", "state_mu",
                           "state_logvar", "x_low", "pred_label")}
    recs, sizes = [], []

    def tile_pad(a, rows):
        reps = -(-rows // a.shape[0])  # repeat the batch's own rows
        return jnp.concatenate([a] * (reps + 1))[: a.shape[0] + rows]

    for i in range(0, n, batch_size):
        key, k = jax.random.split(key)
        xb = xj[i: i + batch_size]
        pb = None if prior_all is None else prior_all[i: i + batch_size]
        nb = xb.shape[0]
        if pad_final and nb < batch_size:
            xb = tile_pad(xb, batch_size - nb)
            if pb is not None:
                pb = tile_pad(pb, batch_size - nb)
        xs = jnp.broadcast_to(xb, (cfg.n_arm,) + xb.shape)
        outs, aux = fwd(params, bn, xs, k, mask, pb)
        acc["recon"].append(np.asarray(outs.x_rec)[:, :nb])
        acc["c_prob"].append(np.asarray(outs.c)[:, :nb])
        acc["c_smp"].append(np.asarray(outs.c_smp)[:, :nb])
        acc["state"].append(np.asarray(outs.s_smp)[:, :nb])
        acc["state_mu"].append(np.asarray(outs.s_mean)[:, :nb])
        acc["state_logvar"].append(np.asarray(outs.s_logvar)[:, :nb])
        acc["x_low"].append(np.asarray(outs.x_low)[:, :nb])
        acc["pred_label"].append(np.asarray(jnp.argmax(outs.c, -1))[:, :nb])
        recs.append(np.asarray(aux.loss_rec))
        sizes.append(nb)
    out = {k: np.concatenate(v, axis=1) for k, v in acc.items()}
    out["loss_rec"] = np.average(recs, axis=0, weights=sizes)
    return out


def single_vae_apply(cfg: VAEConfig, params_one_arm, bn_one_arm, x,
                     key, train: bool = False):
    """Clean single-arm VAE forward (reference ``VAE``, model.py:242-294):
    index one arm out of the stacked pytree and run it alone."""
    params = jax.tree_util.tree_map(lambda p: p[None], params_one_arm)
    bn = jax.tree_util.tree_map(lambda s: s[None], bn_one_arm)
    cfg1 = cfg.replace(n_arm=1)
    xs = x[None]
    outs, new_bn = mixvae.apply(params, bn, cfg1, xs, key, train=train)
    squeeze = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
    return mixvae.MixVAEOutputs(*[o[0] for o in outs]), squeeze(new_bn)


def view_weights(folder: str) -> dict:
    """Shape/dtype summary of a run's latest checkpoint parameters
    (reference ``view_weights``, model.py:231-234 — which returns the raw
    state dict; here a {path: (shape, dtype)} map plus the pytree, which is
    what the helper is actually used for: eyeballing what was saved)."""
    params, _, _, meta = get_weights(folder)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    summary = {jax.tree_util.keystr(k): (tuple(v.shape), str(v.dtype))
               for k, v in flat}
    return {"summary": summary, "params": params, "metadata": meta}


def sample_normal(key=None) -> float:
    """One standard-normal draw via Box–Muller (reference ``sample_normal``,
    model.py:28-29 — its pure-python RNG backend).  Keyed here instead of
    global-state ``random.random()``."""
    import math
    import random as _random

    if key is not None:
        u1, u2 = jax.random.uniform(key, (2,))
        # uniform samples [0, 1); Box-Muller needs u1 in (0, 1]
        return float(math.sqrt(-2 * math.log(1.0 - float(u1)))
                     * math.cos(2 * math.pi * float(u2)))
    return (math.sqrt(-2 * math.log(_random.random()))
            * math.cos(2 * math.pi * _random.random()))


def reparam(mean, logvar, key):
    """Gaussian reparameterization draw (reference ``reparam``,
    model.py:60-61): ``mean + N(0,1)·exp(logvar/2)``."""
    mean = jnp.asarray(mean)
    return mean + jax.random.normal(key, mean.shape) * jnp.exp(0.5 * jnp.asarray(logvar))
