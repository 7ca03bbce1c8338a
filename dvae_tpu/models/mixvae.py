"""Multi-arm coupled mixture VAE — TPU-native core model.

Equivalent capability to the reference ``mixVAE_model``
(mmidas/nn_model.py:89-493), re-designed TPU-first:

  * The reference holds A structurally-identical per-arm modules in
    ``nn.ModuleList``s and loops over arms in python
    (mmidas/nn_model.py:184-206, :329).  Here every per-arm parameter is
    **stacked on a leading A axis** and the whole forward is one
    ``jax.vmap`` over that axis — arms become free, compiler-visible
    parallelism (what the reference was probing toward in dist/vmapping.py
    and dist/conv.ipynb).  The A axis can additionally be sharded across
    devices (see dvae_tpu/parallel).
  * Batch-norm running statistics are explicit state threaded through the
    apply function (``affine=False, momentum=0.01`` — reference
    mmidas/nn_model.py:208-255).
  * Everything is a pure function of (params, state, rng, inputs) and jits.

Architecture per arm (D=input_dim, F=fc_dim, L=lowD_dim, C=n_categories,
S=state_dim), reference mmidas/nn_model.py:184-295:

  encoder:  drop(x) → [Linear(D,F) relu BN] ×1 → [Linear(F,F) relu BN] ×3
            → Linear(F,L) relu BN → x_low
            c_prob = softmax(Linear(L,C)(x_low))
  sharpen:  c = softmax(c_prob / tau)            (mmidas/nn_model.py:337)
  sample:   c_smp = gumbel_softmax(c, temp)      (train) / hard argmax (eval)
  state:    y = concat(x_low, c_smp)             (or prior_c if ref_prior)
            s_mean = Linear(L+C,S)(y); s_var = sigmoid(Linear(L+C,S)(y))
            s_logvar = log(s_var + eps); s ~ reparameterize
  decoder:  z = concat(c_smp, drop(s)) → Linear(C+S,L) relu → Linear(L,F) relu
            → [Linear(F,F) relu] ×3 → Linear(F,D) relu = x_rec
  ZINB:     extra heads sigmoid(Linear(F,D)) ×2 for dropout/zero-inflation
            probabilities (working path in the reference lives at
            build/lib/mmidas/nn_model.py:209-212,378-379).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dvae_tpu.config import VAEConfig
from dvae_tpu.models.sampling import gumbel_softmax, reparameterize


class MixVAEOutputs(NamedTuple):
    """Forward outputs; every array has a leading A (arm) axis.

    Field ↔ reference 10-tuple (mmidas/nn_model.py:297-368):
      x_rec↔recon_x, p_x/r_x (ZINB heads, zeros for MSE), x_low↔x_low,
      c↔qc (tau-sharpened), s_smp↔s, c_smp↔c, s_mean↔mu, s_logvar↔log_var,
      c_prob↔log_qc slot (raw softmax probs).
    """

    x_rec: jax.Array      # (A, B, D)
    p_x: jax.Array        # (A, B, D) ZINB dropout prob (zeros in MSE mode)
    r_x: jax.Array        # (A, B, D) ZINB zero-inflation prob (zeros in MSE mode)
    x_low: jax.Array      # (A, B, L)
    c: jax.Array          # (A, B, C)  tau-sharpened categorical posterior
    s_smp: jax.Array      # (A, B, S)
    c_smp: jax.Array      # (A, B, C)  gumbel/one-hot sample
    s_mean: jax.Array     # (A, B, S)
    s_logvar: jax.Array   # (A, B, S)
    c_prob: jax.Array     # (A, B, C)  pre-sharpening softmax probs


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _init_linear(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    """Torch ``nn.Linear`` default init: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Weights are stored (fan_in, fan_out) so application is ``x @ w + b``
    (row-major batch hits the MXU with the contraction on the last axis).
    """
    bound = 1.0 / (fan_in ** 0.5)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


_ENC_LAYERS = ("fc1", "fc2", "fc3", "fc4", "fc5")
_DEC_LAYERS = ("fc6", "fc7", "fc8", "fc9", "fc10", "fc11")


def _arm_shapes(cfg: VAEConfig):
    D, F, L, C, S = (cfg.input_dim, cfg.fc_dim, cfg.lowD_dim,
                     cfg.n_categories, cfg.state_dim)
    shapes = {
        "fc1": (D, F), "fc2": (F, F), "fc3": (F, F), "fc4": (F, F),
        "fc5": (F, L), "fcc": (L, C),
        "fc_mu": (L + C, S), "fc_sigma": (L + C, S),
        "fc6": (C + S, L), "fc7": (L, F), "fc8": (F, F), "fc9": (F, F),
        "fc10": (F, F), "fc11": (F, D),
    }
    if cfg.mode == "ZINB":
        shapes["fc11_p"] = (F, D)
        shapes["fc11_r"] = (F, D)
    return shapes


def init_params(key: jax.Array, cfg: VAEConfig, dtype=jnp.float32):
    """Stacked-arm parameter pytree: every leaf has leading axis A."""
    shapes = _arm_shapes(cfg)
    names = list(shapes)

    def init_one_arm(arm_key):
        keys = jax.random.split(arm_key, len(names))
        return {n: _init_linear(k, *shapes[n], dtype=dtype)
                for n, k in zip(names, keys)}

    arm_keys = jax.random.split(key, cfg.n_arm)
    return jax.vmap(init_one_arm)(arm_keys)


def init_bn_state(cfg: VAEConfig, dtype=jnp.float32):
    """Running mean/var for the five encoder batch-norms, per arm.

    The reference also instantiates ``batch_s`` (mmidas/nn_model.py:248-255)
    but never applies it in ``forward``; we omit it.
    """
    A, F, L = cfg.n_arm, cfg.fc_dim, cfg.lowD_dim
    dims = {"bn1": F, "bn2": F, "bn3": F, "bn4": F, "bn5": L}
    return {
        name: {"mean": jnp.zeros((A, d), dtype), "var": jnp.ones((A, d), dtype)}
        for name, d in dims.items()
    }


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

def _linear(p, x):
    return x @ p["w"] + p["b"]


def _batch_norm(x, stats, train: bool, momentum: float, eps: float,
                groups: int = 1):
    """BatchNorm1d(affine=False) with torch semantics.

    Train: normalize with the *biased* batch variance; update running var
    with the *unbiased* batch variance (torch BatchNorm behavior).
    Eval: normalize with running statistics.
    Under a batch-sharded mesh the axis-0 reductions here are GLOBAL (the
    partitioner inserts the collectives) — SyncBatchNorm semantics.  The
    reference never syncs BN stats across ranks, but that is an artifact
    of its DDP wrapping; global statistics are the statistically cleaner
    choice and make the loss placement-invariant across sharding
    strategies (tests/test_sharding.py).

    ``groups`` > 1 (cfg.bn_groups, the trainer's ``local_bn_stats`` flag)
    restores the reference's per-rank semantics as ghost batch norm:
    statistics per contiguous row-block of the batch.  With the batch
    row-sharded over G = data×fsdp devices, block g IS shard g's rows, so
    each device normalizes with exactly the statistics the reference's
    rank g would (mmidas/nn_model.py:208-255 under DDP, train.py:141-143)
    — expressed at the global view, so it works under any placement.
    Running stats update with the across-group MEAN of the per-group
    batch statistics (the reference keeps G diverging per-rank copies; a
    single-model state has no such thing — the mean is the aggregation,
    and eval-mode normalization is unaffected in kind).
    """
    if train:
        # statistics in f32 even under bf16 compute: the variance reduction
        # cancels catastrophically in bf16 (torch autocast also runs BN in
        # f32); the normalized output returns to x's dtype
        x32 = x.astype(jnp.float32)
        n = x.shape[0]
        if groups > 1:
            assert n % groups == 0, (
                f"batch {n} not divisible by bn_groups={groups}")
            ng = n // groups
            xg = x32.reshape(groups, ng, x.shape[-1])
            mean_g = jnp.mean(xg, axis=1)   # (G, F)
            var_g = jnp.var(xg, axis=1)     # (G, F)
            y = ((xg - mean_g[:, None, :])
                 * jax.lax.rsqrt(var_g[:, None, :] + eps)
                 ).reshape(x.shape).astype(x.dtype)
            unbiased = var_g * (ng / max(ng - 1, 1))
            new_stats = {
                "mean": ((1 - momentum) * stats["mean"]
                         + momentum * jnp.mean(mean_g, axis=0)),
                "var": ((1 - momentum) * stats["var"]
                        + momentum * jnp.mean(unbiased, axis=0)),
            }
            return y, new_stats
        mean = jnp.mean(x32, axis=0)
        var = jnp.var(x32, axis=0)
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * mean,
            "var": (1 - momentum) * stats["var"] + momentum * unbiased,
        }
        y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
        return y, new_stats
    y = ((x.astype(jnp.float32) - stats["mean"])
         * jax.lax.rsqrt(stats["var"].astype(jnp.float32) + eps)
         ).astype(x.dtype)
    return y, stats


def _dropout(key, x, rate: float, train: bool):
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Single-arm forward (vmapped over the A axis by `apply`)
# ---------------------------------------------------------------------------

def _encoder_rest_arm(p, bn, y1, cfg: VAEConfig, train: bool):
    """Encoder from the fc1 *pre-activation* onward (shared by the plain
    and fused-fc1 paths)."""
    new_bn = {}
    g = cfg.bn_groups
    h, new_bn["bn1"] = _batch_norm(jax.nn.relu(y1), bn["bn1"],
                                   train, cfg.momentum, cfg.eps, g)
    h, new_bn["bn2"] = _batch_norm(jax.nn.relu(_linear(p["fc2"], h)), bn["bn2"],
                                   train, cfg.momentum, cfg.eps, g)
    h, new_bn["bn3"] = _batch_norm(jax.nn.relu(_linear(p["fc3"], h)), bn["bn3"],
                                   train, cfg.momentum, cfg.eps, g)
    h, new_bn["bn4"] = _batch_norm(jax.nn.relu(_linear(p["fc4"], h)), bn["bn4"],
                                   train, cfg.momentum, cfg.eps, g)
    x_low, new_bn["bn5"] = _batch_norm(jax.nn.relu(_linear(p["fc5"], h)), bn["bn5"],
                                       train, cfg.momentum, cfg.eps, g)
    c_prob = jax.nn.softmax(_linear(p["fcc"], x_low), axis=-1)
    return x_low, c_prob, new_bn


def _encoder_arm(p, bn, x, key, cfg: VAEConfig, train: bool):
    """Returns (x_low, c_prob, new_bn).  Reference mmidas/nn_model.py:263-269."""
    h = _dropout(key, x, cfg.x_drop, train)
    return _encoder_rest_arm(p, bn, _linear(p["fc1"], h), cfg, train)


def _decode_hidden_arm(p, c_smp, s, key, cfg: VAEConfig, train: bool):
    """Decoder trunk up to (not including) the output layer fc11."""
    s = _dropout(key, s, cfg.s_drop, train)
    z = jnp.concatenate([c_smp, s], axis=-1)
    h = jax.nn.relu(_linear(p["fc6"], z))
    h = jax.nn.relu(_linear(p["fc7"], h))
    h = jax.nn.relu(_linear(p["fc8"], h))
    h = jax.nn.relu(_linear(p["fc9"], h))
    return jax.nn.relu(_linear(p["fc10"], h))


def _decode_arm(p, c_smp, s, key, cfg: VAEConfig, train: bool):
    """Reference mmidas/nn_model.py:277-295 (`_decode`/`decoder`/`decoder_zinb`)."""
    h = _decode_hidden_arm(p, c_smp, s, key, cfg, train)
    x_rec = jax.nn.relu(_linear(p["fc11"], h))
    if cfg.mode == "ZINB":
        p_x = jax.nn.sigmoid(_linear(p["fc11_p"], h))
        r_x = jax.nn.sigmoid(_linear(p["fc11_r"], h))
    else:
        p_x = jnp.zeros_like(x_rec)
        r_x = jnp.zeros_like(x_rec)
    return x_rec, p_x, r_x


def _state_decode_arm(p, x_low, c_smp, keys, cfg: VAEConfig, train: bool,
                      prior_c: Optional[jax.Array], skip_recon: bool = False,
                      skip_trunk: bool = False):
    """State head + decoder for one arm (post-sampling half of the forward).

    With ``skip_recon`` the decoder stops before fc11 and the *pre-output
    hidden* (B, F) rides in the x_rec slot — the fused recon-loss kernel
    (ops/recon_pallas.fused_recon_mse) consumes it together with the fc11
    weights, so the (B, D) reconstruction never materializes.  With
    ``skip_trunk`` the decoder stops before fc6: the decoder INPUT
    ``z = [c_smp, dropout(s_smp)]`` (B, C+S) rides in the x_rec slot and
    the fused full-decoder kernel (ops/decoder_pallas.fused_decoder_mse)
    runs the whole trunk in VMEM."""
    y_cat = prior_c if (cfg.ref_prior and prior_c is not None) else c_smp
    y = jnp.concatenate([x_low, y_cat], axis=-1)

    if cfg.variational:
        s_mean = _linear(p["fc_mu"], y)
        s_var = jax.nn.sigmoid(_linear(p["fc_sigma"], y))
        s_logvar = jnp.log(s_var + cfg.eps)
        s_smp = reparameterize(keys["reparam"], s_mean, s_logvar,
                               cfg.reparam_noise)
    else:
        s_mean = _linear(p["fc_mu"], y)
        s_logvar = jnp.zeros_like(s_mean)
        s_smp = s_mean

    if skip_trunk:
        s_d = _dropout(keys["drop_s"], s_smp, cfg.s_drop, train)
        z = jnp.concatenate([c_smp, s_d], axis=-1)
        small = jnp.zeros(z.shape[:-1] + (1,), z.dtype)
        return z, small, small, s_smp, s_mean, s_logvar
    if skip_recon:
        h_dec = _decode_hidden_arm(p, c_smp, s_smp, keys["drop_s"], cfg, train)
        small = jnp.zeros(h_dec.shape[:-1] + (1,), h_dec.dtype)
        return h_dec, small, small, s_smp, s_mean, s_logvar
    x_rec, p_x, r_x = _decode_arm(p, c_smp, s_smp, keys["drop_s"], cfg, train)
    return x_rec, p_x, r_x, s_smp, s_mean, s_logvar


def _sample_categorical(key, c, cfg: VAEConfig, temp, train: bool):
    """Gumbel sample on the stacked (A, B, C) posterior — outside the
    per-arm vmap so the fused Pallas kernel sees the whole tensor."""
    if train and cfg.use_pallas:
        from dvae_tpu.ops.gumbel_pallas import gumbel_softmax_pallas
        seed = jax.random.bits(key, dtype=jnp.uint32).astype(jnp.int32)
        return gumbel_softmax_pallas(seed, c, None, temp, cfg.eps, cfg.hard)
    if train:
        return gumbel_softmax(key, c, temp, cfg.eps, hard=cfg.hard)
    # eval path: deterministic hard one-hot (mmidas/nn_model.py:341-343)
    return gumbel_softmax(key, c, temp, cfg.eps, hard=True,
                          gumbel_noise=False)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def apply(params, bn_state, cfg: VAEConfig, xs: jax.Array, key: jax.Array,
          temp: float | jax.Array = 1.0, train: bool = True,
          mask: Optional[jax.Array] = None,
          prior_c: Optional[jax.Array] = None,
          skip_recon: bool = False,
          skip_trunk: bool = False,
          x_shared: Optional[jax.Array] = None,
          spmd_axes: Optional[tuple] = None):
    """Forward pass of all A arms at once (vmapped over the leading axis).

    Args:
      params:   stacked-arm pytree from ``init_params``.
      bn_state: from ``init_bn_state``.
      xs:       (A, B, D) per-arm (independently augmented) input views.
      key:      PRNG key; split internally per arm and per noise source.
      temp:     Gumbel-softmax temperature.
      train:    True → dropout+BN-update+gumbel noise; False → eval semantics.
      mask:     optional (C,) keep-mask for category pruning.
      prior_c:  optional (B, C) reference prior (ref_prior mode).

    Returns:
      (MixVAEOutputs, new_bn_state)
    """
    A = cfg.n_arm
    assert xs.shape[0] == A, f"expected leading arm axis {A}, got {xs.shape}"

    k_gumbel, k_rest = jax.random.split(key)
    # shape-tuple split works for typed key arrays AND legacy uint32 keys
    # (reshape(A, 3) would crash on the latter's trailing (2,) key data)
    arm_keys = jax.random.split(k_rest, (A, 3))

    # --- stage 1: per-arm encoder (vmapped) ---
    if cfg.fused_encoder and train:
        from dvae_tpu.ops.encoder_pallas import (dropout_mask_host,
                                                 fused_dropout_fc1)
        seed = jax.random.bits(jax.random.fold_in(k_gumbel, 1),
                               dtype=jnp.uint32).astype(jnp.int32)
        x_in = xs if x_shared is None else x_shared
        drop_mask = None
        if jax.default_backend() != "tpu":  # interpret mode: host-side mask
            drop_mask = dropout_mask_host(seed, (A,) + xs.shape[1:],
                                          cfg.x_drop)
        if spmd_axes is not None:
            from dvae_tpu.ops.partitioned import make_partitioned_dropout_fc1
            from dvae_tpu.parallel.sharding import constrain
            fc1_op = make_partitioned_dropout_fc1(spmd_axes[0], spmd_axes[1],
                                                  cfg.x_drop)
            y1 = fc1_op(seed, x_in, params["fc1"]["w"], params["fc1"]["b"],
                        drop_mask)
            # pin the kernel output to its declared (arm, batch, ·) layout:
            # downstream fsdp-sharded matmuls otherwise pull it
            # feature-sharded and the custom-call boundary pays a full
            # rematerialization (see parallel/sharding.constrain)
            mesh = spmd_axes[2] if len(spmd_axes) > 2 else None
            y1 = constrain(y1, mesh, spmd_axes[0] or None,
                           spmd_axes[1] or None, None)
        else:
            y1 = fused_dropout_fc1(seed, x_in, params["fc1"]["w"],
                                   params["fc1"]["b"], cfg.x_drop, drop_mask)
        x_low, c_prob, new_bn = jax.vmap(
            lambda p, bn, y: _encoder_rest_arm(p, bn, y, cfg, train))(
            params, bn_state, y1)
    else:
        def enc_arm(p, bn, x, ak):
            return _encoder_arm(p, bn, x, ak[0], cfg, train)

        x_low, c_prob, new_bn = jax.vmap(enc_arm)(params, bn_state, xs,
                                                  arm_keys)

    # --- tau-sharpened categorical posterior + categorical sample on the
    # stacked (A, B, C) tensor (reference mmidas/nn_model.py:332-345).
    # A pruning mask restricts the softmax to surviving categories —
    # identical to the reference's gather/scatter form (:333-335) but with
    # static shapes.
    # f32: the sharpened posterior feeds log/variance terms in the coupling
    # loss whose signal vanishes in bf16 (small probabilities quantize away)
    logits_tau = (c_prob / cfg.tau).astype(jnp.float32)
    if mask is not None:
        logits_tau = jnp.where(mask > 0, logits_tau, -jnp.inf)
    c = jax.nn.softmax(logits_tau, axis=-1)
    c_smp = _sample_categorical(k_gumbel, c, cfg, temp, train)

    # --- stage 2: per-arm state head + decoder (vmapped) ---
    def dec_arm(p, xl, cs, ak):
        keys = {"reparam": ak[1], "drop_s": ak[2]}
        return _state_decode_arm(p, xl, cs, keys, cfg, train, prior_c,
                                 skip_recon, skip_trunk)

    x_rec, p_x, r_x, s_smp, s_mean, s_logvar = jax.vmap(dec_arm)(
        params, x_low, c_smp.astype(x_low.dtype), arm_keys)
    outs = MixVAEOutputs(x_rec, p_x, r_x, x_low, c, s_smp, c_smp,
                         s_mean, s_logvar, c_prob)
    return outs, new_bn


def state_changes(params, bn_state, cfg: VAEConfig, x: jax.Array,
                  d_s: int, key: jax.Array, n_samp: int = 100):
    """Continuous-traversal study: reconstructions as one state dim is
    resampled (reference ``state_changes``, mmidas/nn_model.py:370-411).

    Returns (A, n_samp, B, D) reconstructions and the (A, n_samp, B) sampled
    state values for dimension ``d_s``.
    """
    A = cfg.n_arm
    xs = jnp.broadcast_to(x, (A,) + x.shape)
    outs, _ = apply(params, bn_state, cfg, xs, key, temp=1.0, train=False)

    def one_sample(k):
        # honor cfg.reparam_noise: the bit-faithful UNIFORM flag covers the
        # traversal too (reference resamples via reparameterize's
        # th.rand_like quirk, nn_model.py:427)
        from dvae_tpu.models.sampling import ReparamNoise
        shape = outs.s_mean.shape[:-1]  # (A, B)
        if cfg.reparam_noise == ReparamNoise.UNIFORM:
            e = jax.random.uniform(k, shape)
        else:
            e = jax.random.normal(k, shape)
        std = jnp.sqrt(jnp.exp(outs.s_logvar[..., d_s]))
        s_val = outs.s_mean[..., d_s] + e * std
        s = outs.s_mean.at[..., d_s].set(s_val)

        def dec(p, c_smp, s_a):
            x_rec, _, _ = _decode_arm(p, c_smp, s_a, k, cfg, train=False)
            return x_rec

        recon = jax.vmap(dec)(params, outs.c_smp, s)
        return recon, s_val

    keys = jax.random.split(key, n_samp)
    recon, s_vals = jax.lax.map(one_sample, keys)
    recon = jnp.moveaxis(recon, 0, 1)      # (A, n_samp, B, D)
    s_vals = jnp.moveaxis(s_vals, 0, 1)    # (A, n_samp, B)
    order = jnp.argsort(s_vals, axis=1)
    recon = jnp.take_along_axis(recon, order[..., None], axis=1)
    s_sorted = jnp.take_along_axis(s_vals, order, axis=1)
    return recon, s_sorted
