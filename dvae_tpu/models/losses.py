"""Loss functions of the coupled mixVAE, fully vectorized over arms.

Reference semantics: ``mixVAE_model.loss`` (mmidas/nn_model.py:495-598) plus
its helper functions (:39-87).  The reference computes the O(A²) coupling
terms in a python double loop over arm pairs; here the pairwise sums are
computed from a single (A, A) Gram matrix — one MXU matmul instead of A²
elementwise passes, with no (A, A, B, C) intermediate.  Naive loop versions
are kept for oracle testing, mirroring the reference's own
naive/vectorized idiom (mmidas/nn_model.py:600-628, tests/test_utils.py).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dvae_tpu.config import VAEConfig
from dvae_tpu.models.mixvae import MixVAEOutputs
from dvae_tpu.models.sampling import hard_one_hot_st

_LOG_CLAMP = -100.0  # torch.nn.functional.binary_cross_entropy clamps log at -100


class LossOutputs(NamedTuple):
    """Mirrors the reference 9-tuple (mmidas/nn_model.py:588-598)."""

    total: jax.Array        # scalar — total training loss
    loss_rec: jax.Array     # (A,) per-arm reconstruction loss
    loss_joint: jax.Array   # scalar — coupling loss (incl. constants)
    neg_entropy: jax.Array  # scalar — mean negative joint entropy per pair
    c_dist: jax.Array       # scalar — mean simplex distance per pair
    c_l2_dist: jax.Array    # scalar — mean L2 distance between c samples
    kl: jax.Array           # (A,) per-arm state KL divergence
    ll: jax.Array           # (A,) per-arm Gaussian log-likelihood proxy:
                            # mean((x_rec−x)²) + B·log 2π (reference
                            # build/lib nn_model.py:372, both modes).  NaN
                            # under the fused ZINB kernel, which never
                            # materializes x_rec (the point of the fusion —
                            # the MSE diagnostic would cost the (A,B,D) HBM
                            # round trip it eliminates); read ``rec_nll``
                            # there.  NaN, not a silently different number:
                            # a fused-ZINB run must not be ll-compared to
                            # any other run by accident (the training loss
                            # is unaffected either way).
    rec_nll: jax.Array      # (A,) per-arm reconstruction NLL in ZINB mode
                            # (== loss_rec; fused and unfused agree); NaN in
                            # MSE mode.  The honestly-named replacement for
                            # what fused-ZINB previously reported as ll.


# ---------------------------------------------------------------------------
# Pieces
# ---------------------------------------------------------------------------

def binarize(x: jax.Array, thr: float) -> jax.Array:
    """where(x > thr, 1, 0) — reference mmidas/nn_model.py:39-40."""
    return jnp.where(x > thr, 1.0, 0.0).astype(x.dtype)


_P_TINY = 1e-37  # smallest guard that stays a NORMAL f32 (subnormal guards
                 # flush to zero and re-create the inf-gradient at p=0)


def _safe_log(p: jax.Array) -> jax.Array:
    """log(p) clamped to -100 (torch BCE semantics) with finite gradients.

    ``clip(log(p), -100)`` has a 0·inf = nan gradient at p=0; this form
    routes p < 1e-37 through a constant branch (gradient 0 there, matching
    torch's clamped backward).  Matters for the ref-prior coupling term,
    where p is a hard one-hot.
    """
    return jnp.where(p >= _P_TINY,
                     jnp.maximum(jnp.log(jnp.maximum(p, _P_TINY)), _LOG_CLAMP),
                     _LOG_CLAMP)


def bce(p: jax.Array, t: jax.Array) -> jax.Array:
    """Elementwise-mean binary cross entropy with torch's -100 log clamp."""
    return -jnp.mean(t * _safe_log(p) + (1.0 - t) * _safe_log(1.0 - p))


def kl_gaussian(mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """-0.5 * mean_B(1 + logvar - mu² - exp(logvar)) summed over state dims.

    Reference ``kl`` (mmidas/nn_model.py:43-44): mean over the batch axis,
    sum over the state axis.
    """
    return jnp.sum(-0.5 * jnp.mean(1 + logvar - mean**2 - jnp.exp(logvar), axis=0))


def recon_loss_mse(x_rec: jax.Array, x: jax.Array, thr: float = 0.1) -> jax.Array:
    """0.5·sumMSE/B + 0.5·BCE(binarize(x_rec), binarize(x)).

    Reference mmidas/nn_model.py:542-546.  The binarized-BCE term carries
    **zero gradient** in the reference too — ``binarize`` is a hard ``where``
    through which autograd produces no gradient — so it is a value-only
    regularization metric; we make that explicit with ``stop_gradient``.
    """
    B = x.shape[0]
    mse = 0.5 * jnp.sum((x_rec - x) ** 2) / B
    bce_term = 0.5 * bce(binarize(x_rec, thr), binarize(x, thr))
    return mse + jax.lax.stop_gradient(bce_term)


def zinb_loss(x_rec: jax.Array, x_p: jax.Array, x_r: jax.Array, x: jax.Array,
              eps: float = 1e-6) -> jax.Array:
    """Zero-inflated negative-binomial reconstruction loss.

    Same math as the reference ``zinb_loss`` (mmidas/nn_model.py:642-676):
    inputs are log1p expression values, converted back to counts; r/p/z are
    the NB rate, success probability and zero-inflation probability heads.
    """
    k = jnp.exp(x) - 1.0
    r = x_rec + eps
    p = (1 - eps) * (x_p + eps)
    z = (1 - eps) * (x_r + eps)

    nonzero = (x > 0).astype(x.dtype)
    loss_zero = (nonzero - 1.0) * jnp.log(z + (1.0 - z) * (1.0 - p) ** r)
    loss_nonzero = nonzero * (
        -jax.lax.lgamma(k + r) + jax.lax.lgamma(r)
        - k * jnp.log(p) - r * jnp.log(1.0 - p) - jnp.log(1.0 - z)
    )
    return jnp.mean(loss_zero + loss_nonzero)


def inv_sd(c: jax.Array, eps: float) -> jax.Array:
    """sqrt(1 / (var_B(c) + eps)) with *unbiased* batch variance.

    Reference ``inv_var`` (mmidas/nn_model.py:75-82); torch ``Tensor.var``
    defaults to the unbiased (N-1) estimator.
    Accepts (B, C) → (1, C) or (A, B, C) → (A, 1, C).
    """
    axis = c.ndim - 2
    var = jnp.var(c, axis=axis, keepdims=True, ddof=1)
    return jnp.sqrt(1.0 / (var + eps))


def neg_entropy(c: jax.Array, logc: jax.Array) -> jax.Array:
    """mean_B sum_C c·log c — reference ``neg_entropy`` (mmidas/nn_model.py:65-66)."""
    return jnp.mean(jnp.sum(c * logc, axis=-1), axis=-1)


def arm_combs(A: int) -> float:
    """Number of unordered arm pairs, min 1 (reference nn_model.py:48-50)."""
    return max(A * (A - 1) / 2, 1)


def l2_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared L2 distance along the last axis (reference nn_model.py:53-54)."""
    return jnp.sum((a - b) ** 2, axis=-1)


def simplex_dist(a, b) -> jax.Array:
    """Precision-scaled simplex distance between two arms' categorical
    posteriors (reference nn_model.py:57-62): each argument is a
    ``(log c, inv_sd)`` pair; the distance is ``l2_dist`` of the products.
    ``coupling_distance`` computes the same quantity for all pairs at once
    via the Gram matrix — this is the named per-pair form."""
    loga, inv_vara = a
    logb, inv_varb = b
    return l2_dist(loga * inv_vara, logb * inv_varb)


def _pair_sums_from_gram(v: jax.Array) -> jax.Array:
    """Σ_{a<b} mean_B ‖v_a − v_b‖² for v of shape (A, B, C), via one Gram matmul.

    mean_B ‖v_a − v_b‖² = G_aa + G_bb − 2·G_ab with
    G = einsum('abc,dbc->ad', v, v) / B, so the pair sum collapses to
    A·tr(G) − sum(G).

    The differences are invariant to subtracting any constant (C,) vector
    from every arm, so v is centered first: with sharp posteriors, dead
    categories carry identical huge constants (log(eps)·inv_sd ≈ −1.8e5)
    in every arm, and the uncentered f32 Gram entries (~1e15) cancel
    catastrophically in A·tr − Σ — the pair sum silently collapses to 0.
    """
    v = v - jnp.mean(v, axis=(0, 1))
    B = v.shape[1]
    g = jnp.einsum("abc,dbc->ad", v, v,
                   preferred_element_type=jnp.float32) / B
    A = v.shape[0]
    tr = jnp.trace(g)
    return A * tr - jnp.sum(g)


def coupling_distance(c: jax.Array, eps: float) -> jax.Array:
    """Σ over arm pairs of the mean simplex distance (Gram-matrix form).

    Equivalent to the reference's ``simplex_dist`` accumulation
    (mmidas/nn_model.py:558-569) and its ``loss_vectorize`` (:617-628)
    up to the pair *sum* (the reference returns the pair mean there).
    """
    logc = jnp.log(c + eps)
    prec = logc * inv_sd(c, eps)
    return _pair_sums_from_gram(prec)


def coupling_distance_naive(c: jax.Array, eps: float) -> jax.Array:
    """Loop-over-pairs oracle for ``coupling_distance``."""
    A = c.shape[0]
    total = 0.0
    for a in range(A):
        pa = jnp.log(c[a] + eps) * inv_sd(c[a], eps)
        for b in range(a + 1, A):
            pb = jnp.log(c[b] + eps) * inv_sd(c[b], eps)
            total = total + jnp.mean(jnp.sum((pa - pb) ** 2, axis=-1))
    return total


def l2_pair_sum_naive(v: jax.Array) -> jax.Array:
    A = v.shape[0]
    total = 0.0
    for a in range(A):
        for b in range(a + 1, A):
            total = total + jnp.mean(jnp.sum((v[a] - v[b]) ** 2, axis=-1))
    return total


def mixvae_loss_naive(cfg: VAEConfig, outs, xs: jax.Array) -> jax.Array:
    """Full-total-loss oracle with explicit python pair loops — the direct
    transcription of the reference accumulation (mmidas/nn_model.py:539-587):
    per-arm (A−1)·(rec+β·KL), per-pair λ·d_simplex − H_a − H_b, plus the
    additive constants.  Tested equal to ``mixvae_loss(...).total``."""
    A, C = cfg.n_arm, cfg.n_categories
    eps = cfg.eps
    total = 0.0
    for a in range(A):
        if cfg.mode == "ZINB":
            rec = zinb_loss(outs.x_rec[a], outs.p_x[a], outs.r_x[a], xs[a])
        else:
            rec = recon_loss_mse(outs.x_rec[a], xs[a])
        kl_a = kl_gaussian(outs.s_mean[a], outs.s_logvar[a]) \
            if cfg.variational else 0.0
        total = total + max(A - 1, 1) * (rec + cfg.beta * kl_a)
    for a in range(A):
        ca = outs.c[a]
        pa = jnp.log(ca + eps) * inv_sd(ca, eps)
        ha = neg_entropy(ca, jnp.log(ca + eps))
        for b in range(a + 1, A):
            cb = outs.c[b]
            pb = jnp.log(cb + eps) * inv_sd(cb, eps)
            hb = neg_entropy(cb, jnp.log(cb + eps))
            d = jnp.mean(jnp.sum((pa - pb) ** 2, axis=-1))
            total = total + cfg.lam * d + ha + hb
    n_pairs = max(A * (A - 1) // 2, 1)
    total = total + n_pairs * ((C / 2) * math.log(2 * math.pi)
                               - 0.5 * math.log(2 * cfg.lam))
    return total


# ---------------------------------------------------------------------------
# Full loss
# ---------------------------------------------------------------------------

def mixvae_loss(cfg: VAEConfig, outs: MixVAEOutputs, xs: jax.Array,
                prior_c: Optional[jax.Array] = None,
                fused_recon_args: Optional[tuple] = None,
                spmd_axes: Optional[tuple] = None,
                fused_trunk: bool = False) -> LossOutputs:
    """Total cpl-mixVAE loss (reference mmidas/nn_model.py:495-598).

      total = max(A−1, 1)·Σ_a (rec_a + β·KL_a)
            + λ·Σ_{pairs} d_simplex + Σ_{pairs} (−H_a − H_b)
            + n_pairs·((C/2)·log 2π − ½·log 2λ)

    All per-arm terms are computed vectorized over the leading A axis;
    pair sums come from (A, A) Gram matrices (one MXU matmul each).

    With ``ref_prior`` each arm additionally couples to the fixed prior
    (extra entropy / L2 / λ_pc·BCE terms, reference :571-576 — note the
    reference's current-generation loss asserts this path off at :578; the
    working semantics are preserved from the pre-refactor generation).
    The prior BCE rides inside the distance sum, so its effective weight
    is λ·λ_pc — exactly as in the reference, which appends
    ``lam_pc * BCE`` to ``c_dists`` before the ``self.lam`` multiply
    (nn_model.py:576-580; build/lib/.../nn_model.py:418,424).

    ``fused_recon_args = (params, x_target)`` switches the reconstruction
    terms to the fused Pallas kernel (cfg.fused_recon path): ``outs.x_rec``
    then holds the decoder pre-output hidden (A, B, F) and ``x_target`` is
    (B, D) or (A, B, D) — the reconstruction never touches HBM.  With
    ``fused_trunk`` (cfg.fused_decoder) ``outs.x_rec`` instead holds the
    decoder input z (A, B, C+S) and the full fc6..fc11 chain runs inside
    the kernel (ops/decoder_pallas.py).
    """
    A, C = cfg.n_arm, cfg.n_categories
    B = xs.shape[1]
    eps = cfg.eps
    D = xs.shape[-1]

    def _pin(h):
        # pin the kernel's hidden input to (arm, batch, ·): see
        # parallel/sharding.constrain (avoids involuntary remat at the
        # custom-call boundary when propagation prefers feature sharding)
        if spmd_axes is None or len(spmd_axes) < 3 or spmd_axes[2] is None:
            return h
        from dvae_tpu.parallel.sharding import constrain
        return constrain(h, spmd_axes[2], spmd_axes[0] or None,
                         spmd_axes[1] or None, None)

    # --- per-arm reconstruction + KL (vmapped) ---
    if fused_recon_args is not None and cfg.mode == "ZINB":
        # fused three-head ZINB kernel (ops/zinb_pallas.py); outs.x_rec
        # holds the decoder pre-output hidden
        fparams, x_target = fused_recon_args
        if spmd_axes is not None:
            from dvae_tpu.ops.partitioned import make_partitioned_zinb
            zinb_op = make_partitioned_zinb(spmd_axes[0], spmd_axes[1])
        else:
            from dvae_tpu.ops.zinb_pallas import fused_zinb
            zinb_op = fused_zinb
        sums = zinb_op(_pin(outs.x_rec),
                       fparams["fc11"]["w"], fparams["fc11"]["b"],
                       fparams["fc11_p"]["w"], fparams["fc11_p"]["b"],
                       fparams["fc11_r"]["w"], fparams["fc11_r"]["b"],
                       x_target)
        loss_rec = sums / (B * xs.shape[-1])
        ll_sumsq = None   # ll proxy = the NLL itself (no materialized rec)
    elif fused_recon_args is not None:
        fparams, x_target = fused_recon_args
        if fused_trunk:
            # full-decoder kernel (cfg.fused_decoder): outs.x_rec carries
            # the decoder INPUT z = [c_smp, dropout(s)] and the whole
            # fc6..fc11 chain runs in VMEM (ops/decoder_pallas.py);
            # single-device or arm-sharded only (train/step gates on spmd
            # batch axes)
            from dvae_tpu.ops.decoder_pallas import fused_decoder_mse
            flat = []
            for name in ("fc6", "fc7", "fc8", "fc9", "fc10", "fc11"):
                flat += [fparams[name]["w"], fparams[name]["b"]]
            sumsq, mism = fused_decoder_mse(outs.x_rec, *flat, x_target,
                                            0.1, cfg.recon_bce_metric)
        elif spmd_axes is not None:
            from dvae_tpu.ops.partitioned import make_partitioned_recon
            recon_op = make_partitioned_recon(spmd_axes[0], spmd_axes[1],
                                              0.1, cfg.recon_bce_metric)
            sumsq, mism = recon_op(_pin(outs.x_rec),
                                   fparams["fc11"]["w"],
                                   fparams["fc11"]["b"], x_target)
        else:
            from dvae_tpu.ops.recon_pallas import fused_recon_mse
            sumsq, mism = fused_recon_mse(outs.x_rec, fparams["fc11"]["w"],
                                          fparams["fc11"]["b"], x_target,
                                          0.1, cfg.recon_bce_metric)
        loss_rec = 0.5 * sumsq / B
        if cfg.recon_bce_metric:
            # BCE on hard-binarized inputs ≡ 100 · mismatch fraction
            # (torch's −100 log clamp; see ops/recon_pallas.py)
            loss_rec = loss_rec + jax.lax.stop_gradient(
                50.0 * mism / (B * D))
        ll_sumsq = sumsq
    elif cfg.mode == "ZINB":
        loss_rec = jax.vmap(lambda r, p, z, x: zinb_loss(r, p, z, x))(
            outs.x_rec, outs.p_x, outs.r_x, xs)
    elif cfg.recon_bce_metric:
        loss_rec = jax.vmap(recon_loss_mse)(outs.x_rec, xs)
    else:
        # gradient-identical fast path: drop the value-only binarized-BCE
        # term (see VAEConfig.recon_bce_metric)
        loss_rec = jax.vmap(
            lambda r, x: 0.5 * jnp.sum((r - x) ** 2) / x.shape[0])(
            outs.x_rec, xs)

    if cfg.variational:
        # f32: bf16 catastrophic cancellation in mean/var-style reductions
        # corrupts the small KL/coupling terms long before it hurts the
        # (much larger) reconstruction term
        kl = jax.vmap(kl_gaussian)(outs.s_mean.astype(jnp.float32),
                                   outs.s_logvar.astype(jnp.float32))
    else:
        kl = jnp.zeros((A,), jnp.float32)

    nan_a = jnp.full((A,), jnp.nan, jnp.float32)
    if fused_recon_args is not None:
        ll = (nan_a if ll_sumsq is None   # fused ZINB: no x_rec — see field doc
              else ll_sumsq / (B * D) + B * math.log(2 * math.pi))
    else:
        ll = jax.vmap(lambda r, x: jnp.mean((r - x) ** 2))(outs.x_rec, xs) \
            + B * math.log(2 * math.pi)
    rec_nll = loss_rec if cfg.mode == "ZINB" else nan_a

    loss_ind_sum = jnp.sum(loss_rec + cfg.beta * kl)

    # --- coupling terms (always f32: the batch variance inside inv_sd and
    # log(c+eps) lose all signal in bf16 — the (A, B, C) tensors are small
    # so the cast is free relative to the recon path) ---
    c = outs.c.astype(jnp.float32)
    logc = jnp.log(c + eps)
    negent = neg_entropy(c, logc)                       # (A,)

    n_pairs = A * (A - 1) // 2
    if n_pairs > 0:
        if cfg.use_pallas:
            from dvae_tpu.ops.coupling_pallas import coupling_distance_pallas
            sum_c_dists = coupling_distance_pallas(c, eps)
        else:
            sum_c_dists = coupling_distance(c, eps)
        sum_c_l2 = _pair_sums_from_gram(outs.c_smp)
        # each arm participates in (A-1) pairs (reference :565)
        sum_c_ents = (A - 1) * jnp.sum(negent)
    else:
        sum_c_dists = jnp.asarray(0.0, xs.dtype)
        sum_c_l2 = jnp.asarray(0.0, xs.dtype)
        sum_c_ents = jnp.asarray(0.0, xs.dtype)

    n_dist_terms = n_pairs
    n_ent_terms = n_pairs
    n_l2_terms = n_pairs

    if cfg.ref_prior and prior_c is not None:
        c_bin = jax.vmap(lambda ca: hard_one_hot_st(ca))(c)  # hard one-hot, no noise
        prior_bce = jax.vmap(lambda cb: bce(cb, prior_c))(c_bin)  # (A,)
        prior_l2 = jax.vmap(
            lambda sm: jnp.mean(jnp.sum((sm - prior_c) ** 2, axis=-1)))(outs.c_smp)
        sum_c_ents = sum_c_ents + jnp.sum(negent)
        sum_c_l2 = sum_c_l2 + jnp.sum(prior_l2)
        sum_c_dists = sum_c_dists + cfg.lam_pc * jnp.sum(prior_bce)
        n_dist_terms += A
        n_ent_terms += A
        n_l2_terms += A
        # reference ref_prior scalers (build/lib nn_model.py:406-408):
        # n_comb counts arm pairs PLUS the A arm-prior pairs, and every
        # arm's independent loss couples to the prior, so scaler = A
        n_comb = max(A * (A + 1) // 2, 1)
        scaler = A
    else:
        # (build/lib nn_model.py:417-418)
        n_comb = max(n_pairs, 1)
        scaler = max(A - 1, 1)

    const = n_comb * ((C / 2) * math.log(2 * math.pi)
                      - 0.5 * math.log(2 * cfg.lam))
    loss_joint = cfg.lam * sum_c_dists + sum_c_ents + const
    total = scaler * loss_ind_sum + loss_joint

    denom_d = max(n_dist_terms, 1)
    denom_e = max(n_ent_terms, 1)
    denom_l = max(n_l2_terms, 1)
    return LossOutputs(
        total=total,
        loss_rec=loss_rec,
        loss_joint=loss_joint,
        neg_entropy=sum_c_ents / denom_e,
        c_dist=sum_c_dists / denom_d,
        c_l2_dist=sum_c_l2 / denom_l,
        kl=kl,
        ll=ll,
        rec_nll=rec_nll,
    )
