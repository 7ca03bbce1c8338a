"""Adversarial training of the VAE-GAN augmenter.

Equivalent capability to the reference ``train_augmenter``
(mmidas/augmentation/train.py:10-157), re-designed as one jitted GAN step
scanned over on-device batches:

  * **Gated discriminator updates**: D only steps when its real/fake losses
    exceed log(2)/2 (train.py:53-57, :83-91) — here the gate is a traced
    boolean selecting between updated and carried (params, opt_state) trees.
  * Augmenter loss = λ0·gen + λ1·triplet + λ2·‖z1−z2‖² + λ3·recon with
    λ=[1, .5, .1, .5] (train.py:111-114; dist/train_agumenter.py:18).
    Note (faithful to the reference): in MSE mode the binarization of the
    augmented samples is a hard threshold, so the adversarial/triplet/
    z-consistency terms carry **no gradient** into the augmenter — the only
    differentiable term is the reconstruction MSE.  The hard ``where`` here
    reproduces that exactly (zero gradient through both branches).
  * Binarize thresholds: data at 1e-4 (train.py:8,41-42), augmented samples
    at 1e-3 (:75-77); ZINB mode uses Bernoulli-sampled masks (:68-73).
"""

from __future__ import annotations

import math
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dvae_tpu.augment.augmenter import (AugmenterConfig, DiscriminatorConfig,
                                        apply_augmenter, apply_discriminator,
                                        init_augmenter, init_discriminator,
                                        save_augmenter)
from dvae_tpu.models.losses import bce

_LOG2_HALF = math.log(2.0) / 2.0
DATA_BIN_EPS = 1e-4
FAKE_BIN_EPS = 1e-3


class GanState(NamedTuple):
    a_params: dict
    a_bn: dict
    d_params: dict
    d_bn: dict
    a_opt: optax.OptState
    d_opt: optax.OptState
    key: jax.Array


class GanMetrics(NamedTuple):
    a_loss: jax.Array
    d_loss: jax.Array
    gen_loss: jax.Array
    recon_loss: jax.Array   # (MSE + binarized-BCE)/2, the reference's metric
    mse_recon: jax.Array    # the differentiable MSE part alone
    triplet_loss: jax.Array
    d_skipped: jax.Array   # 1.0 when the D step was gated off (n_adv)


def _binarize(x, thr):
    return jnp.where(x > thr, 1.0, 0.0).astype(x.dtype)


def _triplet(anchor, positive, negative, margin: float):
    """BCE-distance triplet loss (mmidas/augmentation/aug_utils.py:30-48)."""
    d_pos = bce(positive, anchor)
    d_neg = bce(negative, anchor)
    return jax.nn.relu(d_pos - d_neg + margin)


def make_gan_step(a_cfg: AugmenterConfig, d_cfg: DiscriminatorConfig,
                  a_tx: optax.GradientTransformation,
                  d_tx: optax.GradientTransformation,
                  lambdas=(1.0, 0.5, 0.1, 0.5), alpha: float = 0.2,
                  mode: str = "MSE", bf16: bool = False):
    """Build the jitted combined D-step + A-step.

    ``bf16``: mixed-precision compute.  Recipe: params and network inputs
    cast to bf16; every LOSS term computed from f32-cast network outputs
    (a bf16 mean over the (B, D)=5M-element recon/triplet tensors would
    lose ~3 decimal digits of the gradient signal); master params, Adam
    moments and the D-gate stay f32.  Measured at the production shape
    (B=1000, D=5032, v5e-1): 5.37 → 4.91 ms/step (device 4.36 ms).  The
    win is modest because the per-op profile is FLAT — ~35% f32 loss
    reductions over (B, D) tensors plus dozens of elementwise/dropout
    fusions, i.e. HBM-bandwidth-bound, not MXU-bound; and a full
    pretraining run is only ~1000 steps (~5 s end-to-end), so this path
    is not worth deeper kernel work (scripts/op_profile.py --gan).
    """
    cdt = jnp.bfloat16 if bf16 else None

    def _c(tree):
        """Cast the floating leaves of a param tree to the compute dtype
        (single source: augmenter.cast_augmenter_params)."""
        from dvae_tpu.augment.augmenter import cast_augmenter_params
        return cast_augmenter_params(tree, cdt)

    def _cx(x):
        return x if cdt is None else x.astype(cdt)

    def _f32(x):
        return x.astype(jnp.float32)

    def d_loss_fn(d_params, d_bn, data_bin, f1_bin, f2_bin, key):
        d_params = _c(d_params)
        k1, k2, k3 = jax.random.split(key, 3)
        _, p_real, bn1 = apply_discriminator(d_params, d_bn, d_cfg,
                                             _cx(data_bin), k1, train=True)
        loss_real = bce(_f32(p_real).reshape(-1),
                        jnp.ones(p_real.shape[0]))
        _, p_f1, bn2 = apply_discriminator(d_params, bn1, d_cfg,
                                           _cx(f1_bin), k2, train=True)
        _, p_f2, bn3 = apply_discriminator(d_params, bn2, d_cfg,
                                           _cx(f2_bin), k3, train=True)
        zeros = jnp.zeros(p_f1.shape[0])
        loss_fake = (bce(_f32(p_f1).reshape(-1), zeros)
                     + bce(_f32(p_f2).reshape(-1), zeros)) / 2
        g_real = jax.lax.stop_gradient(
            (loss_real > _LOG2_HALF).astype(loss_real.dtype))
        g_fake = jax.lax.stop_gradient(
            (loss_fake > _LOG2_HALF).astype(loss_fake.dtype))
        gated = g_real * loss_real + g_fake * loss_fake
        return gated, (loss_real + loss_fake, g_real + g_fake, bn3)

    def a_loss_fn(a_params, a_bn, d_params, d_bn, data, data_bin, key):
        a_params, d_params = _c(a_params), _c(d_params)
        kf1, kf2, kd1, kd2 = jax.random.split(key, 4)
        _, fake1, bn_a1 = apply_augmenter(a_params, a_bn, a_cfg, _cx(data),
                                          kf1, train=True, noise=True)
        _, fake2, bn_a2 = apply_augmenter(a_params, bn_a1, a_cfg, _cx(data),
                                          kf2, train=True, noise=False)
        if mode == "ZINB" and a_cfg.n_zim > 1:
            D = a_cfg.input_dim
            p1 = data_bin * _f32(fake1[..., D:])
            p2 = data_bin * _f32(fake2[..., D:])
            kb1, kb2 = jax.random.split(kf1)
            f1_bin = jax.random.bernoulli(kb1, p1).astype(data.dtype)
            f2_bin = jax.random.bernoulli(kb2, p2).astype(data.dtype)
            fake_rec = _f32(fake2[..., :D]) * data_bin
        else:
            # binarize on the f32 view: 0/1 outputs are exact in either
            # dtype but the threshold compare must see unrounded values
            f1_bin = _binarize(_f32(fake1), FAKE_BIN_EPS)
            f2_bin = _binarize(_f32(fake2), FAKE_BIN_EPS)
            fake_rec = _f32(fake2)
        z1, p_f1, _ = apply_discriminator(d_params, d_bn, d_cfg,
                                          _cx(f1_bin), kd1, train=True)
        z2, p_f2, _ = apply_discriminator(d_params, d_bn, d_cfg,
                                          _cx(f2_bin), kd2, train=True)
        ones = jnp.ones(p_f1.shape[0])
        gen = (bce(_f32(p_f1).reshape(-1), ones)
               + bce(_f32(p_f2).reshape(-1), ones)) / 2
        trip = _triplet(data_bin, f2_bin, f1_bin, alpha)
        mse_rec = jnp.mean((fake_rec - data) ** 2)
        recon = (mse_rec + bce(f2_bin, data_bin)) / 2
        z_mse = jnp.mean((_f32(z1) - _f32(z2)) ** 2)
        total = (lambdas[0] * gen + lambdas[1] * trip
                 + lambdas[2] * z_mse + lambdas[3] * recon)
        return total, (gen, recon, mse_rec, trip, bn_a2, f1_bin, f2_bin)

    def step(state: GanState, data: jax.Array):
        key, k_a, k_d = jax.random.split(state.key, 3)
        data_bin = _binarize(data, DATA_BIN_EPS)

        # pre-generate fakes for the D step (detached: stop_gradient).
        # SAME key as the A-step below: the reference uses one fake pair
        # for both updates (train.py:61-99), and the identical call lets
        # XLA CSE this forward with the gradient pass's primal
        _, (_, _, _, _, _, f1_bin, f2_bin) = a_loss_fn(
            state.a_params, state.a_bn, state.d_params, state.d_bn,
            data, data_bin, k_a)
        f1_bin = jax.lax.stop_gradient(f1_bin)
        f2_bin = jax.lax.stop_gradient(f2_bin)

        # ---- discriminator step (gated) ----
        (_, (d_loss, gate, d_bn_new)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params, state.d_bn, data_bin,
                                     f1_bin, f2_bin, k_d)
        d_updates, d_opt_new = d_tx.update(d_grads, state.d_opt,
                                           state.d_params)
        d_params_new = optax.apply_updates(state.d_params, d_updates)
        do_step = gate > 0
        d_params_sel = jax.tree_util.tree_map(
            lambda new, old: jnp.where(do_step, new, old),
            d_params_new, state.d_params)
        d_opt_sel = jax.tree_util.tree_map(
            lambda new, old: jnp.where(do_step, new, old),
            d_opt_new, state.d_opt)

        # ---- augmenter step ----
        (a_loss, (gen, recon, mse_rec, trip, a_bn_new, _, _)), a_grads = \
            jax.value_and_grad(a_loss_fn, has_aux=True)(
                state.a_params, state.a_bn, d_params_sel, d_bn_new,
                data, data_bin, k_a)
        a_updates, a_opt_new = a_tx.update(a_grads, state.a_opt,
                                           state.a_params)
        a_params_new = optax.apply_updates(state.a_params, a_updates)

        new_state = GanState(a_params_new, a_bn_new, d_params_sel, d_bn_new,
                             a_opt_new, d_opt_sel, key)
        metrics = GanMetrics(a_loss, d_loss, gen, recon, mse_rec, trip,
                             1.0 - do_step.astype(jnp.float32))
        return new_state, metrics

    return step


def train_augmenter(x_train: np.ndarray,
                    a_cfg: Optional[AugmenterConfig] = None,
                    n_epochs: int = 50, batch_size: int = 1000,
                    lr: float = 1e-3, lambdas=(1.0, 0.5, 0.1, 0.5),
                    alpha: float = 0.2, mode: str = "MSE",
                    seed: int = 0, saving_path: Optional[str] = None,
                    verbose: bool = True, bf16: bool = False,
                    epochs_per_jit: int = 1):
    """Full GAN training (reference train_augmenter, augmentation/train.py).

    Returns (params, bn, cfg, history).  Epochs run as one jitted
    ``lax.scan`` over on-device shuffled batches.  ``bf16``: run the
    matmuls in bf16 with f32 loss math and master weights (a modest win —
    the step is HBM-bandwidth-bound; see make_gan_step).

    ``epochs_per_jit`` scans that many epochs inside ONE dispatch (an
    outer ``lax.scan`` over the per-epoch scan) — at the reference's
    production cadence (n_epoch=10000, dist/train_agumenter.py:14) a
    per-epoch dispatch through a tunneled device would cost more host
    round-trips than device compute; metrics still land per epoch.
    """
    D = x_train.shape[1]
    a_cfg = a_cfg or AugmenterConfig(input_dim=D)
    if mode == "ZINB" and a_cfg.n_zim <= 1:
        # ZINB training needs the fc11_p dropout head (reference
        # networks.py mode='ZINB'); silently training an MSE model under
        # a 'ZINB' label would be a trap
        a_cfg = AugmenterConfig(**{**a_cfg.__dict__, "n_zim": 2})
    d_cfg = DiscriminatorConfig(input_dim=D)
    a_tx, d_tx = optax.adam(lr), optax.adam(lr)

    key = jax.random.key(seed)
    k_a, k_d, k_run = jax.random.split(key, 3)
    a_params, a_bn = init_augmenter(k_a, a_cfg)
    d_params, d_bn = init_discriminator(k_d, d_cfg)
    state = GanState(a_params, a_bn, d_params, d_bn,
                     a_tx.init(a_params), d_tx.init(d_params), k_run)

    x_all = jnp.asarray(x_train, jnp.float32)
    n = x_all.shape[0]
    batch_size = min(batch_size, n)   # small dataset: one batch of n rows
    steps = max(n // batch_size, 1)

    step_fn = make_gan_step(a_cfg, d_cfg, a_tx, d_tx, lambdas, alpha, mode,
                            bf16=bf16)

    def one_epoch(state: GanState, x_all):
        key, k_perm = jax.random.split(state.key)
        state = state._replace(key=key)
        plan = jax.random.permutation(k_perm, n)[: steps * batch_size]
        plan = plan.reshape(steps, batch_size)

        def body(st, sel):
            return step_fn(st, jnp.take(x_all, sel, axis=0))

        state, ms = jax.lax.scan(body, state, plan)
        return state, jax.tree_util.tree_map(jnp.mean, ms)

    E = max(int(epochs_per_jit), 1)

    @jax.jit
    def run_chunk(state: GanState, x_all):
        def epoch_body(st, _):
            return one_epoch(st, x_all)

        return jax.lax.scan(epoch_body, state, None, length=E)

    run_one = jax.jit(one_epoch)  # remainder epochs when E ∤ n_epochs

    history = []
    e0 = 0
    while e0 < n_epochs:
        t0 = time.perf_counter()
        if n_epochs - e0 >= E:
            state, ms = run_chunk(state, x_all)
            k = E
        else:
            state, m1 = run_one(state, x_all)
            ms = jax.tree_util.tree_map(lambda v: jnp.asarray(v)[None], m1)
            k = 1
        ms = jax.tree_util.tree_map(np.asarray, ms)
        dt = (time.perf_counter() - t0) / k
        for i in range(k):
            m = GanMetrics(*(float(v[i]) for v in ms))
            history.append(m._asdict())
            if verbose:
                print(f"=====> Epoch:{e0 + i}, Generator Loss: "
                      f"{m.a_loss:.4f}, Discriminator Loss: "
                      f"{m.d_loss:.4f}, Recon Loss: {m.recon_loss:.4f}, "
                      f"Trip Loss: {m.triplet_loss:.4f}, "
                      f"Elapsed Time:{dt:.2f}")
        e0 += k

    if saving_path:
        save_augmenter(saving_path, state.a_params, state.a_bn, a_cfg,
                       extra={"history_tail": history[-5:]})
    return state.a_params, state.a_bn, a_cfg, history
