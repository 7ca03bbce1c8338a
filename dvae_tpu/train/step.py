"""Jitted training/eval steps and the fused multi-epoch epoch runner.

Equivalent capability to the hot loop of the reference trainer
(``cpl_mixVAE.train``, mmidas/cpl_mixvae.py:400-525: per-batch augmenter
forward → model forward → loss → backward → step; per-epoch metric
all_reduce + consensus), re-designed TPU-first:

  * One **pure train step** (params, bn, opt, key) × batch → new state +
    metrics, jit-compiled once.  The reference pays python dispatch, a
    GPU→CPU ``to_np`` sync per batch per arm (cpl_mixvae.py:477), and a
    manual ``dist.all_reduce`` per epoch (:480-483); here metrics are
    reduced by the XLA partitioner and nothing leaves the device until the
    host asks.
  * The **epoch runner fuses E epochs into one ``lax.scan``** — at the
    production shape (N≈20k, B=5000 → 4 steps/epoch, up to 500k epochs) the
    reference's per-epoch host work dominates wall-clock (SURVEY.md §7.3);
    here an epoch is 4 scan iterations plus one on-device permutation, and
    the host wakes up every ``epochs_per_chunk`` epochs only.
  * Per-epoch **train consensus is computed on device**: argmax labels are
    accumulated into an (A, N) buffer during the epoch and the all-pairs
    confusion-matrix consensus is one batched one-hot einsum on the MXU
    (eval/metrics.consensus_device) — replacing the reference's per-sample
    python loops (cpl_mixvae.py:802-818).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dvae_tpu.config import TrainConfig, VAEConfig
from dvae_tpu.eval.metrics import consensus_device
from dvae_tpu.models import mixvae
from dvae_tpu.models.losses import LossOutputs, mixvae_loss


class TrainState(NamedTuple):
    """The carried training state (a pure pytree)."""

    params: Any            # stacked-arm parameter pytree
    bn: Any                # batch-norm running stats
    opt_state: Any         # optax state
    mask: jax.Array        # (C,) category keep-mask (pruning; all-ones = off)
    key: jax.Array         # PRNG key, split every step
    epoch: jax.Array       # scalar int32


class StepMetrics(NamedTuple):
    """Per-step scalars (mirrors the reference wandb dict,
    cpl_mixvae.py:541-560)."""

    total: jax.Array
    loss_rec: jax.Array     # (A,)
    loss_joint: jax.Array
    neg_entropy: jax.Array
    c_dist: jax.Array
    c_l2_dist: jax.Array
    kl: jax.Array           # (A,)


def make_optimizer(cfg: VAEConfig, name: str = "adam") -> optax.GradientTransformation:
    """adam/adamw with the reference defaults (train.py:144-149, lr=1e-3)."""
    if name == "adamw":
        return optax.adamw(cfg.lr)
    if name == "adam":
        return optax.adam(cfg.lr)
    raise ValueError(f"unknown optimizer {name!r}")


def init_train_state(key: jax.Array | int, cfg: VAEConfig,
                     tx: optax.GradientTransformation,
                     dtype=jnp.float32,
                     rng_impl: Optional[str] = None) -> TrainState:
    """``key`` may be a PRNG key or an int seed; with ``rng_impl='rbg'`` the
    run key (and every key split from it in the hot loop) uses the TPU
    hardware RNG — faster mask/noise generation, identical distributions."""
    if isinstance(key, int):
        key = jax.random.key(key)
    k_init, k_run = jax.random.split(key)
    if rng_impl and rng_impl != "threefry2x32":
        seed = jax.random.randint(k_run, (), 0, 2**31 - 1)
        k_run = jax.random.key(seed, impl=rng_impl)
    params = mixvae.init_params(k_init, cfg, dtype)
    bn = mixvae.init_bn_state(cfg, dtype)
    opt_state = tx.init(params)
    mask = jnp.ones((cfg.n_categories,), dtype)
    return TrainState(params, bn, opt_state, mask, k_run,
                      jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Single step
# ---------------------------------------------------------------------------

AugmentFn = Callable[[jax.Array, jax.Array, int], jax.Array]
# (key, x(B,D), n_arm) -> (A, B, D) per-arm views


def expand_arms(key: jax.Array, x: jax.Array, n_arm: int) -> jax.Array:
    """No-augmentation default: all arms see the same batch
    (reference ``x.expand(A, -1, -1)``, cpl_mixvae.py:433-436)."""
    del key
    return jnp.broadcast_to(x, (n_arm,) + x.shape)


def loss_fn(params, bn, cfg: VAEConfig, xs, key, temp, mask, prior_c,
            compute_dtype=None, x_shared=None, spmd_axes=None):
    """Differentiable loss; returns (total, (aux, new_bn, labels)).

    ``x_shared``: the un-expanded (B, D) batch when every arm sees the same
    view (no augmentation) — lets the fused recon kernel read the target
    once instead of A times.
    ``spmd_axes``: static ``(arm_axes, batch_axes, mesh)`` under a
    >1-device mesh — routes the fused kernels through their SPMD
    partitioning rules (ops/partitioned.py) so they compute on local
    shards instead of being replicated by the partitioner; the mesh (may
    be None) enables activation pinning at the kernel boundaries.
    """
    if compute_dtype is not None and compute_dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype), params)
        xs = xs.astype(compute_dtype)
        if x_shared is not None:
            x_shared = x_shared.astype(compute_dtype)
    outs, new_bn, aux = _apply_with_loss(
        params, bn, cfg, xs, key, temp, mask, prior_c, x_shared, spmd_axes,
        train=True)
    labels = jnp.argmax(outs.c, axis=-1)  # (A, B) int — for consensus
    return aux.total.astype(jnp.float32), (aux, new_bn, labels)


def _apply_with_loss(params, bn, cfg: VAEConfig, xs, key, temp, mask,
                     prior_c, x_shared, spmd_axes, train: bool,
                     fused_override: Optional[bool] = None):
    """Forward + loss with the fused-recon wiring in ONE place — train
    (``loss_fn``) and eval (``make_eval_step``) share it so their numerics
    cannot desynchronize.  ``fused_override`` lets eval fall back to the
    materializing path for batch shapes the partitioned kernels cannot
    shard."""
    fused = cfg.fused_recon if fused_override is None else fused_override
    # the full-decoder kernel has no batch-sharded SPMD rule: under batch
    # axes fall back to the fc11-only kernel (ops/partitioned.py path)
    fused_trunk = (fused and cfg.fused_decoder and cfg.mode != "ZINB"
                   and (spmd_axes is None or not spmd_axes[1]))
    outs, new_bn = mixvae.apply(params, bn, cfg, xs, key, temp=temp,
                                train=train, mask=mask, prior_c=prior_c,
                                skip_recon=fused, skip_trunk=fused_trunk,
                                x_shared=x_shared,
                                spmd_axes=spmd_axes)
    fused_args = ((params, xs if x_shared is None else x_shared)
                  if fused else None)
    aux: LossOutputs = mixvae_loss(cfg, outs, xs, prior_c,
                                   fused_recon_args=fused_args,
                                   spmd_axes=spmd_axes,
                                   fused_trunk=fused_trunk)
    return outs, new_bn, aux


def _fused_spmd_axes(cfg: VAEConfig, tcfg: TrainConfig, mesh=None):
    """Static (arm_axes, batch_axes, mesh) for the fused kernels'
    partitioning rules under a >1-device mesh (parallel/sharding
    .batch_sharding lays the batch over ('data', 'fsdp') and arms over
    'arm').  None on one device or when the fused kernels are off; axes
    that do not divide their dimension are dropped (the partitioner then
    replicates that dim — correct, just less parallel).

    ``mesh``: the concrete ``jax.sharding.Mesh`` when the caller has one —
    enables explicit activation constraints at the kernel boundaries
    (parallel/sharding.constrain)."""
    m = tcfg.mesh
    if m.n_devices <= 1 or not (cfg.fused_recon or cfg.fused_encoder):
        return None
    arm_axes = ("arm",) if (m.arm > 1 and cfg.n_arm % m.arm == 0) else ()
    n_batch = m.data * m.fsdp
    batch_axes = tuple(
        ax for ax, sz in (("data", m.data), ("fsdp", m.fsdp)) if sz > 1
    ) if tcfg.batch_size % max(n_batch, 1) == 0 else ()
    return (arm_axes, batch_axes, mesh)


def _batch_ns(mesh, n_rows: int):
    """NamedSharding for a (B, ...) host batch laid over the batch axes, or
    None when the mesh is absent/trivial or does not divide ``n_rows``."""
    if mesh is None:
        return None
    axes = tuple(ax for ax in ("data", "fsdp") if mesh.shape[ax] > 1)
    if not axes:
        return None
    n = 1
    for ax in axes:
        n *= mesh.shape[ax]
    if n_rows % n:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(axes, None))


def make_train_step(cfg: VAEConfig, tcfg: TrainConfig,
                    tx: optax.GradientTransformation,
                    augment: Optional[AugmentFn] = None, mesh=None):
    """Build the jitted train step.

    step(state, x(B,D), prior_c(B,C)|None, temp) →
        (new_state, StepMetrics, labels(A,B))
    """
    compute_dtype = jnp.bfloat16 if tcfg.bf16 else jnp.float32
    aug = augment or expand_arms
    # the fused kernels' shared-x layout (one target tile DMA per block
    # instead of A) applies whenever all arms see the same batch — also
    # when the caller passes expand_arms EXPLICITLY, not only by default
    shares_x = augment is None or augment is expand_arms
    spmd_axes = _fused_spmd_axes(cfg, tcfg, mesh)

    def step(state: TrainState, x: jax.Array,
             prior_c: Optional[jax.Array], temp) -> tuple:
        key, k_aug, k_fwd = jax.random.split(state.key, 3)
        xs = aug(k_aug, x, cfg.n_arm)
        x_shared = x if shares_x else None
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (aux, new_bn, labels)), grads = grad_fn(
            state.params, state.bn, cfg, xs, k_fwd, temp, state.mask,
            prior_c, compute_dtype, x_shared, spmd_axes)
        grads = jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype), grads, state.params)
        # pruning: zero grads of masked-out category units
        grads = _mask_grads(grads, state.mask, cfg)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = _mask_params(new_params, state.mask, cfg)
        # metrics leave the device f32 regardless of the compute dtype
        # (same contract as make_eval_step; under bf16 the unfused recon
        # path would otherwise hand bf16 loss_rec to the epoch averages)
        metrics = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float32),
            StepMetrics(aux.total, aux.loss_rec, aux.loss_joint,
                        aux.neg_entropy, aux.c_dist, aux.c_l2_dist,
                        aux.kl))
        new_state = TrainState(new_params, new_bn, new_opt, state.mask,
                               key, state.epoch)
        return new_state, metrics, labels

    return step


def _mask_params(params, mask, cfg: VAEConfig):
    """Multiplicative category masks — the TPU-native form of the
    reference's ``torch.nn.utils.prune.custom_from_mask`` on
    fcc/fc_mu/fc_sigma/fc6 (cpl_mixvae.py:1152-1161).

    fcc:  (A, L, C) — mask output columns (category logits).
    fc_mu/fc_sigma: (A, L+C, S) — mask the C input *rows* that carry c_smp.
    fc6:  (A, C+S, L) — mask the C input rows.
    A full mask (all ones) multiplies by 1.0 and XLA folds it away.
    """
    C = cfg.n_categories
    L = cfg.lowD_dim
    p = dict(params)
    p["fcc"] = dict(params["fcc"])
    p["fcc"]["w"] = params["fcc"]["w"] * mask[None, None, :]
    p["fcc"]["b"] = params["fcc"]["b"] * mask[None, :]
    row_mu = jnp.concatenate([jnp.ones((L,), mask.dtype), mask])
    for name in ("fc_mu", "fc_sigma"):
        p[name] = dict(params[name])
        p[name]["w"] = params[name]["w"] * row_mu[None, :, None]
    row_dec = jnp.concatenate([mask, jnp.ones((cfg.state_dim,), mask.dtype)])
    p["fc6"] = dict(params["fc6"])
    p["fc6"]["w"] = params["fc6"]["w"] * row_dec[None, :, None]
    return p


def _mask_grads(grads, mask, cfg: VAEConfig):
    """Zero gradients flowing into pruned category units (prune.remove
    semantics: masked weights stay exactly zero through training)."""
    return _mask_params(grads, mask, cfg)


# ---------------------------------------------------------------------------
# Fused multi-epoch runner
# ---------------------------------------------------------------------------

class EpochMetrics(NamedTuple):
    """Per-epoch aggregates returned to the host every chunk."""

    total: jax.Array        # (E,)
    loss_rec: jax.Array     # (E, A)
    loss_joint: jax.Array   # (E,)
    neg_entropy: jax.Array  # (E,)
    c_dist: jax.Array       # (E,)
    c_l2_dist: jax.Array    # (E,)
    kl: jax.Array           # (E, A)
    consensus: jax.Array    # (E,) on-device train consensus


def make_epoch_runner(cfg: VAEConfig, tcfg: TrainConfig,
                      tx: optax.GradientTransformation,
                      n_train: int,
                      augment: Optional[AugmentFn] = None,
                      epochs_per_chunk: Optional[int] = None,
                      consensus_every_epoch: bool = True, mesh=None):
    """Build run_epochs(state, x_all, prior_all, temp), a jit-able fn.

    Runs ``epochs_per_chunk`` epochs fully on device: per epoch an on-device
    shuffled batch plan ((steps, B) permutation rows, drop_last),
    ``steps`` train steps via ``lax.scan``, label accumulation, and the
    consensus einsum.  Returns (state, EpochMetrics).
    """
    E = epochs_per_chunk or tcfg.epochs_per_jit
    B = tcfg.batch_size
    steps = n_train // B
    if steps == 0:
        raise ValueError(f"batch_size {B} > dataset size {n_train}")
    step_fn = make_train_step(cfg, tcfg, tx, augment, mesh)
    batch_ns = _batch_ns(mesh, tcfg.batch_size)
    n_used = steps * B
    sb = tcfg.shuffle_block
    if sb > 1 and B % sb:
        raise ValueError(f"shuffle_block {sb} must divide batch_size {B}")
    n_blocks = n_train // sb  # a <sb-row tail is dropped from the shuffle
    # (strictly milder than the reference's drop_last, which drops up to
    # B-1 rows per epoch, dataloader.py:123-132).  Invariant: the shuffle
    # always has enough blocks — n_used = steps·B ≤ n_train and sb | B
    # give n_used//sb ≤ n_train//sb = n_blocks by floor monotonicity.
    assert n_used // sb <= n_blocks

    def one_epoch(state: TrainState, x_all, prior_all, temp, i_local):
        key, k_perm = jax.random.split(state.key)
        state = state._replace(key=key)
        # shuffle at shuffle_block-row granularity: with sb>1 the per-step
        # gather moves (sb, D) contiguous slices at HBM bandwidth instead
        # of single rows (~4x faster at the production shape)
        perm = jax.random.permutation(k_perm, n_blocks)[: n_used // sb]
        plan = perm.reshape(steps, B // sb)
        x_view = x_all[: n_blocks * sb].reshape(n_blocks, sb,
                                                *x_all.shape[1:])
        prior_view = (None if prior_all is None else
                      prior_all[: n_blocks * sb].reshape(
                          n_blocks, sb, *prior_all.shape[1:]))

        def body(st, sel):
            x = jnp.take(x_view, sel, axis=0).reshape(B, *x_all.shape[1:])
            prior = (None if prior_view is None
                     else jnp.take(prior_view, sel, axis=0).reshape(
                         B, *prior_all.shape[1:]))
            if batch_ns is not None:
                # pin the gathered batch to the batch sharding: without the
                # constraint, propagation feature-shards it (pressure from
                # the fsdp-sharded fc1 weight) and the kernel boundary pays
                # a replicate-then-repartition
                x = jax.lax.with_sharding_constraint(x, batch_ns)
                if prior is not None:
                    prior = jax.lax.with_sharding_constraint(prior, batch_ns)
            st, m, labels = step_fn(st, x, prior, temp)
            return st, (m, labels)

        state, (ms, labels) = jax.lax.scan(body, state, plan)
        # labels: (steps, A, B) → (A, steps*B)
        flat = jnp.moveaxis(labels, 1, 0).reshape(cfg.n_arm, n_used)
        if consensus_every_epoch:
            cons = consensus_device(flat, cfg.n_categories)
        else:
            # the all-pairs consensus einsum costs ~2·A²·K·N FLOPs — of the
            # same order as a training step at the production shape — so
            # the throughput path computes it only on the chunk's last
            # epoch (the host reads it at chunk boundaries anyway)
            cons = jax.lax.cond(
                i_local == E - 1,
                lambda f: consensus_device(f, cfg.n_categories),
                lambda f: jnp.asarray(-1.0),
                flat)
        em = EpochMetrics(
            total=jnp.mean(ms.total),
            loss_rec=jnp.mean(ms.loss_rec, axis=0),
            loss_joint=jnp.mean(ms.loss_joint),
            neg_entropy=jnp.mean(ms.neg_entropy),
            c_dist=jnp.mean(ms.c_dist),
            c_l2_dist=jnp.mean(ms.c_l2_dist),
            kl=jnp.mean(ms.kl, axis=0),
            consensus=cons,
        )
        state = state._replace(epoch=state.epoch + 1)
        return state, em

    def run_epochs(state: TrainState, x_all, prior_all, temp):
        def body(st, i_local):
            st, em = one_epoch(st, x_all, prior_all, temp, i_local)
            return st, em

        state, ems = jax.lax.scan(body, state, jnp.arange(E))
        return state, ems

    return run_epochs


# ---------------------------------------------------------------------------
# Eval step
# ---------------------------------------------------------------------------

class EvalFields(NamedTuple):
    """The eval outputs ``eval_model`` consumes, stacked arm-major —
    (A, N, ·) — ready for host concatenation."""

    c: jax.Array         # (A, N, C) tau-sharpened posterior
    s_mean: jax.Array    # (A, N, S)
    s_logvar: jax.Array  # (A, N, S)
    x_low: jax.Array     # (A, N, L)
    lab: jax.Array       # (A, N) argmax labels


def make_eval_runner(cfg: VAEConfig, tcfg: TrainConfig,
                     augment: Optional[AugmentFn] = None, mesh=None):
    """Scan the eval step over K batches in ONE device program.

    ``eval_model`` (reference cpl_mixvae.py:1450-1619) dispatches one
    batch at a time; each dispatch costs a host round trip (~1 ms/batch
    through a tunneled chip — equal to the 1.05 ms device time of the
    eval step itself at the production shape).  Fusing K batches into one
    ``lax.scan`` amortizes that to one dispatch per chunk — the same
    design as the training epoch runner.

    run(state, x_chunk (K, B, D), temp, prior_chunk (K, B, C)|None) →
        (aux: LossOutputs stacked (K, ...), EvalFields (A, K·B, ·))

    Per-batch numerics are IDENTICAL to looping ``make_eval_step``: the
    scan carries no state, so every batch sees the same ``state.key``
    (the per-batch loop passes the same state each call).  Compiles once
    per distinct (K, B) shape.

    The scan is fully unrolled (``unroll=True``; K ≤ 8 by construction in
    the callers): on TPU, the fused recon FORWARD kernel — whose only
    output lives in SMEM (ops/recon_pallas._fwd) — crashes the runtime
    when the custom call sits inside a rolled ``while`` loop (worker
    "crashed or restarted", reproduced at the production shape 2026-08-18;
    the training runner's fused fwd+bwd kernels, which also have VMEM
    outputs, scan rolled without issue).  Unrolled, the custom calls are
    straight-line — the exact pattern the per-batch path runs.
    """
    ev = make_eval_step(cfg, tcfg, augment=augment, mesh=mesh)

    @jax.jit
    def run(state: TrainState, x_chunk, temp, prior_chunk=None):
        def body(_, inp):
            xb, pb = inp if prior_chunk is not None else (inp, None)
            aux, lab, outs = ev(state, xb, pb, temp)
            return None, (aux, lab, outs.c, outs.s_mean, outs.s_logvar,
                          outs.x_low)

        xs_in = ((x_chunk, prior_chunk) if prior_chunk is not None
                 else x_chunk)
        _, (aux, lab, c, s_mean, s_logvar, x_low) = jax.lax.scan(
            body, None, xs_in, unroll=True)

        def arm_major(v):  # (K, A, B, ...) → (A, K·B, ...)
            v = jnp.moveaxis(v, 1, 0)
            return v.reshape(v.shape[0], -1, *v.shape[3:])

        fields = EvalFields(arm_major(c), arm_major(s_mean),
                            arm_major(s_logvar), arm_major(x_low),
                            arm_major(lab))
        return aux, fields

    return run


def make_eval_step(cfg: VAEConfig, tcfg: TrainConfig,
                   augment: Optional[AugmentFn] = None, mesh=None):
    """Validation forward: no grad, eval semantics (hard one-hot, no noise,
    running-stat BN) — reference cpl_mixvae.py:563-761.

    Uses the same fused recon-loss kernel wiring as ``loss_fn``
    (``_apply_with_loss``) when ``cfg.fused_recon`` is on: the eval loss
    is bandwidth-bound exactly like the train loss, and the unfused path
    materializes the (A, B, D) reconstruction in HBM (measured 25 → ~3
    ms/batch at the production shape).  ``outs.x_rec`` then carries the
    pre-output hidden, which no eval consumer reads (eval_model returns
    posteriors/states/labels).

    Unlike training (drop_last batches), eval sees trailing partial
    batches; on a >1-device mesh whose batch axes do not divide such a
    batch, the partitioned kernels would shard it unevenly (unsupported),
    so those traces fall back to the materializing path — a static,
    per-shape decision under jit.

    Eval uses the SAME compute dtype as training (``tcfg.bf16``): the
    training consensus labels are already argmaxed from bf16 posteriors,
    so an f32 eval would *diverge* from the labels the early-stop saw —
    and it ran 2× the HBM traffic / half the MXU rate for it (measured
    11.3 → 6.7 ms/batch at the production shape).  The f32 islands
    (KL/coupling/BN statistics, losses.py) are unchanged.  With
    ``tcfg.bf16=False`` (the reference-exact default) eval is pure f32.
    """
    aug = augment or expand_arms
    shares_x = augment is None or augment is expand_arms  # see make_train_step
    spmd_axes = _fused_spmd_axes(cfg, tcfg, mesh)
    m = tcfg.mesh
    n_batch_devices = max(m.data * m.fsdp, 1)
    compute_dtype = jnp.bfloat16 if tcfg.bf16 else jnp.float32

    @jax.jit
    def eval_step(state: TrainState, x, prior_c, temp):
        key, k_aug, k_fwd = jax.random.split(state.key, 3)
        params = state.params
        if compute_dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype), params)
            x = x.astype(compute_dtype)
        xs = aug(k_aug, x, cfg.n_arm)
        x_shared = x if shares_x else None
        fused_override = None
        if (spmd_axes is not None and spmd_axes[1]
                and x.shape[0] % n_batch_devices):
            fused_override = False
        outs, _, aux = _apply_with_loss(
            params, state.bn, cfg, xs, k_fwd, temp, state.mask,
            prior_c, x_shared, spmd_axes, train=False,
            fused_override=fused_override)
        labels = jnp.argmax(outs.c, axis=-1)
        # metrics leave the device in f32 regardless of compute dtype —
        # same contract as loss_fn's total (host code averages them)
        aux = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float32), aux)
        return aux, labels, outs

    return eval_step
