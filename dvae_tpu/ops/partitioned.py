"""SPMD partitioning rules for the fused Pallas hot-path kernels.

Pallas kernels lower to opaque ``tpu_custom_call``s, which the GSPMD/Shardy
partitioner cannot split — under a multi-chip ``jit`` it would all-gather
their operands and replicate the whole computation on every device,
erasing the batch/arm scaling of exactly the ops that dominate step time.
These wrappers attach ``jax.experimental.custom_partitioning`` rules so
the kernels run on local shards with the minimal collectives:

  * fused_recon_mse:   per-arm sums are partial over batch shards →
                       one (A,)-sized ``psum`` over the batch axes; dW/db
                       in the backward likewise.
  * fused_dropout_fc1: embarrassingly parallel forward; dW/db ``psum``
                       in the backward.

The mesh axis names are **static arguments** (taken from MeshConfig), not
inferred from proposed operand shardings: the dropout kernel derives its
per-(arm, tile) PRNG seeds from a per-shard offset, and the offset formula
must be byte-identical between the forward and the backward (which
regenerates the mask) — inferring axes from shardings that the partitioner
may legally change between the two calls would silently corrupt gradients.

``custom_partitioning`` has no differentiation rule, so each wrapper is a
fresh ``custom_vjp`` whose fwd/bwd are the partitioned primitives.

Used by models/mixvae.apply + models/losses.mixvae_loss when the train
step is built with a >1-device mesh (train/step.make_train_step passes
``spmd_axes``); single-device paths call the raw kernels directly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import (SdyShardingRule,
                                                  custom_partitioning)
from jax.sharding import NamedSharding, PartitionSpec as P

from dvae_tpu.ops import encoder_pallas, recon_pallas, zinb_pallas

_SEED_STRIDE = 0x9E3779B1 - (1 << 32)  # golden-ratio stride (as signed i32)
                                       # decorrelates shard seeds


def _axes(mesh_axes: Sequence[str] | str | None):
    if mesh_axes is None:
        return ()
    if isinstance(mesh_axes, str):
        return (mesh_axes,)
    return tuple(mesh_axes)


def _shard_offset(axes):
    """Flattened linear index of this shard over ``axes`` (static names)."""
    off = jnp.zeros((), jnp.int32)
    for ax in axes:
        off = off * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
    return off


def _psum(x, axes):
    return jax.lax.psum(x, axes) if axes else x


# ---------------------------------------------------------------------------
# fused_recon_mse, partitioned
# ---------------------------------------------------------------------------

def make_partitioned_recon(arm_axes, batch_axes, thr: float = 0.1,
                           with_mism: bool = True):
    """Build an SPMD-partitioned fused_recon_mse(h, w, b, x) → (sumsq, mism).

    ``arm_axes``/``batch_axes``: mesh axis names the A and B dimensions are
    sharded over (must divide them).  Semantics identical to
    recon_pallas.fused_recon_mse.
    """
    arm_axes, batch_axes = _axes(arm_axes), _axes(batch_axes)
    a_s = arm_axes or None
    b_s = batch_axes or None

    def _specs(shared_x):
        x_spec = P(b_s, None) if shared_x else P(a_s, b_s, None)
        return (P(a_s, b_s, None), P(a_s, None, None), P(a_s, None), x_spec)

    def _rule(shared_x):
        x_map = ("b", "d") if shared_x else ("a", "b", "d")
        return (("a", "b", "f"), ("a", "f", "d"), ("a", "d"), x_map)

    # --- forward primitive ---
    def fwd_infer(mesh, arg_infos, result_infos):
        sh = NamedSharding(mesh, P(a_s))
        return (sh, sh)

    def fwd_partition(mesh, arg_infos, result_infos):
        shared_x = len(arg_infos[3].shape) == 2
        arg_sh = tuple(NamedSharding(mesh, s) for s in _specs(shared_x))
        out_sh = (NamedSharding(mesh, P(a_s)), NamedSharding(mesh, P(a_s)))

        def impl(h, w, b, x):
            s, m = recon_pallas._fwd(h, w, b, x, thr, with_mism)
            return _psum(s, batch_axes), _psum(m, batch_axes)

        return mesh, impl, out_sh, arg_sh

    def _fwd_rule_for(shared_x):
        return SdyShardingRule(operand_mappings=_rule(shared_x),
                               result_mappings=(("a",), ("a",)))

    # --- fused loss+gradient primitive (training path; see
    # recon_pallas._fwdbwd_kernel): per-arm sums + unscaled dW/db psum'ed
    # over the batch axes, dh stays batch-local ---
    def fb_out_specs():
        return (P(a_s), P(a_s), P(a_s, b_s, None), P(a_s, None, None),
                P(a_s, None))

    def fb_infer(mesh, arg_infos, result_infos):
        return tuple(NamedSharding(mesh, s) for s in fb_out_specs())

    def fb_partition(mesh, arg_infos, result_infos):
        shared_x = len(arg_infos[3].shape) == 2
        arg_sh = tuple(NamedSharding(mesh, s) for s in _specs(shared_x))
        out_sh = tuple(NamedSharding(mesh, s) for s in fb_out_specs())

        def impl(h, w, b, x):
            (s, m), dh, dw, db = recon_pallas._fwdbwd_call(
                h, w, b, x, thr, with_mism)
            ps = lambda t: _psum(t, batch_axes)
            return ps(s), ps(m), dh, ps(dw), ps(db)

        return mesh, impl, out_sh, arg_sh

    def _fb_rule_for(shared_x):
        return SdyShardingRule(
            operand_mappings=_rule(shared_x),
            result_mappings=(("a",), ("a",), ("a", "b", "f"),
                             ("a", "f", "d"), ("a", "d")))

    # shardy rules depend on x's rank; def_partition once per call via a
    # tiny cache keyed on shared_x
    _defined = {}

    def _ensure(shared_x):
        if shared_x in _defined:
            return _defined[shared_x]
        f_cp = custom_partitioning(
            lambda h, w, b, x: recon_pallas._fwd(h, w, b, x, thr, with_mism))
        f_cp.def_partition(infer_sharding_from_operands=fwd_infer,
                           partition=fwd_partition,
                           sharding_rule=_fwd_rule_for(shared_x))
        fb_cp = custom_partitioning(
            lambda h, w, b, x: _flat5(recon_pallas._fwdbwd_call(
                h, w, b, x, thr, with_mism)))
        fb_cp.def_partition(infer_sharding_from_operands=fb_infer,
                           partition=fb_partition,
                           sharding_rule=_fb_rule_for(shared_x))
        _defined[shared_x] = (f_cp, fb_cp)
        return _defined[shared_x]

    @jax.custom_vjp
    def op(h, w, b, x):
        f_cp, _ = _ensure(x.ndim == 2)
        return f_cp(h, w, b, x)

    def op_fwd(h, w, b, x):
        """Fused loss+unscaled-gradients (per-arm-scalar cotangent →
        backward is a scale; recon_pallas._recon_fwd wiring, partitioned)."""
        _, fb_cp = _ensure(x.ndim == 2)
        s, m, dh, dw, db = fb_cp(h, w, b, x)
        tok = lambda t: jnp.zeros((0,), t.dtype)
        return (s, m), (dh, dw, db, tok(h), tok(w), tok(b), x[..., :0])

    def op_bwd(res, g):
        dh, dw, db, h_tok, w_tok, b_tok, x_tok = res
        g_sumsq, _ = g
        ga = g_sumsq.astype(jnp.float32)
        s3, s2 = ga[:, None, None], ga[:, None]
        return ((dh * s3).astype(h_tok.dtype), (dw * s3).astype(w_tok.dtype),
                (db * s2).astype(b_tok.dtype),
                jnp.zeros(x_tok.shape[:-1] + (dw.shape[-1],), x_tok.dtype))

    op.defvjp(op_fwd, op_bwd)
    return op


def _flat5(out):
    (s, m), dh, dw, db = out
    return s, m, dh, dw, db


# ---------------------------------------------------------------------------
# fused_dropout_fc1, partitioned
# ---------------------------------------------------------------------------

def make_partitioned_dropout_fc1(arm_axes, batch_axes, rate: float):
    """Build an SPMD-partitioned fused_dropout_fc1(seed, x, w, b[, mask]).

    Each shard offsets the PRNG seed by its flattened (arm, batch) shard
    index — the same static formula in forward and backward, so the
    regenerated backward mask is bitwise identical to the forward's.
    """
    arm_axes, batch_axes = _axes(arm_axes), _axes(batch_axes)
    a_s = arm_axes or None
    b_s = batch_axes or None
    keep = 1.0 - rate

    def _in_specs(shared_x, with_mask):
        x_spec = P(b_s, None) if shared_x else P(a_s, b_s, None)
        specs = (P(), x_spec, P(a_s, None, None), P(a_s, None))
        if with_mask:
            specs = specs + (P(a_s, b_s, None),)
        return specs

    def _local_seed(seed):
        off = _shard_offset(arm_axes + batch_axes)
        return seed + off * jnp.int32(_SEED_STRIDE)

    _defined = {}

    def _ensure(shared_x, with_mask):
        key = (shared_x, with_mask)
        if key in _defined:
            return _defined[key]

        x_map = ("b", "d") if shared_x else ("a", "b", "d")
        ins = ((), x_map, ("a", "d", "f"), ("a", "f"))
        if with_mask:
            ins = ins + (("a", "b", "d"),)

        def f_raw(seed, x, w, b, *mask):
            m = mask[0] if mask else None
            return encoder_pallas._fwd(seed, x, w, b, keep, m)

        f_cp = custom_partitioning(f_raw)

        def f_infer(mesh, arg_infos, result_infos):
            return NamedSharding(mesh, P(a_s, b_s, None))

        def f_partition(mesh, arg_infos, result_infos):
            arg_sh = tuple(NamedSharding(mesh, s)
                           for s in _in_specs(shared_x, with_mask))
            out_sh = NamedSharding(mesh, P(a_s, b_s, None))

            def impl(seed, x, w, b, *mask):
                m = mask[0] if mask else None
                return encoder_pallas._fwd(_local_seed(seed), x, w, b,
                                           keep, m)

            return mesh, impl, out_sh, arg_sh

        f_cp.def_partition(
            infer_sharding_from_operands=f_infer,
            partition=f_partition,
            sharding_rule=SdyShardingRule(operand_mappings=ins,
                                          result_mappings=(("a", "b", "f"),)))

        def b_raw(seed, x, g, *mask):
            m = mask[0] if mask else None
            return encoder_pallas._bwd_call(seed, x, g, keep, m,
                                            x.shape[-1], g.shape[-1])

        b_cp = custom_partitioning(b_raw)

        def b_infer(mesh, arg_infos, result_infos):
            return (NamedSharding(mesh, P(a_s, None, None)),
                    NamedSharding(mesh, P(a_s, None)))

        def b_partition(mesh, arg_infos, result_infos):
            x_spec = P(b_s, None) if shared_x else P(a_s, b_s, None)
            arg_sh = (NamedSharding(mesh, P()),
                      NamedSharding(mesh, x_spec),
                      NamedSharding(mesh, P(a_s, b_s, None)))
            if with_mask:
                arg_sh = arg_sh + (NamedSharding(mesh, P(a_s, b_s, None)),)
            out_sh = (NamedSharding(mesh, P(a_s, None, None)),
                      NamedSharding(mesh, P(a_s, None)))

            def impl(seed, x, g, *mask):
                m = mask[0] if mask else None
                dw, db = encoder_pallas._bwd_call(
                    _local_seed(seed), x, g, keep, m,
                    x.shape[-1], g.shape[-1])
                return _psum(dw, batch_axes), _psum(db, batch_axes)

            return mesh, impl, out_sh, arg_sh

        ins_b = ((), x_map, ("a", "b", "f"))
        if with_mask:
            ins_b = ins_b + (("a", "b", "d"),)
        b_cp.def_partition(
            infer_sharding_from_operands=b_infer,
            partition=b_partition,
            sharding_rule=SdyShardingRule(
                operand_mappings=ins_b,
                result_mappings=(("a", "d", "f"), ("a", "f"))))

        _defined[key] = (f_cp, b_cp)
        return _defined[key]

    @jax.custom_vjp
    def op(seed, x, w, b, mask=None):
        f_cp, _ = _ensure(x.ndim == 2, mask is not None)
        args = (seed, x, w, b) + ((mask,) if mask is not None else ())
        return f_cp(*args)

    def op_fwd(seed, x, w, b, mask=None):
        f_cp, _ = _ensure(x.ndim == 2, mask is not None)
        args = (seed, x, w, b) + ((mask,) if mask is not None else ())
        return f_cp(*args), (seed, x, mask, jnp.zeros((0,), w.dtype))

    def op_bwd(res, g):
        seed, x, mask, w_dtype = res
        _, b_cp = _ensure(x.ndim == 2, mask is not None)
        args = (seed, x, g) + ((mask,) if mask is not None else ())
        dw, db = b_cp(*args)
        dmask = None if mask is None else jnp.zeros_like(mask)
        return (None, jnp.zeros_like(x), dw.astype(w_dtype.dtype),
                db.astype(w_dtype.dtype), dmask)

    op.defvjp(op_fwd, op_bwd)
    return op


# ---------------------------------------------------------------------------
# fused_zinb, partitioned
# ---------------------------------------------------------------------------

def make_partitioned_zinb(arm_axes, batch_axes, eps: float = 1e-6):
    """Build an SPMD-partitioned fused_zinb(h, w_r, b_r, w_p, b_p, w_z,
    b_z, x) → (A,) loss sums; same layout discipline as
    make_partitioned_recon (per-arm sums psum'ed over the batch axes)."""
    arm_axes, batch_axes = _axes(arm_axes), _axes(batch_axes)
    a_s = arm_axes or None
    b_s = batch_axes or None

    def _in_specs(shared_x):
        x_spec = P(b_s, None) if shared_x else P(a_s, b_s, None)
        w, b = P(a_s, None, None), P(a_s, None)
        return (P(a_s, b_s, None), w, b, w, b, w, b, x_spec)

    def _maps(shared_x):
        x_map = ("b", "d") if shared_x else ("a", "b", "d")
        w, b = ("a", "f", "d"), ("a", "d")
        return (("a", "b", "f"), w, b, w, b, w, b, x_map)

    _defined = {}

    def _ensure(shared_x):
        if shared_x in _defined:
            return _defined[shared_x]

        def f_raw(h, wr, br, wp, bp, wz, bz, k):
            return zinb_pallas._fwd(h, ((wr, br), (wp, bp), (wz, bz)), k,
                                    eps)

        f_cp = custom_partitioning(f_raw)

        def f_infer(mesh, arg_infos, result_infos):
            return NamedSharding(mesh, P(a_s))

        def f_partition(mesh, arg_infos, result_infos):
            arg_sh = tuple(NamedSharding(mesh, s)
                           for s in _in_specs(shared_x))
            out_sh = NamedSharding(mesh, P(a_s))

            def impl(h, wr, br, wp, bp, wz, bz, k):
                s = zinb_pallas._fwd(h, ((wr, br), (wp, bp), (wz, bz)), k,
                                     eps)
                return _psum(s, batch_axes)

            return mesh, impl, out_sh, arg_sh

        f_cp.def_partition(
            infer_sharding_from_operands=f_infer,
            partition=f_partition,
            sharding_rule=SdyShardingRule(operand_mappings=_maps(shared_x),
                                          result_mappings=(("a",),)))

        # --- fused loss+gradient primitive (training path; see
        # zinb_pallas._fwdbwd_kernel): loss psum'ed over the batch axes,
        # unscaled dW/db likewise, dh stays batch-local ---
        def fb_raw(h, wr, br, wp, bp, wz, bz, k):
            loss, dh, (dwr, dbr), (dwp, dbp), (dwz, dbz) = \
                zinb_pallas._fwdbwd_call(
                    h, ((wr, br), (wp, bp), (wz, bz)), k, eps)
            return loss, dh, dwr, dbr, dwp, dbp, dwz, dbz

        fb_cp = custom_partitioning(fb_raw)
        fb_out_specs = ((P(a_s),) + (P(a_s, b_s, None),)
                        + (P(a_s, None, None), P(a_s, None)) * 3)

        def fb_infer(mesh, arg_infos, result_infos):
            return tuple(NamedSharding(mesh, s) for s in fb_out_specs)

        def fb_partition(mesh, arg_infos, result_infos):
            arg_sh = tuple(NamedSharding(mesh, s)
                           for s in _in_specs(shared_x))
            out_sh = tuple(NamedSharding(mesh, s) for s in fb_out_specs)

            def impl(h, wr, br, wp, bp, wz, bz, k):
                loss, dh, (dwr, dbr), (dwp, dbp), (dwz, dbz) = \
                    zinb_pallas._fwdbwd_call(
                        h, ((wr, br), (wp, bp), (wz, bz)), k, eps)
                ps = lambda t: _psum(t, batch_axes)
                return (ps(loss), dh, ps(dwr), ps(dbr), ps(dwp), ps(dbp),
                        ps(dwz), ps(dbz))

            return mesh, impl, out_sh, arg_sh

        fb_cp.def_partition(
            infer_sharding_from_operands=fb_infer,
            partition=fb_partition,
            sharding_rule=SdyShardingRule(
                operand_mappings=_maps(shared_x),
                result_mappings=(("a",), ("a", "b", "f"),
                                 ("a", "f", "d"), ("a", "d"),
                                 ("a", "f", "d"), ("a", "d"),
                                 ("a", "f", "d"), ("a", "d"))))
        _defined[shared_x] = (f_cp, fb_cp)
        return _defined[shared_x]

    @jax.custom_vjp
    def op(h, w_r, b_r, w_p, b_p, w_z, b_z, x):
        f_cp, _ = _ensure(x.ndim == 2)
        return f_cp(h, w_r, b_r, w_p, b_p, w_z, b_z,
                    zinb_pallas._counts(x))

    def op_fwd(h, w_r, b_r, w_p, b_p, w_z, b_z, x):
        """Fused loss+unscaled-gradients in one pass (the per-arm-scalar
        cotangent reduces the backward to scaling) — same wiring as
        zinb_pallas._op_fwd, through the partitioned primitive."""
        _, fb_cp = _ensure(x.ndim == 2)
        k = zinb_pallas._counts(x)
        heads = (w_r, b_r, w_p, b_p, w_z, b_z)
        loss, dh, dwr, dbr, dwp, dbp, dwz, dbz = fb_cp(h, *heads, k)
        tok = lambda t: jnp.zeros((0,), t.dtype)
        return loss, (dh, dwr, dbr, dwp, dbp, dwz, dbz, tok(h),
                      tuple(tok(t) for t in heads), x[..., :0])

    def op_bwd(res, g):
        dh, dwr, dbr, dwp, dbp, dwz, dbz, h_tok, head_toks, x_tok = res
        ga = g.astype(jnp.float32)
        s3, s2 = ga[:, None, None], ga[:, None]
        c = lambda t, like: t.astype(like.dtype)
        return (c(dh * s3, h_tok), c(dwr * s3, head_toks[0]),
                c(dbr * s2, head_toks[1]), c(dwp * s3, head_toks[2]),
                c(dbp * s2, head_toks[3]), c(dwz * s3, head_toks[4]),
                c(dbz * s2, head_toks[5]),
                jnp.zeros(x_tok.shape[:-1] + (dwr.shape[-1],), x_tok.dtype))

    op.defvjp(op_fwd, op_bwd)
    return op
