"""Fused Pallas TPU kernel: decoder output layer + ReLU + MSE reconstruction
loss, without materializing the (A, B, D) reconstruction.

The MSE reconstruction path (reference mmidas/nn_model.py:277-295 fc11 +
:542-546 ``recon_loss``) is the dominant HBM-traffic term of a training
step at the production shape (A=5, B=5000, D=5032): the unfused pipeline
writes x_rec (252 MB bf16), reads it back in the loss, writes the (A, B, D)
loss cotangent, and reads it twice in the fc11 backward — ~1.4 GB of the
5.7 GB step traffic.  This kernel computes, per arm,

    sumsq_a = Σ_{b,d} (relu(h_a @ W_a + bias_a) − x_a)²
    mism_a  = Σ_{b,d} [binarize(relu(...)) ≠ binarize(x_a)]

streaming over (B, D) tiles: the reconstruction lives only in VMEM.  The
``mism`` count makes the reference's binarized-BCE regularization *metric*
free: torch ``binary_cross_entropy`` on hard {0,1} inputs with its −100 log
clamp is exactly ``100 · mean(p ≠ t)`` (reference mmidas/nn_model.py:39-40,
:544-545 — the term carries zero gradient there too, see
models/losses.recon_loss_mse).

Backward (custom_vjp) recomputes each tile and emits dh/dW/db directly —
the (A, B, D) cotangent is never formed:

    gm  = g_a · 2 · 1[y > 0] · (relu(y) − x)      (in VMEM only)
    dh  = gm @ W_aᵀ,   dW = hᵀ @ gm,   db = Σ_rows gm

``x`` may be (B, D) — the no-augmentation case where every arm reconstructs
the same batch (reference ``x.expand(A,-1,-1)``, cpl_mixvae.py:433-436) —
or per-arm (A, B, D).  In the shared case the forward grid iterates arms
innermost so each x tile is DMA'd once, not A times.

Partial edge blocks (B % TILE_B ≠ 0) are handled by masking with the row
index — garbage rows in the block buffer are routed through ``where`` so
they contribute exactly zero (never multiplied, so NaNs cannot leak).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvae_tpu.ops._common import (compiler_params as _params,
                                  interpret as _interpret,
                                  row_valid as _row_valid,
                                  tile_rows)

_TILE_B = 512


def _tile_b(B: int) -> int:
    return tile_rows(B, _TILE_B)


def _tile_recon_f32(h_ref, w_ref, b_ref):
    """relu(h @ W + bias) for one (TILE_B, D) tile, f32 accumulation."""
    y = jax.lax.dot_general(
        h_ref[0], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(y + b_ref[0].astype(jnp.float32))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(h_ref, w_ref, b_ref, x_ref, out_ref, *, tile_b, n_rows, thr,
                shared_x, with_mism):
    i_b = pl.program_id(0)
    a = pl.program_id(1)
    nb = pl.num_programs(0)
    r = _tile_recon_f32(h_ref, w_ref, b_ref)
    x = (x_ref[:] if shared_x else x_ref[0]).astype(jnp.float32)
    has_edge = (n_rows % tile_b) != 0  # static

    @pl.when(i_b == 0)
    def _():
        out_ref[a, 0] = 0.0
        out_ref[a, 1] = 0.0

    def accumulate(e, mism):
        out_ref[a, 0] += jnp.sum(e * e)
        if with_mism:
            out_ref[a, 1] += jnp.sum(mism.astype(jnp.float32))

    # interior tiles skip the row-validity mask entirely (VPU epilogue is
    # the kernel's bottleneck, not the matmul)
    @pl.when(jnp.logical_or(i_b < nb - 1, not has_edge))
    def _():
        accumulate(r - x, ((r > thr) != (x > thr)) if with_mism else None)

    if has_edge:
        @pl.when(i_b == nb - 1)
        def _():
            valid = _row_valid(i_b, r.shape, tile_b, n_rows)
            e = jnp.where(valid, r - x, 0.0)
            mism = (jnp.logical_and(valid, (r > thr) != (x > thr))
                    if with_mism else None)
            accumulate(e, mism)


def _fwd(h, w, b, x, thr, with_mism=True):
    A, B, F = h.shape
    D = w.shape[-1]
    shared_x = x.ndim == 2
    tb = _tile_b(B)
    nb = pl.cdiv(B, tb)
    # arms innermost: a shared x tile is DMA'd once per i_b, reused for all A
    x_spec = (pl.BlockSpec((tb, D), lambda i, a: (i, 0),
                           memory_space=pltpu.VMEM) if shared_x else
              pl.BlockSpec((1, tb, D), lambda i, a: (a, i, 0),
                           memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_b=tb, n_rows=B, thr=thr,
                          shared_x=shared_x, with_mism=with_mism),
        grid=(nb, A),
        in_specs=[
            pl.BlockSpec((1, tb, F), lambda i, a: (a, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, D), lambda i, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((A, 2), jnp.float32),
        compiler_params=_params(),
        interpret=_interpret(),
    )(h, w, b[:, None, :], x)
    return out[:, 0], out[:, 1]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(g_ref, h_ref, w_ref, b_ref, x_ref, dh_ref, dw_ref, db_ref, *,
                tile_b, n_rows, shared_x):
    a = pl.program_id(0)
    i_b = pl.program_id(1)
    nb = pl.num_programs(1)
    r = _tile_recon_f32(h_ref, w_ref, b_ref)
    x = (x_ref[:] if shared_x else x_ref[0]).astype(jnp.float32)
    has_edge = (n_rows % tile_b) != 0  # static

    @pl.when(i_b == 0)
    def _():
        dw_ref[0] = jnp.zeros_like(dw_ref[0])
        db_ref[0] = jnp.zeros_like(db_ref[0])

    def accumulate(gm, h):
        # d sumsq/dy through the ReLU gate; g_a scales the per-arm cotangent
        gm16 = gm.astype(h_ref.dtype)
        dh_ref[0] = jax.lax.dot_general(
            gm16, w_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),   # gm @ Wᵀ
            preferred_element_type=jnp.float32,
        )
        dw_ref[0] += jax.lax.dot_general(
            h, gm16,
            dimension_numbers=(((0,), (0,)), ((), ())),   # hᵀ @ gm
            preferred_element_type=jnp.float32,
        )
        db_ref[0] += jnp.sum(gm, axis=0)

    # interior tiles skip the row mask (the VPU epilogue dominates); the
    # partial edge tile masks BOTH dot operands — its buffer rows beyond
    # n_rows are garbage and could be NaN (NaN·0 = NaN)
    @pl.when(jnp.logical_or(i_b < nb - 1, not has_edge))
    def _():
        accumulate(jnp.where(r > 0.0, 2.0 * g_ref[a] * (r - x), 0.0),
                   h_ref[0])

    if has_edge:
        @pl.when(i_b == nb - 1)
        def _():
            valid = _row_valid(i_b, r.shape, tile_b, n_rows)
            gate = jnp.logical_and(valid, r > 0.0)
            gm = jnp.where(gate, 2.0 * g_ref[a] * (r - x), 0.0)
            rows_h = _row_valid(i_b, h_ref[0].shape, tile_b, n_rows)
            accumulate(gm, jnp.where(rows_h, h_ref[0], 0))


def _bwd_call(g, h, w, b, x):
    A, B, F = h.shape
    D = w.shape[-1]
    shared_x = x.ndim == 2
    tb = _tile_b(B)
    nb = pl.cdiv(B, tb)
    # arms outermost: dW/db output blocks are revisited in *consecutive*
    # grid steps (the accumulation contract); W is DMA'd once per arm
    x_spec = (pl.BlockSpec((tb, D), lambda a, i: (i, 0),
                           memory_space=pltpu.VMEM) if shared_x else
              pl.BlockSpec((1, tb, D), lambda a, i: (a, i, 0),
                           memory_space=pltpu.VMEM))
    dh, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_b=tb, n_rows=B,
                          shared_x=shared_x),
        grid=(A, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tb, F), lambda a, i: (a, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, D), lambda a, i: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda a, i: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, tb, F), lambda a, i: (a, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, D), lambda a, i: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda a, i: (a, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((A, B, F), jnp.float32),
            jax.ShapeDtypeStruct((A, F, D), jnp.float32),
            jax.ShapeDtypeStruct((A, 1, D), jnp.float32),
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(g.astype(jnp.float32), h, w, b[:, None, :], x)
    return dh, dw, db[:, 0, :]


# ---------------------------------------------------------------------------
# Fused forward+backward (training path)
# ---------------------------------------------------------------------------

def _fwdbwd_kernel(h_ref, w_ref, b_ref, x_ref, out_ref, dh_ref, dw_ref,
                   db_ref, *, tile_b, n_rows, thr, shared_x, with_mism):
    """ONE pass: per-arm (sumsq, mism) AND the unscaled gradients (cotangent
    1.0 on each arm's sumsq).  Both outputs are per-arm scalars, so the true
    cotangent is a scalar the custom-vjp backward applies as a multiply —
    the separate backward's full recompute (the h@W matmul, the ReLU
    epilogue, and an A·|x| re-read of the shared target) disappears.

    Grid (nb, A), arms innermost: a shared x tile is DMA'd once per i_b.
    The dW/db accumulator blocks are therefore revisited NON-consecutively
    (flushed/reloaded at each arm switch) — 2·nb·A·|W| ≈ 40 MB of extra
    DMA at the production shape vs the ~250 MB of x re-reads it avoids."""
    i_b = pl.program_id(0)
    a = pl.program_id(1)
    nb = pl.num_programs(0)
    r = _tile_recon_f32(h_ref, w_ref, b_ref)
    x = (x_ref[:] if shared_x else x_ref[0]).astype(jnp.float32)
    has_edge = (n_rows % tile_b) != 0  # static

    @pl.when(i_b == 0)
    def _():
        out_ref[a, 0] = 0.0
        out_ref[a, 1] = 0.0
        dw_ref[0] = jnp.zeros_like(dw_ref[0])
        db_ref[0] = jnp.zeros_like(db_ref[0])

    def accumulate(e, mism, h):
        out_ref[a, 0] += jnp.sum(e * e)
        if with_mism:
            out_ref[a, 1] += jnp.sum(mism.astype(jnp.float32))
        gm = jnp.where(r > 0.0, 2.0 * e, 0.0)   # e is 0 on masked rows
        gm16 = gm.astype(h_ref.dtype)
        dh_ref[0] = jax.lax.dot_general(
            gm16, w_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),   # gm @ Wᵀ
            preferred_element_type=jnp.float32,
        )
        dw_ref[0] += jax.lax.dot_general(
            h, gm16,
            dimension_numbers=(((0,), (0,)), ((), ())),   # hᵀ @ gm
            preferred_element_type=jnp.float32,
        )
        db_ref[0] += jnp.sum(gm, axis=0)

    @pl.when(jnp.logical_or(i_b < nb - 1, not has_edge))
    def _():
        accumulate(r - x, ((r > thr) != (x > thr)) if with_mism else None,
                   h_ref[0])

    if has_edge:
        @pl.when(i_b == nb - 1)
        def _():
            valid = _row_valid(i_b, r.shape, tile_b, n_rows)
            e = jnp.where(valid, r - x, 0.0)
            mism = (jnp.logical_and(valid, (r > thr) != (x > thr))
                    if with_mism else None)
            rows_h = _row_valid(i_b, h_ref[0].shape, tile_b, n_rows)
            accumulate(e, mism, jnp.where(rows_h, h_ref[0], 0))


def _fwdbwd_call(h, w, b, x, thr, with_mism):
    """((sumsq, mism), dh, dw, db) — gradients unscaled (g = 1)."""
    A, B, F = h.shape
    D = w.shape[-1]
    shared_x = x.ndim == 2
    tb = _tile_b(B)
    nb = pl.cdiv(B, tb)
    x_spec = (pl.BlockSpec((tb, D), lambda i, a: (i, 0),
                           memory_space=pltpu.VMEM) if shared_x else
              pl.BlockSpec((1, tb, D), lambda i, a: (a, i, 0),
                           memory_space=pltpu.VMEM))
    out, dh, dw, db = pl.pallas_call(
        functools.partial(_fwdbwd_kernel, tile_b=tb, n_rows=B, thr=thr,
                          shared_x=shared_x, with_mism=with_mism),
        grid=(nb, A),
        in_specs=[
            pl.BlockSpec((1, tb, F), lambda i, a: (a, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, D), lambda i, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tb, F), lambda i, a: (a, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, D), lambda i, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((A, 2), jnp.float32),
            jax.ShapeDtypeStruct((A, B, F), jnp.float32),
            jax.ShapeDtypeStruct((A, F, D), jnp.float32),
            jax.ShapeDtypeStruct((A, 1, D), jnp.float32),
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(h, w, b[:, None, :], x)
    return (out[:, 0], out[:, 1]), dh, dw, db[:, 0, :]


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_recon_mse(h, w, b, x, thr: float = 0.1, with_mism: bool = True):
    """Per-arm (sumsq, mismatch_count) of relu(h @ W + bias) against x.

    Args:
      h: (A, B, F) decoder pre-output hidden activations.
      w: (A, F, D) fc11 weights.  b: (A, D) fc11 bias.
      x: (B, D) shared target or (A, B, D) per-arm (augmented) targets.
      thr: binarization threshold (reference nn_model.py:542).

    Returns:
      sumsq: (A,) f32  Σ(relu(hW+b) − x)²  — 0.5·sumsq/B is the MSE term.
      mism:  (A,) f32  #{binarize(rec) ≠ binarize(x)} — 100·mism/(B·D) is
             the reference's binarized-BCE metric term (zero-gradient).
    """
    return _fwd(h, w, b, x, thr, with_mism)


def _recon_fwd(h, w, b, x, thr, with_mism):
    """vjp-forward = the fused loss+gradient kernel (``_fwdbwd_kernel``);
    the backward scales the stashed unscaled gradients by the per-arm
    scalar cotangent.  Value-only (eval) calls run the primal body's
    forward kernel instead."""
    out, dh, dw, db = _fwdbwd_call(h, w, b, x, thr, with_mism)
    tok = lambda t: jnp.zeros((0,), t.dtype)
    return out, (dh, dw, db, tok(h), tok(w), tok(b), x[..., :0])


def _recon_bwd(thr, with_mism, res, g):
    dh, dw, db, h_tok, w_tok, b_tok, x_tok = res
    g_sumsq, _ = g  # the mismatch count is a stop-gradient metric
    ga = g_sumsq.astype(jnp.float32)
    s3, s2 = ga[:, None, None], ga[:, None]
    return (( dh * s3).astype(h_tok.dtype), (dw * s3).astype(w_tok.dtype),
            (db * s2).astype(b_tok.dtype),
            jnp.zeros(x_tok.shape[:-1] + (dw.shape[-1],), x_tok.dtype))


fused_recon_mse.defvjp(_recon_fwd, _recon_bwd)


def recon_mse_reference(h, w, b, x, thr: float = 0.1):
    """XLA oracle: materializes the reconstruction (testing only)."""
    r = jax.nn.relu(jnp.einsum("abf,afd->abd", h, w,
                               preferred_element_type=jnp.float32)
                    + b[:, None, :].astype(jnp.float32))
    x = x.astype(jnp.float32)
    sumsq = jnp.sum((r - x) ** 2, axis=(1, 2))
    mism = jnp.sum(((r > thr) != (x > thr)).astype(jnp.float32), axis=(1, 2))
    return sumsq, mism
