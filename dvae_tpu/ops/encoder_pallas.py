"""Fused Pallas TPU kernel: per-arm input dropout + encoder input layer fc1,
without materializing the dropped (A, B, D) input views.

The reference applies 0.5 input dropout then the D→F input Linear per arm
(mmidas/nn_model.py:208-255, :263-269).  The straightforward XLA pipeline
materializes the dropped per-arm views in HBM — written once, read by the
fc1 matmul, and read again by the fc1 weight-gradient matmul: ~750 MB/step
at the production shape (A=5, B=5000, D=5032, bf16), the largest remaining
HBM tensor once the reconstruction side is fused (ops/recon_pallas.py).

This kernel computes, per arm,

    y1_a = (x ⊙ mask_a / keep) @ W1_a + b1_a        (pre-ReLU, (B, F))

with the Bernoulli mask generated **on-chip** (pltpu.prng_random_bits) from
a per-(arm, tile) seed.  The backward kernel re-seeds the same PRNG and
regenerates the identical mask, so the dropped input never exists in HBM
in either pass:

    dW1_a = (x ⊙ mask_a / keep)ᵀ @ g_a,   db1_a = Σ_rows g_a

(the cotangent w.r.t. x is not needed — x is input data).  Like the Gumbel
kernel (ops/gumbel_pallas.py) the mask distribution matches jax.random's,
not its bitstream; ``mask`` can be supplied explicitly for exact-oracle
tests, and must be supplied in interpret mode (CPU) — use
``dropout_mask_host`` — keeping fwd/bwd consistent everywhere.

``x`` may be (B, D) — shared across arms, the no-augmentation case — or
per-arm (A, B, D).  Arms ride the inner grid dimension in both passes so a
shared x tile is DMA'd once for all arms; the backward keeps the whole
(A, D, F) dW accumulator resident in VMEM (a full-array output block with
no index map is never flushed mid-kernel, so the accumulation is safe even
though arms interleave).
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


def _dropped_tile(x_ref, mask_ref, seed_ref, a, i_b, nb, keep):
    """(x ⊙ mask / keep) for one tile; mask from the per-(arm, tile) seed.

    The keep test is a pure integer compare on the raw PRNG bits (31
    uniform bits vs a precomputed threshold) — no float conversion; the
    VPU epilogue, not the matmul, is this kernel's bottleneck."""
    x = x_ref[:] if x_ref.ndim == 2 else x_ref[0]
    if mask_ref is not None:  # explicit mask wins even at rate 0
        m = mask_ref[0] > 0.5  # float mask: v5e has no int8 vector compare
    elif keep >= 1.0:
        return x  # rate 0: exact identity (the integer threshold below
        #           would drop ~1 in 2^31 elements)
    else:
        pltpu.prng_seed(seed_ref[0] + a * nb + i_b)
        bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.int32)
        thr = min(int(keep * (1 << 31)), (1 << 31) - 1)
        m = (bits & 0x7fffffff) < thr
    return jnp.where(m, x * jnp.asarray(1.0 / keep, x.dtype), 0.0)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, x_ref, w_ref, b_ref, mask_ref, y_ref, *, nb, keep):
    i_b = pl.program_id(0)
    a = pl.program_id(1)
    xd = _dropped_tile(x_ref, mask_ref, seed_ref, a, i_b, nb, keep)
    y = jax.lax.dot_general(
        xd, w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y_ref[0] = (y + b_ref[0, 0].astype(jnp.float32)).astype(y_ref.dtype)


def _fwd(seed, x, w, b, keep, mask):
    A, D, F = w.shape
    B = x.shape[-2]
    shared_x = x.ndim == 2
    tb = _tile_b(B)
    nb = pl.cdiv(B, tb)
    # arms innermost: a shared x tile is DMA'd once per i_b, reused for all A
    x_spec = (pl.BlockSpec((tb, D), lambda i, a: (i, 0),
                           memory_space=pltpu.VMEM) if shared_x else
              pl.BlockSpec((1, tb, D), lambda i, a: (a, i, 0),
                           memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        x_spec,
        pl.BlockSpec((1, D, F), lambda i, a: (a, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, F), lambda i, a: (a, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.atleast_1d(seed).astype(jnp.int32), x, w, b[:, None, :]]
    impl = functools.partial(_fwd_kernel, nb=nb, keep=keep)
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, tb, D), lambda i, a: (a, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.float32))
        kern = lambda s, xr, wr, br, mr, yr: impl(s, xr, wr, br, mr, yr)
    else:
        kern = lambda s, xr, wr, br, yr: impl(s, xr, wr, br, None, yr)
    return pl.pallas_call(
        kern,
        grid=(nb, A),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tb, F), lambda i, a: (a, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, B, F), x.dtype),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(seed_ref, x_ref, g_ref, mask_ref, dw_ref, db_ref, *, nb,
                keep, tile_b, n_rows):
    i_b = pl.program_id(0)
    a = pl.program_id(1)
    xd = _dropped_tile(x_ref, mask_ref, seed_ref, a, i_b, nb, keep)
    has_edge = (n_rows % tile_b) != 0  # static

    @pl.when(jnp.logical_and(i_b == 0, a == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    def accumulate(xd, g):
        dw_ref[a] += jax.lax.dot_general(
            xd, g.astype(xd.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),   # xdᵀ @ g
            preferred_element_type=jnp.float32,
        )
        db_ref[a, 0] += jnp.sum(g.astype(jnp.float32), axis=0)

    # interior tiles skip the row mask; the partial edge tile masks BOTH
    # dot operands — buffer rows beyond n_rows are garbage (possibly NaN,
    # and NaN·0 = NaN) and must not reach the dW/db accumulators
    @pl.when(jnp.logical_or(i_b < nb - 1, not has_edge))
    def _():
        accumulate(xd, g_ref[0])

    if has_edge:
        @pl.when(i_b == nb - 1)
        def _():
            rows = _row_valid(i_b, xd.shape, tile_b, n_rows)
            rows_g = _row_valid(i_b, g_ref[0].shape, tile_b, n_rows)
            accumulate(jnp.where(rows, xd, 0),
                       jnp.where(rows_g, g_ref[0], 0))


def _bwd_call(seed, x, g, keep, mask, D, F):
    A = g.shape[0]
    B = x.shape[-2]
    shared_x = x.ndim == 2
    tb = _tile_b(B)
    nb = pl.cdiv(B, tb)
    x_spec = (pl.BlockSpec((tb, D), lambda i, a: (i, 0),
                           memory_space=pltpu.VMEM) if shared_x else
              pl.BlockSpec((1, tb, D), lambda i, a: (a, i, 0),
                           memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        x_spec,
        pl.BlockSpec((1, tb, F), lambda i, a: (a, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.atleast_1d(seed).astype(jnp.int32), x, g]
    impl = functools.partial(_bwd_kernel, nb=nb, keep=keep, tile_b=tb,
                             n_rows=B)
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, tb, D), lambda i, a: (a, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.float32))
        kern = lambda s, xr, gr, mr, dwr, dbr: impl(s, xr, gr, mr, dwr, dbr)
    else:
        kern = lambda s, xr, gr, dwr, dbr: impl(s, xr, gr, None, dwr, dbr)
    # full-array output blocks (no index map): the (A, D, F) dW accumulator
    # stays resident in VMEM for the whole kernel (~10 MB f32 at production
    # shape), so arms can interleave on the inner grid axis and the shared
    # x tile is still DMA'd once per i_b
    dw, db = pl.pallas_call(
        kern,
        grid=(nb, A),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((A, D, F), jnp.float32),
            jax.ShapeDtypeStruct((A, 1, F), jnp.float32),
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)
    return dw, db[:, 0, :]


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_dropout_fc1(seed, x, w, b, rate: float, mask=None):
    """Pre-activation fc1 output of all arms with fused input dropout.

    Args:
      seed: int32 scalar; the per-(arm, tile) PRNG seeds derive from it.
      x: (B, D) shared batch or (A, B, D) per-arm (augmented) views.
      w: (A, D, F) fc1 weights.  b: (A, F) fc1 bias.
      rate: dropout probability (reference x_drop, nn_model.py:23).
      mask: optional explicit {0,1} keep-mask (A, B, D) — exact-oracle
        tests; REQUIRED on CPU (interpret mode), see ``dropout_mask_host``.

    Returns:
      (A, B, F) pre-ReLU activations (x⊙mask/keep) @ W + b, in x.dtype.
    """
    return _fwd(seed, x, w, b, 1.0 - rate, mask)


def _op_fwd(seed, x, w, b, rate, mask=None):
    # a 0-size array carries w's dtype into the bwd (cotangents must match
    # the primal dtypes under bf16 compute)
    res = (seed, x, mask, w.shape, jnp.zeros((0,), w.dtype))
    return _fwd(seed, x, w, b, 1.0 - rate, mask), res


def _op_bwd(rate, res, g):
    seed, x, mask, (A, D, F), w_dtype = res
    dw, db = _bwd_call(seed, x, g, 1.0 - rate, mask, D, F)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (None, jnp.zeros_like(x), dw.astype(w_dtype.dtype),
            db.astype(w_dtype.dtype), dmask)


fused_dropout_fc1.defvjp(_op_fwd, _op_bwd)


def dropout_mask_host(seed, shape, rate: float):
    """Host-side (jax.random) keep-mask for interpret mode / tests — the
    kernel's in-chip PRNG is TPU-only."""
    key = jax.random.key(jnp.asarray(seed, jnp.int32).reshape(()))
    return jax.random.bernoulli(key, 1.0 - rate, shape)


def dropout_fc1_reference(x, w, b, rate: float, mask):
    """XLA oracle: materializes the dropped views (testing only)."""
    A = w.shape[0]
    if x.ndim == 2:
        x = jnp.broadcast_to(x, (A,) + x.shape)
    keep = 1.0 - rate
    xd = jnp.where(mask > 0, x * jnp.asarray(1.0 / keep, x.dtype),
                   0.0).astype(x.dtype)
    return (jnp.einsum("abd,adf->abf", xd, w,
                       preferred_element_type=jnp.float32)
            + b[:, None, :].astype(jnp.float32)).astype(x.dtype)
