"""Fused Pallas TPU kernel: the ENTIRE MSE decoder — trunk fc6..fc10, output
layer fc11, ReLU chain, and the reconstruction loss — in one tile pass.

Extends ops/recon_pallas.py (fc11 + loss only) upward through the decoder
trunk (reference mmidas/nn_model.py:277-295 ``_decode``: five Linear+ReLU
layers).  The trunk activations are only (B, F≈100) — ~1 MB per layer at the
production shape — so the whole chain is VMEM-resident: the five XLA
matmul+ReLU fusions, their ten backward matmul/select fusions, and every
(A, B, F) HBM round trip between them disappear.  Per (TILE_B, ·) tile:

    h₁ = relu(z @ W₆ + b₆)        z = [c_smp, dropout(s_smp)]  (B, C+S)
    h₂ = relu(h₁ @ W₇ + b₇) … h₅ = relu(h₄ @ W₁₀ + b₁₀)
    r  = relu(h₅ @ W₁₁ + b₁₁)

(widths are read off the weight shapes — the trunk is not uniform:
fc6: C+S→L, fc7: L→F, fc8..fc10: F→F, mmidas/nn_model.py:212-218)
    sumsq += Σ (r − x)²,   mism += Σ [binarize(r) ≠ binarize(x)]

and — because both outputs are per-arm scalar sums, so the eventual
cotangent is a per-arm scalar — the SAME pass immediately backpropagates
with cotangent 1 (the custom-vjp backward is a scalar multiply):

    gm₁₁ = 2·1[r>0]·(r − x)                     (VMEM only)
    dW₁₁ += h₅ᵀgm₁₁,  db₁₁ += Σgm₁₁,  g₅ = 1[h₅>0]·(gm₁₁W₁₁ᵀ)
    … per trunk layer:  dWᵢ += hᵢ₋₁ᵀgᵢ,  dbᵢ += Σgᵢ,  gᵢ₋₁ = gate·(gᵢWᵢᵀ)
    dz = g₁ @ W₆ᵀ

No residual stash, no recompute: the forward activations are still live in
VMEM when the backward needs them.  Matmuls accumulate f32 on the MXU and
cast back to the input dtype between layers, mirroring the XLA bf16 chain.

``x`` may be (B, D) (shared target) or (A, B, D).  Partial edge tiles mask
the z rows (garbage/NaN in the block buffer) and the loss term; the zero
``gm₁₁`` rows then propagate zeros through the whole backward chain.

Grid (nb, A), arms innermost: a shared x tile is DMA'd once per i_b.  The
dW accumulators are constant-index full-(A,·,·) blocks that stay resident
in VMEM across the whole grid and flush once at the end (see the note at
``_fwdbwd_call``) — the trunk dWs are (F, F) ≈ 40 KB per arm, so the
residency costs little VMEM next to the (F, D) dW₁₁ the recon head already
pays, and there is no per-arm flush/reload DMA traffic.

Used on a single device or an arm-sharded mesh; under batch-sharded SPMD
the caller falls back to the fc11-only kernel (ops/partitioned.py handles
that path) — see train/step._fused_spmd_axes.

STATUS (measured v5e-1, 2026-08-17): at the production shape (A=5, B=5000,
F=100, D=5032) this kernel is SLOWER than the fc11-only fused_recon path —
3.62 vs 2.60 ms/step.  The trunk's 100-wide matmuls are too small for the
MXU to win over XLA's own matmul+ReLU fusions, and keeping all-arm weights
plus the (A, F, D) dW11 accumulator resident in VMEM starves the block
pipeline.  Kept as a tested opt-in (cfg.fused_decoder) because the
tradeoff flips at much larger fc_dim; the trainer does NOT auto-enable it.
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
N_TRUNK = 5  # fc6..fc10


def _tile_b(B: int) -> int:
    return tile_rows(B, _TILE_B)


def _dot(x, w):
    return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(g, w):
    """g @ Wᵀ."""
    return jax.lax.dot_general(g, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_acc(h, g):
    """hᵀ @ g."""
    return jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _forward_chain(z, a, trunk_refs, w11_ref, b11_ref):
    """(h_list, r): trunk activations (input dtype) and the f32 recon tile.

    Weight refs hold ALL arms (constant-index persistent blocks, DMA'd once
    for the whole grid); ``a`` selects this step's arm."""
    h = z
    hs = []
    for i in range(N_TRUNK):
        w_ref, b_ref = trunk_refs[2 * i], trunk_refs[2 * i + 1]
        y = _dot(h, w_ref[a]) + b_ref[a, 0].astype(jnp.float32)
        h = jax.nn.relu(y).astype(z.dtype)
        hs.append(h)
    r = jax.nn.relu(_dot(h, w11_ref[a]) + b11_ref[a, 0].astype(jnp.float32))
    return hs, r


# ---------------------------------------------------------------------------
# Forward (value-only: eval / primal calls)
# ---------------------------------------------------------------------------

def _fwd_kernel(z_ref, *refs, tile_b, n_rows, thr, shared_x, with_mism):
    trunk_refs = refs[:2 * N_TRUNK]
    w11_ref, b11_ref, x_ref, out_ref = refs[2 * N_TRUNK:]
    i_b = pl.program_id(0)
    a = pl.program_id(1)
    has_edge = (n_rows % tile_b) != 0  # static

    z = z_ref[0]
    if has_edge:
        # garbage rows of the partial edge block buffer may be NaN; zero
        # them BEFORE the chain (NaN·0 = NaN downstream otherwise)
        z = jnp.where(_row_valid(i_b, z.shape, tile_b, n_rows), z, 0)
    _, r = _forward_chain(z, a, trunk_refs, w11_ref, b11_ref)
    x = (x_ref[:] if shared_x else x_ref[0]).astype(jnp.float32)

    @pl.when(i_b == 0)
    def _():
        out_ref[a, 0] = 0.0
        out_ref[a, 1] = 0.0

    e = r - x
    mism = (r > thr) != (x > thr)
    if has_edge:
        valid = _row_valid(i_b, r.shape, tile_b, n_rows)
        e = jnp.where(valid, e, 0.0)
        mism = jnp.logical_and(valid, mism)
    out_ref[a, 0] += jnp.sum(e * e)
    if with_mism:
        out_ref[a, 1] += jnp.sum(mism.astype(jnp.float32))


def _specs(A, Z, layer_dims, D, tb, shared_x):
    """in_specs for (z, [w,b]×trunk, w11, b11, x), grid (nb, A) — arms
    innermost so a shared x tile is DMA'd once per i_b.

    All weights/biases are FULL (A, ·, ·) blocks with a CONSTANT index map:
    the pipeline fetches them exactly once for the whole grid instead of
    re-DMA-ing a per-arm block every step (the arm block index changes on
    every grid step with arms innermost — measured as the dominant traffic
    of the naive layout).  ``layer_dims``: [(in_i, out_i)] per trunk layer,
    read off the actual weight shapes — the reference trunk is NOT
    uniform-width (fc6: C+S→L, fc7: L→F, fc8..fc10: F→F;
    mmidas/nn_model.py:212-218)."""
    const = lambda i, a: (0, 0, 0)
    specs = [pl.BlockSpec((1, tb, Z), lambda i, a: (a, i, 0),
                          memory_space=pltpu.VMEM)]
    F = layer_dims[-1][1]
    for zin, zout in layer_dims:
        specs.append(pl.BlockSpec((A, zin, zout), const,
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((A, 1, zout), const,
                                  memory_space=pltpu.VMEM))
    specs.append(pl.BlockSpec((A, F, D), const, memory_space=pltpu.VMEM))
    specs.append(pl.BlockSpec((A, 1, D), const, memory_space=pltpu.VMEM))
    specs.append(pl.BlockSpec((tb, D), lambda i, a: (i, 0),
                              memory_space=pltpu.VMEM) if shared_x else
                 pl.BlockSpec((1, tb, D), lambda i, a: (a, i, 0),
                              memory_space=pltpu.VMEM))
    return specs


def _layer_dims(trunk):
    return [(w.shape[1], w.shape[2]) for w, _ in trunk]


def _flat_args(z, trunk, w11, b11, x):
    args = [z]
    for w, b in trunk:
        args += [w, b[:, None, :]]
    args += [w11, b11[:, None, :], x]
    return args


def _fwd(z, trunk, w11, b11, x, thr, with_mism=True):
    A, B, Z = z.shape
    D = w11.shape[-1]
    shared_x = x.ndim == 2
    tb = _tile_b(B)
    nb = pl.cdiv(B, tb)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_b=tb, n_rows=B, thr=thr,
                          shared_x=shared_x, with_mism=with_mism),
        grid=(nb, A),
        in_specs=_specs(A, Z, _layer_dims(trunk), D, tb, shared_x),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((A, 2), jnp.float32),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*_flat_args(z, trunk, w11, b11, x))
    return out[:, 0], out[:, 1]


# ---------------------------------------------------------------------------
# Fused forward+backward (training path)
# ---------------------------------------------------------------------------

def _fwdbwd_kernel(z_ref, *refs, tile_b, n_rows, thr, shared_x, with_mism):
    trunk_refs = refs[:2 * N_TRUNK]
    w11_ref, b11_ref, x_ref = refs[2 * N_TRUNK:2 * N_TRUNK + 3]
    out_ref, dz_ref = refs[2 * N_TRUNK + 3:2 * N_TRUNK + 5]
    dtrunk_refs = refs[2 * N_TRUNK + 5:4 * N_TRUNK + 5]
    dw11_ref, db11_ref = refs[4 * N_TRUNK + 5:]
    i_b = pl.program_id(0)
    a = pl.program_id(1)
    has_edge = (n_rows % tile_b) != 0  # static

    z = z_ref[0]
    if has_edge:
        z = jnp.where(_row_valid(i_b, z.shape, tile_b, n_rows), z, 0)
    hs, r = _forward_chain(z, a, trunk_refs, w11_ref, b11_ref)
    x = (x_ref[:] if shared_x else x_ref[0]).astype(jnp.float32)

    @pl.when(i_b == 0)
    def _():
        out_ref[a, 0] = 0.0
        out_ref[a, 1] = 0.0

    @pl.when(jnp.logical_and(i_b == 0, a == 0))
    def _():
        # the persistent accumulators hold ALL arms: zero once, first step
        for ref in (dw11_ref, db11_ref, *dtrunk_refs):
            ref[...] = jnp.zeros_like(ref)

    e = r - x
    mism = (r > thr) != (x > thr)
    if has_edge:
        valid = _row_valid(i_b, r.shape, tile_b, n_rows)
        e = jnp.where(valid, e, 0.0)
        mism = jnp.logical_and(valid, mism)
    out_ref[a, 0] += jnp.sum(e * e)
    if with_mism:
        out_ref[a, 1] += jnp.sum(mism.astype(jnp.float32))

    # ---- backward, cotangent 1 (e is 0 on masked rows → zeros propagate
    # down the whole chain, so no further row masking is needed) ----
    gm_f = jnp.where(r > 0.0, 2.0 * e, 0.0)
    gm = gm_f.astype(z.dtype)
    dw11_ref[a] += _dot_acc(hs[-1], gm)
    db11_ref[a, 0] += jnp.sum(gm_f, axis=0)
    g = _dot_t(gm, w11_ref[a])                      # dh₅ (f32)
    for i in range(N_TRUNK - 1, -1, -1):
        h_in = hs[i - 1] if i > 0 else z
        # f32 compare: Mosaic has no bf16 vector comparison
        g_f = jnp.where(hs[i].astype(jnp.float32) > 0, g, 0.0)
        g = g_f.astype(z.dtype)
        dtrunk_refs[2 * i][a] += _dot_acc(h_in, g)          # dWᵢ
        dtrunk_refs[2 * i + 1][a, 0] += jnp.sum(g_f, axis=0)  # dbᵢ
        g = _dot_t(g, trunk_refs[2 * i][a])                 # dhᵢ₋₁ / dz
    # dz in the input dtype: the downstream gumbel/reparam backward consumed
    # bf16 cotangents on the unfused path too — an f32 dz doubles the
    # (A, B, C) traffic it feeds
    dz_ref[0] = g.astype(dz_ref.dtype)


def _fwdbwd_call(z, trunk, w11, b11, x, thr, with_mism):
    """((sumsq, mism), dz, dtrunk, dw11, db11) — gradients unscaled."""
    A, B, Z = z.shape
    F = w11.shape[1]
    D = w11.shape[-1]
    shared_x = x.ndim == 2
    tb = _tile_b(B)
    nb = pl.cdiv(B, tb)
    dims = _layer_dims(trunk)
    # dW/db accumulators: FULL (A, ·, ·) constant-index blocks — they stay
    # resident in VMEM for the whole grid and flush to HBM once at the end
    # (a per-arm block would round-trip on every grid step, arms innermost)
    const = lambda i, a: (0, 0, 0)
    dtrunk_specs, dtrunk_shapes = [], []
    for zin, zout in dims:
        dtrunk_specs += [
            pl.BlockSpec((A, zin, zout), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 1, zout), const, memory_space=pltpu.VMEM)]
        dtrunk_shapes += [jax.ShapeDtypeStruct((A, zin, zout), jnp.float32),
                          jax.ShapeDtypeStruct((A, 1, zout), jnp.float32)]
    outs = pl.pallas_call(
        functools.partial(_fwdbwd_kernel, tile_b=tb, n_rows=B, thr=thr,
                          shared_x=shared_x, with_mism=with_mism),
        grid=(nb, A),
        in_specs=_specs(A, Z, dims, D, tb, shared_x),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tb, Z), lambda i, a: (a, i, 0),
                         memory_space=pltpu.VMEM),
            *dtrunk_specs,
            pl.BlockSpec((A, F, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 1, D), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((A, 2), jnp.float32),
            jax.ShapeDtypeStruct((A, B, Z), z.dtype),
            *dtrunk_shapes,
            jax.ShapeDtypeStruct((A, F, D), jnp.float32),
            jax.ShapeDtypeStruct((A, 1, D), jnp.float32),
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*_flat_args(z, trunk, w11, b11, x))
    out, dz = outs[0], outs[1]
    dtrunk = [(outs[2 + 2 * i], outs[3 + 2 * i][:, 0])
              for i in range(N_TRUNK)]
    dw11, db11 = outs[2 + 2 * N_TRUNK], outs[3 + 2 * N_TRUNK][:, 0]
    return (out[:, 0], out[:, 1]), dz, dtrunk, dw11, db11


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15))
def fused_decoder_mse(z, w6, b6, w7, b7, w8, b8, w9, b9, w10, b10, w11, b11,
                      x, thr: float = 0.1, with_mism: bool = True):
    """Per-arm (sumsq, mismatch_count) of the full decoder against x.

    Args:
      z: (A, B, C+S) decoder input [c_smp, dropout(s_smp)]
         (mmidas/nn_model.py:278).
      w6: (A, C+S, F), w7..w10: (A, F, F), w11: (A, F, D); b*: (A, ·).
      x: (B, D) shared target or (A, B, D) per-arm targets.

    Returns (sumsq, mism) exactly as ops/recon_pallas.fused_recon_mse.
    """
    trunk = [(w6, b6), (w7, b7), (w8, b8), (w9, b9), (w10, b10)]
    return _fwd(z, trunk, w11, b11, x, thr, with_mism)


def _op_fwd(z, w6, b6, w7, b7, w8, b8, w9, b9, w10, b10, w11, b11, x,
            thr, with_mism):
    trunk = [(w6, b6), (w7, b7), (w8, b8), (w9, b9), (w10, b10)]
    out, dz, dtrunk, dw11, db11 = _fwdbwd_call(z, trunk, w11, b11, x,
                                               thr, with_mism)
    tok = lambda t: jnp.zeros((0,), t.dtype)
    toks = tuple(tok(t) for t in
                 (z, w6, b6, w7, b7, w8, b8, w9, b9, w10, b10, w11, b11))
    return out, (dz, dtrunk, dw11, db11, toks, x[..., :0])


def _op_bwd(thr, with_mism, res, g):
    dz, dtrunk, dw11, db11, toks, x_tok = res
    g_sumsq, _ = g  # the mismatch count is a stop-gradient metric
    ga = g_sumsq.astype(jnp.float32)
    s3, s2 = ga[:, None, None], ga[:, None]
    c = lambda t, i: t.astype(toks[i].dtype)
    grads = [c(dz * s3, 0)]
    for i, (dw, db) in enumerate(dtrunk):
        grads += [c(dw * s3, 1 + 2 * i), c(db * s2, 2 + 2 * i)]
    grads += [c(dw11 * s3, 11), c(db11 * s2, 12),
              jnp.zeros(x_tok.shape[:-1] + (dw11.shape[-1],), x_tok.dtype)]
    return tuple(grads)


fused_decoder_mse.defvjp(_op_fwd, _op_bwd)


def decoder_mse_reference(z, w6, b6, w7, b7, w8, b8, w9, b9, w10, b10,
                          w11, b11, x, thr: float = 0.1):
    """XLA oracle (materializing; testing only) — mirrors
    models/mixvae._decode_hidden_arm + recon_pallas.recon_mse_reference."""
    def arm(z, *p):
        h = z
        for i in range(N_TRUNK):
            h = jax.nn.relu(h @ p[2 * i] + p[2 * i + 1])
        return h

    h = jax.vmap(arm)(z, w6, b6, w7, b7, w8, b8, w9, b9, w10, b10)
    from dvae_tpu.ops.recon_pallas import recon_mse_reference
    return recon_mse_reference(h, w11, b11, x, thr)
