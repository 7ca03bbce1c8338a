"""Fused Pallas TPU kernel for the O(A²) arm-coupling distance.

XLA reference implementation: dvae_tpu/models/losses.py
``coupling_distance`` (semantics: reference mmidas/nn_model.py:558-569 /
``loss_vectorize`` :617-628).  The XLA path materializes log(c+eps) and the
precision-scaled tensor prec = logc·rsqrt(var_B(c)+eps) — two extra
(A, B, C) HBM tensors — before the Gram contraction.  This kernel streams
``c`` through VMEM in two grid phases (each block is DMA'd twice,
once per phase):

  phase 0: accumulate Σ_B c, Σ_B c², Σ_B log(c+eps) per (A, C)
  phase 1: w = rsqrt(max(var,0)+eps); prec = log(c+eps)·w − m;
           G += prec·precᵀ (MXU)

and emits only the (A, A) Gram matrix; the pair sum
Σ_{a<b} mean_B ‖prec_a − prec_b‖² = A·tr(G) − ΣG follows in XLA (scalar
work).  Two numerical guards mirror the XLA path exactly:

  * **centering** — prec is shifted by its per-category mean over (A, B)
    (``m``, assembled from the phase-0 log sums).  The pair distances are
    invariant to the shift, but without it sharp posteriors (dead
    categories ≡ 0 in every arm) put ~log(eps)·rsqrt(eps) ≈ −1.8e5 in the
    same slot of every arm and the uncentered f32 Gram (~1e12–1e15 entries)
    cancels catastrophically in A·tr − Σ — the value silently collapses to
    ~0 (see models/losses.py ``_pair_sums_from_gram``).
  * **clamped variance** — the one-pass moment formula can go slightly
    negative for a near-constant category (f32 cancellation of Σc² against
    (Σc)²/B), which would make rsqrt(var+eps) NaN; clamping to 0 lands on
    rsqrt(eps), exactly where the XLA two-pass variance saturates too.

Gradients: custom_vjp whose backward is the VJP of the XLA
implementation (exact, compiler-scheduled) — the kernel accelerates the
forward/eval path; training uses it with the recompute backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvae_tpu.models.losses import coupling_distance as _coupling_xla
from dvae_tpu.ops._common import interpret as _interpret

_BLOCK_B = 1024


def _kernel(c_ref, g_ref, sum_ref, sumsq_ref, sumlog_ref, w_ref, m_ref,
            *, B, eps):
    phase = pl.program_id(0)
    i = pl.program_id(1)

    c = c_ref[:]  # (A, Bb, C); padded rows are zero
    A = c.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1) + i * c.shape[1]
    valid = (row < B).astype(c.dtype)

    @pl.when(jnp.logical_and(phase == 0, i == 0))
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sumsq_ref[:] = jnp.zeros_like(sumsq_ref)
        sumlog_ref[:] = jnp.zeros_like(sumlog_ref)
        for a in range(A):
            for d in range(A):
                g_ref[a, d] = 0.0

    @pl.when(phase == 0)
    def _():
        # pads are zero rows: free for Σc/Σc², masked for Σlog (log(eps)≠0)
        sum_ref[:] += jnp.sum(c, axis=1)
        sumsq_ref[:] += jnp.sum(c * c, axis=1)
        sumlog_ref[:] += jnp.sum(jnp.log(c + eps) * valid, axis=1)

    @pl.when(jnp.logical_and(phase == 1, i == 0))
    def _():
        s = sum_ref[:]
        var = (sumsq_ref[:] - s * s / B) / (B - 1)  # unbiased (torch .var())
        w = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
        w_ref[:] = w
        # per-category mean of prec over (A, B) — the centering vector
        m_ref[:] = jnp.mean(w * sumlog_ref[:], axis=0, keepdims=True) / B

    @pl.when(phase == 1)
    def _():
        # mask padded rows AFTER centering: they must contribute exactly 0
        prec = (jnp.log(c + eps) * w_ref[:][:, None, :]
                - m_ref[:][:, None, :]) * valid
        # A is tiny (2-10): the (A, A) Gram accumulates as unrolled per-pair
        # VPU reductions (Mosaic cannot reshape (A, Bb, C) to (A, Bb·C)
        # when C is not lane-aligned); symmetric, so a ≤ d only.
        for a in range(A):
            for d in range(a, A):
                s = jnp.sum(prec[a] * prec[d])
                g_ref[a, d] += s
                if d != a:
                    g_ref[d, a] += s


def coupling_gram_pallas(c: jax.Array, eps: float) -> jax.Array:
    """(A, A) Gram matrix of the precision-scaled log posteriors."""
    A, B, C = c.shape
    nb = pl.cdiv(B, _BLOCK_B)
    pad = nb * _BLOCK_B - B
    if pad:
        c = jnp.pad(c, ((0, 0), (0, pad), (0, 0)))
    g = pl.pallas_call(
        functools.partial(_kernel, B=B, eps=eps),
        grid=(2, nb),
        in_specs=[pl.BlockSpec((A, _BLOCK_B, C), lambda p, i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((A, A), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((A, C), jnp.float32),   # Σc
            pltpu.VMEM((A, C), jnp.float32),   # Σc²
            pltpu.VMEM((A, C), jnp.float32),   # Σlog(c+eps)
            pltpu.VMEM((A, C), jnp.float32),   # w
            pltpu.VMEM((1, C), jnp.float32),   # centering vector m
        ],
        interpret=_interpret(),
    )(c)
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def coupling_distance_pallas(c: jax.Array, eps: float) -> jax.Array:
    """Σ_{a<b} mean_B ‖prec_a − prec_b‖² — fused forward, exact XLA grad."""
    g = coupling_gram_pallas(c, eps) / c.shape[1]
    A = c.shape[0]
    return A * jnp.trace(g) - jnp.sum(g)


def _fwd(c, eps):
    return coupling_distance_pallas(c, eps), c


def _bwd(eps, c, gbar):
    _, vjp = jax.vjp(lambda x: _coupling_xla(x, eps), c)
    (dc,) = vjp(gbar)
    return (dc,)


coupling_distance_pallas.defvjp(_fwd, _bwd)
