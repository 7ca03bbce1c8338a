"""Fused Pallas TPU kernel for the O(A²) arm-coupling distance.

XLA reference implementation: dvae_tpu/models/losses.py
``coupling_distance`` (semantics: reference mmidas/nn_model.py:558-569 /
``loss_vectorize`` :617-628).  The XLA path materializes log(c+eps) and the
precision-scaled tensor prec = logc·rsqrt(var_B(c)+eps) — two extra
(A, B, C) HBM tensors — before the Gram contraction.  This kernel streams
``c`` through VMEM in two grid phases (each block is DMA'd twice,
once per phase):

  phase 0: accumulate Σ_B c and Σ_B c² per (A, C)  → batch variance
  phase 1: w = rsqrt(var+eps); prec = log(c+eps)·w; G += prec·precᵀ (MXU)

and emits only the (A, A) Gram matrix; the pair sum
Σ_{a<b} mean_B ‖prec_a − prec_b‖² = A·tr(G) − ΣG follows in XLA (scalar
work).  Gradients: custom_vjp whose backward is the VJP of the XLA
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

_BLOCK_B = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(c_ref, g_ref, sum_ref, sumsq_ref, w_ref, *, B, eps):
    phase = pl.program_id(0)
    i = pl.program_id(1)

    c = c_ref[:]  # (A, Bb, C); padded rows are zero
    A = c.shape[0]

    @pl.when(jnp.logical_and(phase == 0, i == 0))
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sumsq_ref[:] = jnp.zeros_like(sumsq_ref)
        for a in range(A):
            for d in range(A):
                g_ref[a, d] = 0.0

    @pl.when(phase == 0)
    def _():
        sum_ref[:] += jnp.sum(c, axis=1)
        sumsq_ref[:] += jnp.sum(c * c, axis=1)

    @pl.when(jnp.logical_and(phase == 1, i == 0))
    def _():
        s = sum_ref[:]
        var = (sumsq_ref[:] - s * s / B) / (B - 1)  # unbiased (torch .var())
        w_ref[:] = jax.lax.rsqrt(var + eps)

    @pl.when(phase == 1)
    def _():
        # mask padded rows: a zero row would contribute log(eps)·w ≠ 0
        row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1) + i * c.shape[1]
        valid = (row < B).astype(c.dtype)
        prec = jnp.log(c + eps) * w_ref[:][:, None, :] * valid
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
            pltpu.VMEM((A, C), jnp.float32),   # w
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
