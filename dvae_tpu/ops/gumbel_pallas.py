"""Fused Pallas TPU kernel: τ-sharpen → Gumbel noise → softmax → (ST one-hot).

The XLA reference implementation lives in dvae_tpu/models/sampling.py
(semantics: reference mmidas/nn_model.py:430-493).  That path materializes
log(phi), the uniform draw, the gumbel transform, the scaled logits, and the
softmax as separate HBM tensors between fusions; this kernel does the whole
chain in one VMEM pass per (B, C) tile with on-chip PRNG
(pltpu.prng_random_bits), reading phi once and writing the sample once.

Gradient: the Gumbel noise is a constant w.r.t. phi, so
    y = softmax((log(phi+eps) + g) / T)
    dL/dphi = (dy - y·Σ(dy⊙y)) ⊙ y / (T·(phi+eps))
    dL/dT   = −Σ (dy − y·Σ(dy⊙y)) ⊙ y ⊙ log y / T
(the temp formula uses log y in place of the logits: each softmax-jacobian
row sums to zero, so the per-row log-partition constant drops out — no
residual beyond y is needed), implemented as a second fused kernel
(custom_vjp).  The straight-through hard path passes the soft gradient
unchanged (reference mmidas/nn_model.py:487-493).

Tiles: the batch axis is blocked at 512 rows; C pads to the 128-lane
boundary implicitly via Pallas block handling (C=92 → one lane tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvae_tpu.ops._common import interpret as _interpret

_BLOCK_B = 512


def _finish(phi, u, temp, eps, tau, hard):
    """The fused math after uniform bits are in registers."""
    if tau is not None:
        phi = jax.nn.softmax(phi / tau, axis=-1)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    logits = (jnp.log(phi + eps) + g) / temp
    y = jax.nn.softmax(logits, axis=-1)
    if hard:
        idx = jnp.argmax(y, axis=-1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 1)
        y = jnp.where(cols == idx, 1.0, 0.0).astype(y.dtype)
    return y


def _gumbel_kernel(seed_ref, temp_ref, phi_ref, out_ref, *, eps, tau, hard):
    """TPU path: on-chip PRNG (pltpu.prng_random_bits).  ``temp`` rides in
    SMEM so a traced (schedule-varying) temperature never bakes into the
    kernel closure."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    phi = phi_ref[:]
    bits = pltpu.bitcast(pltpu.prng_random_bits(phi.shape), jnp.int32)
    # int32 → U[0,1): drop the sign bit, keep 23 random bits (Mosaic has no
    # uint32→f32 cast; masking makes the int32 non-negative first)
    mant = jax.lax.shift_right_logical(bits, 9) & ((1 << 23) - 1)
    u = mant.astype(jnp.float32) * (1.0 / (1 << 23))
    out_ref[:] = _finish(phi, u, temp_ref[0], eps, tau, hard)


def _gumbel_kernel_with_u(temp_ref, phi_ref, u_ref, out_ref, *, eps, tau,
                          hard):
    """Portable path: uniform noise supplied as an input (used on CPU where
    the Pallas interpreter lacks prng_seed, and by exact-oracle tests)."""
    out_ref[:] = _finish(phi_ref[:], u_ref[:], temp_ref[0], eps, tau, hard)


def _pad_rows(x, pad, fill=0.0):
    return jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill) if pad else x


def _gumbel_fwd_pallas(seed: jax.Array, phi: jax.Array, temp: float,
                       eps: float, tau, hard: bool,
                       u: jax.Array | None = None) -> jax.Array:
    """phi: (..., C) collapsed to (N, C) tiles of _BLOCK_B rows.

    ``u``: optional uniform noise of phi's shape; when given (or on CPU,
    where it is generated from ``seed`` with jax.random) the with-u kernel
    runs; on TPU with u=None the PRNG lives in the kernel.
    """
    orig_shape = phi.shape
    C = orig_shape[-1]
    x = phi.reshape(-1, C)
    N = x.shape[0]
    nb = pl.cdiv(N, _BLOCK_B)
    pad = nb * _BLOCK_B - N
    x = _pad_rows(x, pad, fill=1.0)
    spec = pl.BlockSpec((_BLOCK_B, C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    if u is None and _interpret():
        u = jax.random.uniform(
            jax.random.key(jnp.asarray(seed, jnp.int32).reshape(())),
            orig_shape, jnp.float32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    temp_arr = jnp.asarray(temp, jnp.float32).reshape(1)
    if u is not None:
        uu = _pad_rows(u.reshape(-1, C).astype(jnp.float32), pad,
                       fill=0.5)
        out = pl.pallas_call(
            functools.partial(_gumbel_kernel_with_u, eps=eps, tau=tau,
                              hard=hard),
            grid=(nb,),
            in_specs=[smem, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=_interpret(),
        )(temp_arr, x, uu)
    else:
        out = pl.pallas_call(
            functools.partial(_gumbel_kernel, eps=eps, tau=tau, hard=hard),
            grid=(nb,),
            in_specs=[smem, smem, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=False,
        )(jnp.atleast_1d(seed).astype(jnp.int32), temp_arr, x)
    if pad:
        out = out[:N]
    return out.reshape(orig_shape)


def _soft_bwd_kernel(temp_ref, y_ref, phi_ref, dy_ref, dphi_ref, dtemp_ref,
                     *, eps):
    i = pl.program_id(0)
    y = y_ref[:]
    dy = dy_ref[:]
    s = jnp.sum(dy * y, axis=-1, keepdims=True)
    t = temp_ref[0]
    dz = (dy - s) * y                      # dL/d(pre-T logits) · T
    dphi_ref[:] = dz / t / (phi_ref[:] + eps)
    # temp cotangent: logits = z/T ⇒ dL/dT = −Σ dz ⊙ logits / T, and since
    # each dz row sums to zero (softmax jacobian), logits may be replaced
    # by log y (they differ per row by a constant): dL/dT = −Σ dz⊙log y / T.
    # Padded rows have y = 0 ⇒ the where() zeroes their contribution.
    logy = jnp.where(y > 0, jnp.log(jnp.maximum(y, 1e-38)), 0.0)

    @pl.when(i == 0)
    def _():
        dtemp_ref[0] = 0.0

    dtemp_ref[0] += -jnp.sum(dz * logy) / t


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gumbel_softmax_pallas(seed, phi, u=None, temp=1.0,
                          eps: float = 1e-8, hard: bool = False):
    """Fused Gumbel-softmax sample of ``phi`` (probabilities, last axis C).

    ``seed``: int32 scalar (fold the training step counter in).  Matches the
    XLA path's distribution (same Gumbel transform), not its bitstream.
    ``u``: optional explicit U[0,1) noise (exact-oracle testing / CPU).
    """
    return _gumbel_fwd_pallas(seed, phi, temp, eps, None, hard, u)


def _gs_fwd(seed, phi, u, temp, eps, hard):
    y = _gumbel_fwd_pallas(seed, phi, temp, eps, None, False, u)
    out = y
    if hard:
        idx = jnp.argmax(y, axis=-1)
        out = jax.nn.one_hot(idx, y.shape[-1], dtype=y.dtype)
    return out, (y, phi, jnp.asarray(temp, jnp.float32))


def _gs_bwd(eps, hard, res, dy):
    y, phi, temp = res
    C = phi.shape[-1]
    y2 = y.reshape(-1, C)
    phi2 = phi.reshape(-1, C)
    dy2 = dy.reshape(-1, C)
    N = y2.shape[0]
    nb = pl.cdiv(N, _BLOCK_B)
    pad = nb * _BLOCK_B - N
    if pad:
        y2 = jnp.pad(y2, ((0, pad), (0, 0)))
        phi2 = jnp.pad(phi2, ((0, pad), (0, 0)), constant_values=1.0)
        dy2 = jnp.pad(dy2, ((0, pad), (0, 0)))
    spec = pl.BlockSpec((_BLOCK_B, C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    dphi, dtemp = pl.pallas_call(
        functools.partial(_soft_bwd_kernel, eps=eps),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec, spec],
        out_specs=(spec, pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct(y2.shape, y2.dtype),
                   jax.ShapeDtypeStruct((1,), jnp.float32)),
        interpret=_interpret(),
    )(temp.reshape(1), y2, phi2, dy2)
    if pad:
        dphi = dphi[:N]
    return (None, dphi.reshape(phi.shape), None, dtemp[0])


gumbel_softmax_pallas.defvjp(_gs_fwd, _gs_bwd)


def sharpen_gumbel_pallas(seed, logits_over_tau_input, tau: float,
                          temp: float = 1.0, eps: float = 1e-8,
                          hard: bool = False):
    """Fully fused: softmax(c_prob/τ) → gumbel sample, one VMEM pass.

    Matches the model's sharpen+sample sequence (mixvae._forward_arm).
    Forward-only convenience (no VJP through the fused τ-softmax); training
    uses gumbel_softmax_pallas on the sharpened input.
    """
    return _gumbel_fwd_pallas(seed, logits_over_tau_input, temp, eps, tau,
                              hard)
