"""Shared helpers for the Pallas TPU kernels in this package."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

# the f32 tile intermediates of the fused kernels exceed the compiler's
# default 16 MB scoped VMEM budget; v5e/v4 TensorCores have ~128 MB physical
VMEM_LIMIT = 64 * 1024 * 1024


def interpret() -> bool:
    """Interpret-mode switch: compiled Mosaic on TPU, interpreter elsewhere."""
    return jax.default_backend() != "tpu"


def compiler_params(vmem_limit: int = VMEM_LIMIT) -> pltpu.CompilerParams:
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)


def tile_rows(B: int, tile: int) -> int:
    return min(tile, B)


def row_valid(i_b, shape, tile_b: int, n_valid: int):
    """Row-validity mask for a partial edge tile (True where the global row
    index is inside the array)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i_b * tile_b
    return rows < n_valid
