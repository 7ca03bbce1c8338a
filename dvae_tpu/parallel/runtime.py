"""Multi-host runtime glue.

Equivalent capability to the reference's distributed bootstrap layer
(mmidas/_dist_utils.py: env rendezvous :12-18, NCCL process-group init
:43-48, rank-prefixed printing :54, free addr/port discovery :58-67) — on
TPU almost all of it dissolves:

  * rendezvous: ``jax.distributed.initialize()`` — the TPU runtime knows
    the slice topology; there is no MASTER_ADDR/PORT.
  * backend selection/tuning (NCCL_* env blocks): no equivalent — XLA's
    latency-hiding scheduler owns collective scheduling.
  * per-GPU process spawn (mp.spawn): one process per HOST; devices on a
    host are addressed through the mesh.

What remains real work on multi-host TPU is forming global arrays from
per-host data — ``global_batch`` below wraps
``jax.make_array_from_process_local_data`` (the DistributedSampler
analogue, reference dataloader.py:117-122).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime.  No-op when single-process (the
    common case on a single host or under tests)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — the reference's (rank, world_size)."""
    return jax.process_index(), jax.process_count()


def global_batch(local_data: np.ndarray, mesh: Mesh,
                 pspec: P = P(("data", "fsdp"))) -> jax.Array:
    """Form a global array from this process's local shard
    (DistributedSampler → make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(sharding, local_data)


def local_slice(n_global: int, batch_axis_size: int) -> slice:
    """This process's contiguous row range of a globally-indexed dataset.

    Every process must contribute the same row count and every device an
    equal shard, so ``n_global`` must divide evenly by the process count
    and by ``batch_axis_size`` (the number of devices the batch axis spans).
    Raises instead of silently dropping tail rows — pad or trim first
    (``data.pipeline.shard_for_process`` pads by wrapping)."""
    procs = jax.process_count()
    if n_global % procs:
        raise ValueError(
            f"n_global={n_global} rows do not divide evenly over "
            f"{procs} processes — the tail would silently never be seen; "
            "pad (e.g. by wrapping) or trim the dataset first")
    if batch_axis_size and n_global % batch_axis_size:
        raise ValueError(
            f"n_global={n_global} rows do not divide evenly over the "
            f"{batch_axis_size}-device batch axis")
    per = n_global // procs
    start = jax.process_index() * per
    return slice(start, start + per)
