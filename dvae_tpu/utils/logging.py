"""Observability: wandb-optional metric logging + host-aware printing.

Equivalent capability to the reference's logging surface — per-epoch wandb
dicts (mmidas/cpl_mixvae.py:541-560,768-775), run init/grouping
(train.py:135-137, dist/train_smartseq.py:292-370), master-only prints
(cpl_mixvae.py:50-51), rank-prefixed print (mmidas/_dist_utils.py:54-55) —
with zero hard dependencies: wandb is used when importable AND enabled,
otherwise metrics go to an in-memory history + optional JSONL file.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax


def is_master() -> bool:
    """True on process 0 (the reference's rank-0 check, cpl_mixvae.py:50)."""
    return jax.process_index() == 0


def mprint(*args, **kwargs) -> None:
    """Master-only print."""
    if is_master():
        print(*args, **kwargs)


def rprint(*args, **kwargs) -> None:
    """Process-prefixed print (reference ``set_print``,
    mmidas/_dist_utils.py:54-55)."""
    print(f"[proc {jax.process_index()}]", *args, **kwargs)


class MetricLogger:
    """wandb when available/enabled; always keeps an in-memory history and
    optionally appends JSONL (the artifact the reference's log parsers in
    dist/plot.py consume — ours is structured instead of regex-scraped)."""

    def __init__(self, use_wandb: bool = False, project: str = "dvae-tpu",
                 run_name: Optional[str] = None, group: Optional[str] = None,
                 config: Optional[dict] = None, jsonl_path: Optional[str] = None,
                 auto_group_prefix: Optional[str] = None):
        self.history: list[dict] = []
        self.jsonl_path = jsonl_path
        self._wandb = None
        if use_wandb and is_master():
            try:
                import wandb
                self._wandb = wandb
                if group is None and auto_group_prefix:
                    group = self._next_group(wandb, project,
                                             auto_group_prefix)
                wandb.init(project=project, name=run_name, group=group,
                           config=config or {})
            except Exception as e:  # pragma: no cover
                print(f"wandb unavailable ({e}); falling back to local logging")
                self._wandb = None

    @staticmethod
    def _next_group(wandb, project: str, prefix: str) -> str:
        """Auto-incremented run-group names discovered via the wandb API
        (reference dist/train_smartseq.py:292-370)."""
        try:
            api = wandb.Api()
            runs = api.runs(project)
            existing = {r.group for r in runs if r.group
                        and r.group.startswith(prefix)}
            return f"{prefix}-{len(existing)}"
        except Exception:
            return f"{prefix}-0"

    def log(self, metrics: dict, step: Optional[int] = None) -> None:
        if not is_master():
            return
        rec = dict(metrics)
        if step is not None:
            rec["step"] = step
        rec["_time"] = time.time()
        self.history.append(rec)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec, default=float) + "\n")

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


_ANSI = {"red": "\033[91m", "green": "\033[92m", "yellow": "\033[93m",
         "blue": "\033[94m", "magenta": "\033[95m", "cyan": "\033[96m",
         "end": "\033[0m"}


def dprint(*args, color: str = "cyan", **kwargs) -> None:
    """Debug print, colored and ``__debug__``-gated (the reference's ANSI
    ``dprint``, dist/my_utils.py:87-119); disabled under ``python -O``."""
    if __debug__:
        print(_ANSI.get(color, ""), end="")
        print(*args, **kwargs)
        print(_ANSI["end"], end="", flush=True)


def bytes_to_mb(n_bytes: float) -> float:
    """B → MB (reference ``convert``, dist/my_utils.py:125)."""
    return n_bytes / 2**20


def avg(xs) -> float:
    """Arithmetic mean of an iterable (reference dist/my_utils.py:73)."""
    xs = list(xs)
    return sum(xs) / len(xs) if xs else 0.0


def device_memory_mb() -> float:
    """Allocated device memory in MB (reference logs
    ``torch.cuda.memory_allocated()`` per batch, cpl_mixvae.py:461)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return (stats or {}).get("bytes_in_use", 0) / 2**20
    except Exception:  # pragma: no cover
        return 0.0
