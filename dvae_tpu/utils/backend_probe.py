"""Subprocess probe of the JAX backend (shared by bench.py and
__graft_entry__.py).

The tunneled TPU backend flaps UNAVAILABLE for minutes at a time, JAX
caches backend-init failures per-process, and a claim interrupted
mid-flight wedges the chip for ~15-25 min — so availability must be
tested end-to-end (init + execute + device→host) in a FRESH subprocess,
and the parent must not touch the backend until a probe succeeds.

A hung probe is NEVER killed: killing it mid-claim is exactly what
creates the next ~15-25 min wedge (observed live 2026-08-19 — each
killed probe re-wedged the chip for the following caller, so one outage
cascaded through every entry point).  A probe that outlives its caller's
patience is left running, orphaned: it completes and exits on its own
the moment the tunnel grant arrives (measured: a probe hung 21 min
through an outage, then returned success within a second of recovery).
"""

from __future__ import annotations

import os
import subprocess
import sys

# a tiny end-to-end op: backend init, one executed reduction, and a
# device→host round trip (np.asarray — block_until_ready does not block
# through the tunnel)
PROBE_CODE = ("import jax, numpy as np; "
              "print(int(np.asarray(jax.numpy.ones((8,)).sum())))")


def start_probe() -> subprocess.Popen:
    """Spawn one probe subprocess and return its handle (never killed by
    this module — see the module docstring; poll/wait it yourself).

    ``DVAE_PROBE_CODE`` (env) overrides the probe body — the test seam
    for exercising outage paths (fast-fail / hang) without a real outage.
    """
    code = os.environ.get("DVAE_PROBE_CODE", PROBE_CODE)
    return subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)


def probe_backend(timeout_s: float = 300.0) -> bool:
    """One probe in a fresh subprocess.  True = backend answered.

    Raises ``subprocess.TimeoutExpired`` when the probe HUNG past
    ``timeout_s``.  The hung probe is left RUNNING (orphaned) — never
    killed, which would wedge the chip — so callers that want to keep
    waiting on the same outage should use ``start_probe`` and wait the
    handle themselves (bench.py's ``wait_for_backend`` does).
    """
    p = start_probe()
    return p.wait(timeout=timeout_s) == 0
