"""Subprocess probe of the JAX backend (shared by bench.py and
__graft_entry__.py).

The tunneled TPU backend flaps UNAVAILABLE for minutes at a time, JAX
caches backend-init failures per-process, and a claim interrupted
mid-flight wedges the chip for ~15-25 min — so availability must be
tested end-to-end (init + execute + device→host) in a FRESH subprocess,
and the parent must not touch the backend until a probe succeeds.
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


def probe_backend(timeout_s: float = 300.0) -> bool:
    """One probe in a fresh subprocess.  True = backend answered.

    Raises ``subprocess.TimeoutExpired`` when the probe HUNG (not
    fast-failed) and was killed — callers that keep retrying should back
    off past the ~15-25 min wedge window in that case (the killed probe
    may have claimed the chip).

    ``DVAE_PROBE_CODE`` (env) overrides the probe body — the test seam
    for exercising outage paths (fast-fail / hang) without a real outage.
    """
    code = os.environ.get("DVAE_PROBE_CODE", PROBE_CODE)
    p = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, timeout=timeout_s)
    return p.returncode == 0
