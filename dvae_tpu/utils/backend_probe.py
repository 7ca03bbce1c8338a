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

Orphan dedup: the pending probe is registered in a pidfile, and every
later ``start_probe`` ADOPTS a still-live registered probe instead of
spawning another — during a long outage N callers share ONE probe
process (each probe is a full Python+JAX process, a few hundred MB RSS
on a 1-core container; without dedup they all fire TPU ops at once on
recovery, racing the real measurement).  An adopted probe reports
success through a done-file its wrapped body writes as its last act.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import time

# a tiny end-to-end op: backend init, one executed reduction, and a
# device→host round trip (np.asarray — block_until_ready does not block
# through the tunnel)
PROBE_CODE = ("import jax, numpy as np; "
              "print(int(np.asarray(jax.numpy.ones((8,)).sum())))")

def _pidfile_for(code_hash: str) -> str:
    """Registration path for a probe body.  Keyed by the body's hash so
    the DVAE_PROBE_CODE test seam can never clobber the registration of a
    REAL pending probe (and vice versa); ``DVAE_PROBE_PIDFILE`` overrides
    for tests that want a private location."""
    return (os.environ.get("DVAE_PROBE_PIDFILE")
            or f"/tmp/dvae_backend_probe.{code_hash}.pid")


def _proc_starttime(pid: int):
    """Kernel start-time ticks of ``pid`` (field 22 of /proc/pid/stat) —
    the pid-reuse guard for adoption; None when the process is gone."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read().decode("ascii", "replace")
        # comm can contain spaces/parens: split after the LAST ')'
        return int(stat.rsplit(")", 1)[1].split()[19])
    except (OSError, IndexError, ValueError):
        return None


class AdoptedProbe:
    """Popen-compatible handle (poll/wait/pid/returncode) on a probe
    registered by an EARLIER process.  Not our child, so liveness comes
    from /proc and success from the done-file the probe writes."""

    def __init__(self, pid: int, starttime: int, donefile: str):
        self.pid = pid
        self._start = starttime
        self._done = donefile
        self.returncode = None

    def poll(self):
        if self.returncode is not None:
            return self.returncode
        if os.path.exists(self._done):
            self.returncode = 0
        elif _proc_starttime(self.pid) != self._start:
            self.returncode = 1  # died without writing the done-file
        return self.returncode

    def wait(self, timeout=None):
        deadline = None if timeout is None else time.monotonic() + timeout
        while self.poll() is None:
            if deadline is not None and time.monotonic() >= deadline:
                raise subprocess.TimeoutExpired(
                    f"adopted probe pid {self.pid}", timeout)
            time.sleep(min(1.0, 0.05 if timeout and timeout < 5 else 1.0))
        return self.returncode


def _read_pidfile(pidfile: str):
    """(pid, starttime, donefile, code_hash) of the registered probe, or
    None when absent/corrupt."""
    try:
        with open(pidfile) as f:
            pid_s, start_s, donefile, code_hash = f.read().split("\n")[:4]
        return int(pid_s), int(start_s), donefile, code_hash
    except (OSError, ValueError):
        return None


def _adopt(code_hash: str):
    """A STILL-RUNNING registered probe with the SAME probe body, or None.

    Only a pending probe is adoptable: a finished one (success or failure)
    is a stale answer — the backend may have changed state since — so a
    fresh caller spawns a fresh probe.  The dedup exists to stop PENDING
    probes piling up through a long outage."""
    rec = _read_pidfile(_pidfile_for(code_hash))
    if rec is None:
        return None
    pid, start, donefile, rec_hash = rec
    if rec_hash != code_hash:
        return None  # different probe body (the DVAE_PROBE_CODE test seam)
    if _proc_starttime(pid) != start:
        return None  # finished or died (or pid reused): spawn fresh
    return AdoptedProbe(pid, start, donefile)


def start_probe() -> subprocess.Popen:
    """Return a handle on THE pending probe: adopt the registered live one
    if any, else spawn and register a fresh probe (never killed by this
    module — see the module docstring; poll/wait it yourself).

    ``DVAE_PROBE_CODE`` (env) overrides the probe body — the test seam
    for exercising outage paths (fast-fail / hang) without a real outage.
    A custom body never adopts a default-body probe and vice versa.
    """
    code = os.environ.get("DVAE_PROBE_CODE", PROBE_CODE)
    code_hash = hashlib.sha1(code.encode()).hexdigest()[:12]
    adopted = _adopt(code_hash)
    if adopted is not None:
        return adopted

    donefile = f"/tmp/dvae_probe_done.{os.getpid()}.{time.monotonic_ns()}"
    # success marker written as the probe's LAST act; an exception in the
    # probe body skips it, so done-file presence == rc 0
    wrapped = code + f"\nopen({donefile!r}, 'w').write('0')"
    proc = subprocess.Popen([sys.executable, "-c", wrapped],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    start = _proc_starttime(proc.pid)
    try:
        with open(_pidfile_for(code_hash), "w") as f:
            f.write(f"{proc.pid}\n{start}\n{donefile}\n{code_hash}\n")
    except OSError:
        pass  # registration is best-effort; the probe itself still works
    return proc


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
