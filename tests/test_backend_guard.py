"""Backend-availability guards in the driver entry points.

The tunneled TPU backend flaps UNAVAILABLE (and sometimes hangs init) —
bench.py waits for a subprocess probe before claiming the device, and
__graft_entry__ falls back to CPU / skips parent backend init.  These
tests pin the guard logic itself with mocked probes; the real-outage
behavior was driven live (entry() CPU fallback, dryrun under a hung
tunnel) when the guards landed.
"""

import subprocess
import sys
import types

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
import __graft_entry__ as graft  # noqa: E402


def _fake_run(rc=0, raise_timeout=False):
    calls = {"n": 0}

    def run(cmd, capture_output=True, timeout=None):
        calls["n"] += 1
        if raise_timeout:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return types.SimpleNamespace(returncode=rc)

    return run, calls


def test_wait_for_backend_immediate_success(monkeypatch):
    run, calls = _fake_run(rc=0)
    monkeypatch.setattr(bench.subprocess, "run", run)
    assert bench.wait_for_backend(max_wait_s=10) is True
    assert calls["n"] == 1


def test_wait_for_backend_gives_up_at_deadline(monkeypatch):
    run, calls = _fake_run(rc=1)
    slept = []
    monkeypatch.setattr(bench.subprocess, "run", run)
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    # deadline passes after the first failed probe (monotonic is real;
    # max_wait 0 => first failure already past deadline)
    assert bench.wait_for_backend(max_wait_s=0.0, poll_s=1.0) is False
    assert calls["n"] == 1
    assert slept == []


def test_wait_for_backend_retries_then_succeeds(monkeypatch):
    attempts = {"n": 0}

    def run(cmd, capture_output=True, timeout=None):
        attempts["n"] += 1
        return types.SimpleNamespace(returncode=0 if attempts["n"] >= 3
                                     else 1)

    slept = []
    monkeypatch.setattr(bench.subprocess, "run", run)
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    assert bench.wait_for_backend(max_wait_s=3600, poll_s=7.0) is True
    assert attempts["n"] == 3
    assert slept == [7.0, 7.0]


def test_wait_for_backend_backs_off_after_hung_probe(monkeypatch):
    """A probe killed on timeout may have wedged the chip (~15-25 min) —
    the next retry must back off hard, not re-probe in poll_s."""
    attempts = {"n": 0}

    def run(cmd, capture_output=True, timeout=None):
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return types.SimpleNamespace(returncode=0)

    slept = []
    monkeypatch.setattr(bench.subprocess, "run", run)
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    assert bench.wait_for_backend(max_wait_s=3600, poll_s=60.0) is True
    # past the ~15-25 min wedge window, not the ordinary poll interval
    assert slept == [1200.0]


def test_ensure_backend_skips_probe_when_initialized(monkeypatch):
    """With an in-process backend already up (the test suite's CPU mesh),
    probing would start a SECOND TPU process against a held claim —
    _ensure_backend must return without spawning anything."""
    import jax

    jax.devices()  # force in-process backend init

    def boom(*a, **k):
        raise AssertionError("probe subprocess spawned despite live backend")

    monkeypatch.setattr(graft.subprocess, "run", boom)
    graft._ensure_backend()  # must not raise
