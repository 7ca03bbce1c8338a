"""Backend-availability guards in the driver entry points.

The tunneled TPU backend flaps UNAVAILABLE (and sometimes hangs init) —
round 2's official bench record was null because an outage backoff
outlasted the driver timeout.  bench.py now guarantees a parseable JSON
line within a bounded budget: the parent never touches the backend, emits
the cached last-known-good line (marked stale) as soon as the first probe
fails or hangs and on SIGTERM/SIGALRM, and runs the live measurement in a
killable child that emits a partial line on signals.

Unit tests mock the probe; the end-to-end tests run the REAL ``bench.py``
in a subprocess with the probe body overridden via ``DVAE_PROBE_CODE``
(the outage-simulation seam) and the cache redirected via ``BENCH_CACHE``.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
import __graft_entry__ as graft  # noqa: E402

BENCH = "/root/repo/bench.py"


@pytest.fixture(autouse=True)
def _reset_bench_state():
    bench._EMITTED = False
    bench._PARTIAL.clear()
    yield
    bench._EMITTED = False
    bench._PARTIAL.clear()


class _FakeClock:
    """Deterministic stand-in for time.monotonic/time.sleep: probe waits
    and sleeps advance it, so outage timelines run instantly."""

    def __init__(self):
        self.t = 0.0
        self.slept = []

    def monotonic(self):
        return self.t

    def sleep(self, s):
        self.slept.append(s)
        self.t += s


class _FakeProbe:
    """One probe subprocess: ``waits`` is a list consumed per .wait() call —
    an int exits with that rc; "hang" burns the full timeout and raises.
    The probe is NEVER killed, so a later .wait() may still succeed."""

    def __init__(self, waits, clock):
        self.waits, self.clock = list(waits), clock
        self.killed = False

    def wait(self, timeout=None):
        step = self.waits.pop(0) if self.waits else "hang"
        if step == "hang":
            self.clock.t += timeout
            raise subprocess.TimeoutExpired("probe", timeout)
        return step

    def kill(self):  # pragma: no cover - the point is this never runs
        self.killed = True

    terminate = kill


def _fake_probes(probe_waits):
    """(start_probe, clock, spawned): each start_probe() call consumes the
    next waits-list from ``probe_waits``."""
    clock = _FakeClock()
    spawned = []

    def start_probe():
        spawned.append(_FakeProbe(probe_waits[len(spawned)], clock))
        return spawned[-1]

    return start_probe, clock, spawned


@pytest.fixture
def probe_env(monkeypatch):
    def install(probe_waits):
        start_probe, clock, spawned = _fake_probes(probe_waits)
        from dvae_tpu.utils import backend_probe
        monkeypatch.setattr(backend_probe, "start_probe", start_probe)
        monkeypatch.setattr(bench.time, "monotonic", clock.monotonic)
        monkeypatch.setattr(bench.time, "sleep", clock.sleep)
        return clock, spawned

    return install


# --------------------------------------------------------------------------
# wait_for_backend units (probe mocked)
# --------------------------------------------------------------------------

def test_wait_for_backend_immediate_success(probe_env):
    clock, spawned = probe_env([[0]])
    hooks = []
    assert bench.wait_for_backend(budget_s=600,
                                  on_first_failure=hooks.append) is True
    assert len(spawned) == 1
    assert hooks == []  # hook fires only on failure


def test_wait_for_backend_fast_fail_small_budget_fires_hook(probe_env):
    """A fast-failing probe with no budget for retry+measurement must
    return False after ONE probe — but only after firing the
    emit-stale-now hook."""
    clock, spawned = probe_env([[1]])
    hooks = []
    assert bench.wait_for_backend(budget_s=30.0, poll_s=60.0,
                                  on_first_failure=hooks.append) is False
    assert len(spawned) == 1
    assert clock.slept == []
    assert hooks == ["probe failed fast"]


def test_wait_for_backend_retries_then_succeeds(probe_env):
    clock, spawned = probe_env([[1], [1], [0]])
    hooks = []
    assert bench.wait_for_backend(budget_s=3600, poll_s=7.0,
                                  on_first_failure=hooks.append) is True
    assert len(spawned) == 3
    assert clock.slept == [7.0, 7.0]
    assert hooks == ["probe failed fast"]  # fires ONCE, not per retry


def test_wait_for_backend_hung_probe_waits_it_out_never_kills(probe_env):
    """A hung probe is NEVER killed (a mid-claim kill is what creates the
    next ~20 min wedge — observed live 2026-08-19) and NEVER replaced:
    wait_for_backend keeps waiting on the same handle in probe_timeout_s
    slices until the budget (minus the measurement reserve) runs out,
    then returns False leaving the probe orphaned."""
    clock, spawned = probe_env([["hang"] * 50])
    hooks = []
    assert bench.wait_for_backend(budget_s=600, probe_timeout_s=150.0,
                                  poll_s=60.0, reserve_s=420.0,
                                  on_first_failure=hooks.append) is False
    # hook fired at the FIRST timeout (stale line goes out ~150 s in)
    assert hooks and "hung" in hooks[0]
    assert hooks == [hooks[0]]
    assert len(spawned) == 1          # same probe throughout
    assert not spawned[0].killed      # and it was never killed
    assert clock.slept == []          # the probe's own wait paces the loop
    # slices are capped at deadline - reserve: one full 150 s slice, one
    # 30 s capped slice (600-420-150), then a zero-width check bails —
    # a success can never land inside the 420 s measurement reserve
    assert clock.t == 180.0


def test_wait_for_backend_hung_probe_succeeds_on_recovery(probe_env):
    """The tunnel comes back mid-outage: the SAME hung probe completes
    (measured live: within a second of recovery) and wait_for_backend
    returns True without ever having spawned a second TPU process."""
    clock, spawned = probe_env([["hang", "hang", 0]])
    hooks = []
    assert bench.wait_for_backend(budget_s=7200, probe_timeout_s=150.0,
                                  on_first_failure=hooks.append) is True
    assert len(spawned) == 1
    assert not spawned[0].killed
    assert hooks and "hung" in hooks[0]


def test_wait_for_backend_hung_probe_late_failure_retries_fresh(probe_env):
    """A hung probe that eventually exits NONZERO (backend returned but
    errored) falls back to the fast-fail retry path with a fresh probe."""
    clock, spawned = probe_env([["hang", 1], [0]])
    assert bench.wait_for_backend(budget_s=7200, poll_s=60.0) is True
    assert len(spawned) == 2
    assert clock.slept == [60.0]


# --------------------------------------------------------------------------
# stale / partial emission units
# --------------------------------------------------------------------------

def _cache_line(**over):
    line = {"metric": "train_throughput_A5_smartseq", "value": 123456.0,
            "unit": "cells/sec/chip", "vs_baseline": 4.938,
            "extra": {"infer_throughput_A5": 99.0},
            "_measured_at": "2026-08-19 03:14 UTC"}
    line.update(over)
    return line


def test_emit_stale_marks_and_prints(tmp_path, monkeypatch, capsys):
    cache = tmp_path / "c.json"
    cache.write_text(json.dumps(_cache_line()))
    monkeypatch.setattr(bench, "_CACHE", str(cache))
    assert bench._emit_stale("unit test") is True
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 123456.0
    assert out["extra"]["stale_from_cache"] is True
    assert out["extra"]["stale_reason"] == "unit test"
    assert out["extra"]["cached_at"] == "2026-08-19 03:14 UTC"
    assert "_measured_at" not in out
    # second call is a no-op (one line per process)
    assert bench._emit_stale("again") is True
    assert capsys.readouterr().out == ""


def test_emit_stale_without_cache_returns_false(tmp_path, monkeypatch,
                                                capsys):
    monkeypatch.setattr(bench, "_CACHE", str(tmp_path / "missing.json"))
    assert bench._emit_stale("no cache") is False
    assert capsys.readouterr().out == ""


def test_emit_partial_requires_headline(capsys):
    assert bench._emit_partial("sig") is False
    assert capsys.readouterr().out == ""
    bench._PARTIAL.update({"value": 1.0, "vs_baseline": 0.1,
                           "extra": {"device_ms_per_step": 2.58}})
    assert bench._emit_partial("sig") is True
    out = json.loads(capsys.readouterr().out.strip())
    assert out["extra"]["partial"] is True
    assert out["extra"]["device_ms_per_step"] == 2.58


def test_write_cache_carries_unmeasured_extras(tmp_path, monkeypatch):
    """A partial run must not clobber extras the previous full run
    measured — they are carried forward and named in carried_keys."""
    cache = tmp_path / "c.json"
    cache.write_text(json.dumps(_cache_line(
        extra={"train_throughput_A5_zinb": 5.0, "stale_from_cache": True,
               "partial": True})))
    monkeypatch.setattr(bench, "_CACHE", str(cache))
    bench._write_cache({"metric": "train_throughput_A5_smartseq",
                        "value": 200.0, "unit": "cells/sec/chip",
                        "vs_baseline": 0.008,
                        "extra": {"infer_throughput_A5": 7.0}})
    got = json.loads(cache.read_text())
    assert got["value"] == 200.0
    assert got["extra"]["infer_throughput_A5"] == 7.0
    assert got["extra"]["train_throughput_A5_zinb"] == 5.0  # carried
    assert got["extra"]["carried_keys"] == ["train_throughput_A5_zinb"]
    # stale/partial markers never persist into the cache
    assert "stale_from_cache" not in got["extra"]
    assert "partial" not in got["extra"]
    assert "_measured_at" in got


def test_write_cache_never_carries_old_skipped_list(tmp_path, monkeypatch):
    """`skipped` describes one specific run; a fully-fresh run must not
    inherit the previous run's skip annotations (seen live 2026-08-19:
    a full re-measure replayed 'budget' skips from the prior partial)."""
    cache = tmp_path / "c.json"
    cache.write_text(json.dumps(_cache_line(
        extra={"train_throughput_A5_zinb": 5.0,
               "skipped": ["train_throughput_A5_zinb: budget"]})))
    monkeypatch.setattr(bench, "_CACHE", str(cache))
    bench._write_cache({"metric": "train_throughput_A5_smartseq",
                        "value": 200.0, "unit": "cells/sec/chip",
                        "vs_baseline": 0.008,
                        "extra": {"train_throughput_A5_zinb": 6.0}})
    got = json.loads(cache.read_text())
    assert got["extra"]["train_throughput_A5_zinb"] == 6.0
    assert "skipped" not in got["extra"]
    assert "carried_keys" not in got["extra"]
    # ...while a run that itself skipped keeps its own annotation
    bench._write_cache({"metric": "train_throughput_A5_smartseq",
                        "value": 210.0, "unit": "cells/sec/chip",
                        "vs_baseline": 0.008,
                        "extra": {"skipped": ["device_census: budget"]}})
    got = json.loads(cache.read_text())
    assert got["extra"]["skipped"] == ["device_census: budget"]


def test_write_cache_strips_markers_from_the_written_result(tmp_path,
                                                            monkeypatch):
    """The parent caches a PARTIAL live line verbatim (`main()`:
    `if fresh.extra.partial: _write_cache(fresh)`) — the markers must be
    stripped from the result side too, or a later stale replay carries
    both partial=True and stale_from_cache=True."""
    cache = tmp_path / "c.json"
    monkeypatch.setattr(bench, "_CACHE", str(cache))
    bench._write_cache({"metric": "train_throughput_A5_smartseq",
                        "value": 300.0, "unit": "cells/sec/chip",
                        "vs_baseline": 0.01,
                        "extra": {"partial": True,
                                  "partial_reason": "signal 15",
                                  "stale_from_cache": True,
                                  "infer_throughput_A5": 7.0}})
    got = json.loads(cache.read_text())
    assert got["value"] == 300.0
    assert got["extra"]["infer_throughput_A5"] == 7.0
    for marker in ("partial", "partial_reason", "stale_from_cache",
                   "stale_reason", "cached_at", "carried_keys"):
        assert marker not in got["extra"], marker


def test_parse_last_json_takes_last_result_line():
    out = "\n".join([
        json.dumps({"metric": "m", "value": 1.0, "extra": {"partial": True}}),
        "bench: some stderr-ish noise {not json",
        json.dumps({"metric": "m", "value": 2.0}),
        json.dumps({"no_metric": True}),
    ])
    assert bench._parse_last_json(out)["value"] == 2.0
    assert bench._parse_last_json("nothing here") is None


# --------------------------------------------------------------------------
# end-to-end driver contract (real bench.py subprocess, probe overridden)
# --------------------------------------------------------------------------

def _reap_probe(pidfile):
    """Kill the SLEEPING probe grandchild a bench e2e test left behind.

    Test probes are plain ``time.sleep`` processes (never TPU claims), so
    killing is safe — and it's by exact pid + kernel starttime from the
    registration file, never by pattern."""
    from dvae_tpu.utils.backend_probe import _proc_starttime, _read_pidfile

    rec = _read_pidfile(str(pidfile))
    if rec is None:
        return
    pid, start, _, _ = rec
    if _proc_starttime(pid) == start:
        try:
            os.kill(pid, signal.SIGKILL)
        except OSError:
            pass


def _run_bench(tmp_path, probe_code, budget="30", extra_env=None,
               cache=True, timeout=90, sigterm_on_file=None):
    """``sigterm_on_file``: send SIGTERM once this file appears (written by
    the probe grandchild — proof the parent is past _install_guards; a
    fixed sleep races python startup on a loaded 1-core box)."""
    cache_path = tmp_path / "cache.json"
    if cache:
        cache_path.write_text(json.dumps(_cache_line()))
    pidfile = tmp_path / "probe.pid"
    env = dict(os.environ)
    env.update({"DVAE_PROBE_CODE": probe_code,
                "BENCH_BUDGET_S": budget,
                "BENCH_CACHE": str(cache_path),
                # private registration: the test probe must never touch a
                # real probe's pidfile, and the sleeping grandchild gets
                # reaped at the end instead of outliving the test
                "DVAE_PROBE_PIDFILE": str(pidfile)})
    env.update(extra_env or {})
    proc = subprocess.Popen([sys.executable, BENCH], env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)
    try:
        if sigterm_on_file is not None:
            deadline = time.monotonic() + 60
            while not os.path.exists(sigterm_on_file):
                if time.monotonic() > deadline:
                    proc.kill()
                    raise AssertionError("probe sentinel never appeared")
                time.sleep(0.1)
            proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=timeout)
    finally:
        _reap_probe(pidfile)
    return proc.returncode, out


def test_bench_emits_stale_line_on_fast_probe_failure(tmp_path):
    """Backend down (probe fast-fails): a parseable stale line within
    seconds, rc=0 — the round-2 null-record failure mode, fixed.

    Timing-sensitive: on a heavily loaded 1-core host the trivial probe
    subprocess can take longer than the parent's 5 s first wait slice to
    even exit, and the parent then (correctly, per its rules) reports
    "probe hung" instead of "probe failed fast".  One retry absorbs that
    load transient; the assertion stays strict."""
    for attempt in range(2):
        t0 = time.monotonic()
        rc, out = _run_bench(tmp_path, "import sys; sys.exit(1)")
        assert rc == 0
        assert time.monotonic() - t0 < 60
        line = bench._parse_last_json(out)
        assert line is not None and line["value"] == 123456.0
        assert line["extra"]["stale_from_cache"] is True
        if ("probe failed fast" in line["extra"]["stale_reason"]
                or attempt == 1):
            assert "probe failed fast" in line["extra"]["stale_reason"]
            return


def test_bench_emits_stale_line_on_hung_probe(tmp_path):
    """Backend hangs: stale line as soon as the first probe wait times
    out, rc=0 within the (small) budget.  The hung probe is left running
    — never killed — and exits on its own when its sleep ends."""
    rc, out = _run_bench(tmp_path, "import time; time.sleep(45)",
                         budget="20",
                         extra_env={"BENCH_PROBE_TIMEOUT_S": "1"})
    assert rc == 0
    line = bench._parse_last_json(out)
    assert line is not None
    assert line["extra"]["stale_from_cache"] is True
    assert "hung" in line["extra"]["stale_reason"]


def test_bench_emits_stale_line_on_sigterm_while_waiting(tmp_path):
    """Driver kills bench while it waits on a hung probe: the SIGTERM
    handler dumps the cache line before dying, rc=0."""
    sentinel = tmp_path / "probe_started"
    rc, out = _run_bench(
        tmp_path,
        f"import time, pathlib; "
        f"pathlib.Path({str(sentinel)!r}).write_text('x'); time.sleep(60)",
        budget="600", sigterm_on_file=str(sentinel))
    assert rc == 0
    line = bench._parse_last_json(out)
    assert line is not None
    assert line["extra"]["stale_from_cache"] is True
    assert "signal" in line["extra"]["stale_reason"]


def test_bench_fails_loudly_without_cache(tmp_path):
    """No cache AND no backend: nothing useful to print — nonzero exit
    (never a fabricated number)."""
    rc, out = _run_bench(tmp_path, "import sys; sys.exit(1)", cache=False,
                         budget="10")
    assert rc != 0
    assert bench._parse_last_json(out) is None


class TestCacheWarmReserve:
    """With the headline executable in the persistent compile cache, the
    parent keeps probing 180 s deeper into the budget (reserve 240 vs
    420) before settling for a stale line."""

    def test_warm_cache_detected(self, tmp_path, monkeypatch):
        monkeypatch.setenv("DVAE_COMPILE_CACHE", str(tmp_path))
        assert bench._cache_is_warm() is False
        (tmp_path / "jit_run_epochs-abc123-cache").write_bytes(b"x")
        assert bench._cache_is_warm() is True

    def test_cache_disabled_is_cold(self, monkeypatch):
        monkeypatch.setenv("DVAE_COMPILE_CACHE", "0")
        assert bench._cache_is_warm() is False


# --------------------------------------------------------------------------
# probe adoption (the orphan-dedup pidfile)
# --------------------------------------------------------------------------

class TestProbeAdoption:
    """During an outage every caller must share the ONE pending probe
    (each probe is a full Python+JAX process; without dedup they pile up
    and all fire TPU ops at once on recovery)."""

    @pytest.fixture(autouse=True)
    def _isolated(self, tmp_path, monkeypatch):
        monkeypatch.setenv("DVAE_PROBE_PIDFILE", str(tmp_path / "p.pid"))
        self.tmp = tmp_path

    def test_pending_probe_adopted_not_duplicated(self, monkeypatch):
        monkeypatch.setenv("DVAE_PROBE_CODE", "import time; time.sleep(60)")
        from dvae_tpu.utils import backend_probe as bp
        p1 = bp.start_probe()
        try:
            p2 = bp.start_probe()
            assert isinstance(p2, bp.AdoptedProbe)
            assert p2.pid == p1.pid
            assert p2.poll() is None
            with pytest.raises(subprocess.TimeoutExpired):
                p2.wait(timeout=0.3)
        finally:
            p1.kill()      # a sleep process, never a TPU claim
            p1.wait()
        # died without the done-file: the adopted handle reports failure,
        # and the NEXT caller spawns fresh instead of adopting a corpse
        assert p2.wait(timeout=5) == 1
        p3 = bp.start_probe()
        try:
            assert not isinstance(p3, bp.AdoptedProbe)
            assert p3.pid != p1.pid
        finally:
            p3.kill()
            p3.wait()

    def test_adopted_handle_sees_success_via_done_file(self, monkeypatch):
        monkeypatch.setenv("DVAE_PROBE_CODE", "import time; time.sleep(1)")
        from dvae_tpu.utils import backend_probe as bp
        p1 = bp.start_probe()
        p2 = bp.start_probe()
        assert isinstance(p2, bp.AdoptedProbe)
        assert p1.wait(timeout=30) == 0
        assert p2.wait(timeout=10) == 0

    def test_finished_probe_never_adopted(self, monkeypatch):
        """A completed probe is a STALE answer — a fresh caller must probe
        fresh, not inherit a success from minutes ago."""
        monkeypatch.setenv("DVAE_PROBE_CODE", "x = 1")
        from dvae_tpu.utils import backend_probe as bp
        p1 = bp.start_probe()
        assert p1.wait(timeout=30) == 0
        p2 = bp.start_probe()
        try:
            assert not isinstance(p2, bp.AdoptedProbe)
            assert p2.wait(timeout=30) == 0
        finally:
            pass

    def test_different_probe_body_not_adopted(self, monkeypatch):
        """The DVAE_PROBE_CODE test seam and the real probe must never
        adopt each other (hash mismatch)."""
        monkeypatch.setenv("DVAE_PROBE_CODE", "import time; time.sleep(60)")
        from dvae_tpu.utils import backend_probe as bp
        p1 = bp.start_probe()
        try:
            monkeypatch.setenv("DVAE_PROBE_CODE",
                               "import time; time.sleep(2)")
            p2 = bp.start_probe()
            try:
                assert not isinstance(p2, bp.AdoptedProbe)
                assert p2.pid != p1.pid
            finally:
                p2.kill()
                p2.wait()
        finally:
            p1.kill()
            p1.wait()


# --------------------------------------------------------------------------
# __graft_entry__ guard (unchanged behavior)
# --------------------------------------------------------------------------

def test_ensure_backend_skips_probe_when_initialized(monkeypatch):
    """With an in-process backend already up (the test suite's CPU mesh),
    probing would start a SECOND TPU process against a held claim —
    _ensure_backend must return without spawning anything."""
    import jax

    jax.devices()  # force in-process backend init

    def boom(*a, **k):
        raise AssertionError("probe subprocess spawned despite live backend")

    from dvae_tpu.utils import backend_probe

    monkeypatch.setattr(backend_probe, "start_probe", boom)
    monkeypatch.setattr(graft.subprocess, "run", boom)
    graft._ensure_backend()  # must not raise
