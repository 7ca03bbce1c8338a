"""Units for the soak orchestrator (scripts/soak_a5.py): phase runner
timeout/drill semantics and the --resume-soak phase-1 reconstruction.

The production run itself is the committed artifact set
(artifacts/soak_A5/); these tests pin the orchestration machinery with
fake trainers so the hardening (silent-hang timeout, drill vs timeout
accounting, log-based resume) cannot regress unnoticed.  No TPU, no JAX.
"""

import importlib.util
import os
import sys
import textwrap

import pytest

_SOAK = os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "soak_a5.py")


@pytest.fixture(scope="module")
def soak():
    spec = importlib.util.spec_from_file_location("soak_a5", _SOAK)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _child(body: str) -> list:
    return [sys.executable, "-u", "-c", textwrap.dedent(body)]


class TestRunPhase:
    def test_clean_completion(self, soak, tmp_path):
        cmd = _child("""
            for e in (10, 20, 30):
                print(f"[train] epoch {e}: loss=1.0")
        """)
        r = soak._run_phase(cmd, str(tmp_path / "p.log"), None, 60)
        assert r == {"rc": 0, "wall_s": r["wall_s"], "last_epoch": 30,
                     "preempted": False, "timed_out": False, "hung": False}
        assert "[train] epoch 30" in (tmp_path / "p.log").read_text()

    def test_drill_sigterms_at_epoch(self, soak, tmp_path):
        # fake trainer with a PreemptionGuard analogue: on SIGTERM it
        # reports and exits 0 (the real guard checkpoints first)
        cmd = _child("""
            import signal, sys, time
            def onterm(s, f):
                print("preempted: checkpointed at epoch 20")
                sys.exit(0)
            signal.signal(signal.SIGTERM, onterm)
            for e in (10, 20, 30, 40):
                print(f"[train] epoch {e}: loss=1.0")
                time.sleep(0.3)
        """)
        r = soak._run_phase(cmd, str(tmp_path / "p.log"), 20, 60)
        assert r["rc"] == 0 and r["preempted"] is True
        assert r["timed_out"] is False and r["hung"] is False
        assert 20 <= r["last_epoch"] < 40

    def test_silent_hang_hits_timeout(self, soak, tmp_path):
        # trainer goes silent without exiting (the wedged-TPU mode): the
        # reader-thread queue must let timeout_s fire anyway — the old
        # `for line in proc.stdout` loop blocked here forever
        cmd = _child("""
            import time
            print("[train] epoch 5: loss=1.0")
            time.sleep(600)
        """)
        # timeout_s must outlast interpreter startup on a loaded 1-core
        # host, or SIGTERM lands before the child ever prints
        r = soak._run_phase(cmd, str(tmp_path / "p.log"), None,
                            timeout_s=8.0, drain_s=8.0)
        assert r["timed_out"] is True
        assert r["last_epoch"] == 5
        # bounded, not the child's 600 s sleep (generous: queue polls and
        # process scheduling stretch under a saturated 1-core host)
        assert r["wall_s"] < 180
        # default SIGTERM disposition killed it: nonzero rc, not hung
        assert r["rc"] != 0 and r["hung"] is False

    def test_sigterm_ignoring_child_is_killed_after_drain(self, soak,
                                                          tmp_path):
        cmd = _child("""
            import signal, time
            signal.signal(signal.SIGTERM, signal.SIG_IGN)
            print("[train] epoch 1: loss=1.0")
            time.sleep(600)
        """)
        r = soak._run_phase(cmd, str(tmp_path / "p.log"), None,
                            timeout_s=8.0, drain_s=4.0)
        assert r["timed_out"] is True and r["hung"] is True
        assert r["wall_s"] < 180


class TestReconstructPhase1:
    def _args(self, soak, tmp_path):
        import argparse
        return argparse.Namespace(out=str(tmp_path))

    def _write(self, tmp_path, log_lines, ckpt_epoch=None):
        (tmp_path / "phase1_train.log").write_text("\n".join(log_lines))
        if ckpt_epoch is not None:
            run = tmp_path / "K8_RUN0"
            run.mkdir(exist_ok=True)
            (run / f"cpl_mixVAE_model_preempt_epoch_{ckpt_epoch}.ckpt"
             ).write_bytes(b"x")

    def test_reconstructs_from_clean_guard_exit(self, soak, tmp_path):
        self._write(tmp_path, ["[train] epoch 10: loss=2.0",
                               "[train] epoch 40: loss=1.0",
                               "preempted: checkpointed at epoch 40"],
                    ckpt_epoch=40)
        r = soak._reconstruct_phase1(self._args(soak, tmp_path))
        assert r == {"rc": 0, "wall_s": None, "last_epoch": 40,
                     "preempted": True, "reconstructed_from_log": True}

    def test_none_without_guard_line(self, soak, tmp_path):
        self._write(tmp_path, ["[train] epoch 40: loss=1.0"],
                    ckpt_epoch=40)
        assert soak._reconstruct_phase1(self._args(soak, tmp_path)) is None

    def test_none_without_checkpoint_on_disk(self, soak, tmp_path):
        self._write(tmp_path, ["preempted: checkpointed at epoch 40"])
        assert soak._reconstruct_phase1(self._args(soak, tmp_path)) is None

    def test_none_without_log(self, soak, tmp_path):
        assert soak._reconstruct_phase1(self._args(soak, tmp_path)) is None
