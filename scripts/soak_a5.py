"""Production-scale A=5 soak on the real chip, end-to-end through the CLI.

The reference's long-run regime (train-scripts/run-train-A5-E500000-a100.sh:3-14:
A=5 arms, B=5000, 5032 genes, 92 categories, hundreds of thousands of
epochs on one device) exercised here as one resumable soak that drives
every production subsystem in sequence — and proves the preemption story
the reference doesn't have by *actually preempting the run*:

  1. ``cli train --synthetic`` at the production shape (N=20000 planted
     92-type cells, 90/10 stratified split) on the TPU fast path (bf16 +
     fused Pallas kernels + hardware RNG + block shuffle), 500-epoch jit
     chunks, checkpoints every ``--ckpt-every`` epochs.
  2. At ``--preempt-frac`` of the epoch budget (parsed live from the
     trainer's per-chunk log lines) the orchestrator SIGTERMs the trainer.
     PreemptionGuard checkpoints at the next chunk boundary and exits
     cleanly (SURVEY §5.3; a TPU process must never die mid-claim — the
     guard is also what makes this drill safe on the tunneled chip).
  3. Relaunch with ``--resume``: same command, picks the newest run dir
     and its latest checkpoint, runs the remaining epochs.
  4. ``cli evaluate`` on the run folder → the reference artifact contract
     ``evaluation/A5-RUN0-E{n}.npy`` (reference evaluation.py:92-127).
  5. Held-out AMI vs the planted truth per arm + arm-arm agreement
     (reference's north-star metrics, evaluation.py:25-41) from the
     best-consensus checkpoint.

Artifacts land in ``--out`` (default runs/soak_A5): the run folder with
its epoch/best/preempt checkpoint trail and loss/consensus PNGs, phase
logs, the evaluation ``.npy``, and ``SOAK_A5.json`` (wall time per phase,
final consensus, AMI table) — the README's soak row quotes that JSON.

Run: ``python scripts/soak_a5.py [--n-epoch 100000] [--mode MSE]``
(~25-40 min wall on a v5e-1 at the measured 2.58 ms/step hot path; ONE
TPU process at a time — don't run bench.py concurrently).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_EPOCH_LINE = re.compile(r"\[train\] epoch (\d+):")


def _train_cmd(args, resume: bool) -> list:
    cmd = [
        sys.executable, "-m", "dvae_tpu.cli", "train",
        "--synthetic", "--syn_cells", str(args.syn_cells),
        "--syn_genes", str(args.syn_genes),
        "--syn_types", str(args.n_categories),
        "--n_categories", str(args.n_categories), "--n_arm", str(args.n_arm),
        "--batch_size", str(args.batch_size),
        "--epochs_per_jit", str(args.epochs_per_jit),
        "--n_epoch", str(args.n_epoch),
        "--lam", "5.0", "--seed", str(args.seed),
        "--loss_mode", args.mode,
        "--bf16", "--fused", "on", "--rng_impl", "rbg",
        "--shuffle_block", "8",
        "--ckpt_every", str(args.ckpt_every),
        "--eval_every", str(args.eval_every),
        "--saving_folder", args.out,
    ]
    if resume:
        cmd.append("--resume")
    return cmd


def _run_phase(cmd: list, log_path: str, preempt_at: int | None,
               timeout_s: float, drain_s: float = 1200.0) -> dict:
    """Run one trainer invocation, teeing stdout to ``log_path``.

    ``preempt_at``: SIGTERM the child once its log reports reaching this
    epoch (the PreemptionGuard drill); None = run to completion.  A reader
    thread feeds lines through a queue so ``timeout_s`` fires even when
    the trainer goes silent (the wedged-TPU failure mode: every op hangs,
    nothing prints).  On timeout the child gets SIGTERM (the guard
    checkpoints and exits cleanly — never hard-kill a live TPU process);
    only if it ignores that for ``drain_s`` is it SIGKILLed (already
    wedged; freeing the host costs at most the wedge window the hang is
    already paying).  Returns {rc, wall_s, last_epoch, preempted,
    timed_out, hung}.
    """
    import queue
    import threading

    t0 = time.time()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["PYTHONUNBUFFERED"] = "1"
    last_epoch, drilled, timed_out, hung = 0, False, False, False
    with open(log_path, "w") as log:
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True,
                                env=env, cwd=REPO)
        q: queue.Queue = queue.Queue()
        reader = threading.Thread(
            target=lambda: ([q.put(ln) for ln in proc.stdout],
                            q.put(None)),
            daemon=True)
        reader.start()
        eof = False
        term_t = None   # when the timeout SIGTERM was actually sent — the
        #                 drain window is measured from HERE, not from
        #                 timeout_s (queue polls can deliver the timeout
        #                 late on a loaded host; a child that then dies
        #                 promptly must not be mislabeled hung)
        while not eof:
            try:
                line = q.get(timeout=2.0)
            except queue.Empty:
                line = ""
            if line is None:
                eof = True
                continue
            elif line:
                log.write(line)
                log.flush()
                m = _EPOCH_LINE.search(line)
                if m:
                    last_epoch = int(m.group(1))
                    print(f"  {line.rstrip()}", flush=True)
                if (preempt_at is not None and not drilled
                        and last_epoch >= preempt_at):
                    print(f"  >>> SIGTERM at epoch {last_epoch} "
                          f"(PreemptionGuard drill)", flush=True)
                    proc.send_signal(signal.SIGTERM)
                    drilled = True
            now = time.time()
            if not timed_out and now - t0 > timeout_s:
                print(f"  >>> phase timeout after {timeout_s:.0f}s: SIGTERM "
                      f"(guard checkpoints at the next chunk boundary)",
                      flush=True)
                proc.send_signal(signal.SIGTERM)
                timed_out, term_t = True, now
            if timed_out and now - term_t > drain_s:
                print("  >>> child ignored SIGTERM past the drain window — "
                      "SIGKILL (treating it as wedged)", flush=True)
                proc.kill()
                hung = True
                break
        try:
            rc = proc.wait(timeout=60 if hung else drain_s)
        except subprocess.TimeoutExpired:
            proc.kill()
            rc, hung = proc.wait(timeout=60), True
    return {"rc": rc, "wall_s": round(time.time() - t0, 1),
            "last_epoch": last_epoch, "preempted": drilled,
            "timed_out": timed_out, "hung": hung}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-epoch", type=int, default=100_000)
    ap.add_argument("--n-arm", type=int, default=5)
    ap.add_argument("--mode", default="MSE", choices=["MSE", "ZINB"])
    ap.add_argument("--epochs-per-jit", type=int, default=500)
    ap.add_argument("--ckpt-every", type=int, default=10_000)
    ap.add_argument("--eval-every", type=int, default=5_000)
    ap.add_argument("--preempt-frac", type=float, default=0.4,
                    help="SIGTERM the first trainer at this fraction of "
                         "the epoch budget; 0 disables the drill")
    ap.add_argument("--seed", type=int, default=546)
    ap.add_argument("--out", default="runs/soak_A5")
    ap.add_argument("--phase-timeout-s", type=float, default=5400)
    ap.add_argument("--resume-soak", action="store_true",
                    help="the orchestrator itself is resumable: if a "
                         "previous invocation completed phase 1 (its log + "
                         "a preempt checkpoint exist under --out) but died "
                         "before finishing, reconstruct phase 1's record "
                         "from the log and continue from the resume phase")
    # production shape by default; shrink for an orchestration smoke test
    ap.add_argument("--syn-cells", type=int, default=20_000)
    ap.add_argument("--syn-genes", type=int, default=5032)
    ap.add_argument("--n-categories", type=int, default=92)
    ap.add_argument("--batch-size", type=int, default=5000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    summary = {"config": vars(args), "phases": {}}
    t0 = time.time()

    # phase 1+2: train until the drill point, SIGTERM, let the guard save
    preempt_at = (int(args.n_epoch * args.preempt_frac)
                  if args.preempt_frac > 0 else None)
    p1 = _reconstruct_phase1(args) if args.resume_soak else None
    if p1 is not None:
        print(f"phase 1 (reconstructed from a prior invocation): {p1}",
              flush=True)
    else:
        p1 = _run_phase(_train_cmd(args, resume=False),
                        os.path.join(args.out, "phase1_train.log"),
                        preempt_at, args.phase_timeout_s)
    summary["phases"]["train_until_preempt"] = p1
    print(f"phase 1: {p1}", flush=True)
    if p1["rc"] != 0:
        print("phase 1 trainer exited nonzero — aborting soak")
        _finish(args, summary, t0, ok=False)
        return 1

    # phase 3: resume to completion — after the drill OR a phase timeout
    # (both leave a guard checkpoint short of the budget)
    completed = p1["last_epoch"]
    if completed < args.n_epoch:
        p2 = _run_phase(_train_cmd(args, resume=True),
                        os.path.join(args.out, "phase2_resume.log"),
                        None, args.phase_timeout_s)
        summary["phases"]["resume_to_completion"] = p2
        print(f"phase 2: {p2}", flush=True)
        if p2["rc"] != 0:
            print("resume trainer exited nonzero — aborting soak")
            _finish(args, summary, t0, ok=False)
            return 1
        completed = max(completed, p2["last_epoch"])
    # evaluate under the epoch count actually reached: a timed-out soak
    # must never publish a partial model under the full-budget .npy name
    summary["completed_epochs"] = completed
    if completed < args.n_epoch:
        print(f"soak incomplete: reached epoch {completed} of "
              f"{args.n_epoch} — evaluating under E{completed}")

    # phase 4+5: reference .npy artifact + north-star metrics
    from glob import glob
    run_dirs = sorted(glob(os.path.join(args.out, "*_RUN*")),
                      key=os.path.getmtime)
    assert run_dirs, f"no run dir under {args.out}"
    folder = run_dirs[-1]
    summary["run_folder"] = folder
    env = {**os.environ,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    base = [sys.executable, "-m", "dvae_tpu.cli", "evaluate",
            "--saving_folder", folder, "--n_arm", str(args.n_arm),
            "--n_epoch", str(completed),
            "--batch_size", str(args.batch_size),
            "--seed", str(args.seed),
            "--synthetic", "--syn_cells", str(args.syn_cells),
            "--syn_genes", str(args.syn_genes),
            "--syn_types", str(args.n_categories)]
    best = os.path.join(folder, "cpl_mixVAE_model_best_train.ckpt")
    evals = {"final": base}           # latest epoch ckpt → RUN0 .npy
    if os.path.exists(best):          # consensus-peak ckpt → RUN1 .npy
        evals["best_consensus"] = base + ["--ckpt", best, "--run", "1"]
    rc_all = 0
    for name, cmd in evals.items():
        ev = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                            env=env, timeout=3600)
        (open(os.path.join(args.out, f"phase3_evaluate_{name}.log"), "w")
         .write(ev.stdout + ev.stderr))
        rc_all |= ev.returncode
        # cmd_evaluate's last stdout line is the metrics dict (per-arm
        # adjusted MI vs the planted truth, pairwise/all consensus)
        for line in reversed(ev.stdout.strip().splitlines()):
            try:
                summary.setdefault("metrics", {})[name] = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        print(f"evaluate[{name}] rc={ev.returncode}", flush=True)
    summary["phases"]["evaluate"] = {"rc": rc_all}
    npy = os.path.join(REPO, "evaluation",
                       f"A{args.n_arm}-RUN0-E{completed}.npy")
    summary["evaluation_npy"] = npy if os.path.exists(npy) else None
    ok = rc_all == 0 and completed >= args.n_epoch
    _finish(args, summary, t0, ok=ok)
    return 0 if ok else 1


def _reconstruct_phase1(args) -> dict | None:
    """Rebuild phase 1's record from its log after an orchestrator death.

    Only succeeds when the log shows a clean PreemptionGuard exit (the
    "preempted: checkpointed at epoch N" line) and the preempt checkpoint
    is actually on disk — anything less means phase 1 must be rerun.
    """
    from glob import glob
    log_path = os.path.join(args.out, "phase1_train.log")
    if not os.path.exists(log_path):
        return None
    last_epoch, ckpt_epoch = 0, None
    for line in open(log_path):
        m = _EPOCH_LINE.search(line)
        if m:
            last_epoch = int(m.group(1))
        m = re.search(r"preempted: checkpointed at epoch (\d+)", line)
        if m:
            ckpt_epoch = int(m.group(1))
    if ckpt_epoch is None:
        return None
    pattern = os.path.join(args.out, "*_RUN*",
                           f"cpl_mixVAE_model_preempt_epoch_{ckpt_epoch}.ckpt")
    if not glob(pattern):
        return None
    return {"rc": 0, "wall_s": None, "last_epoch": last_epoch,
            "preempted": True, "reconstructed_from_log": True}


def _finish(args, summary: dict, t0: float, ok: bool) -> None:
    summary["ok"] = ok
    summary["wall_min"] = round((time.time() - t0) / 60, 1)
    path = os.path.join(args.out, "SOAK_A5.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2, default=str)
    print(f"soak summary → {path}\n{json.dumps(summary, indent=2, default=str)}")


if __name__ == "__main__":
    sys.exit(main())
