"""wandb logging surface, exercised against an injected stub module.

The reference logs to wandb throughout — per-epoch dicts
(mmidas/cpl_mixvae.py:541-560), run init (train.py:135-137), API-mined
run grouping (dist/train_smartseq.py:292-370).  wandb is not installed in
this image, so `utils/logging.MetricLogger`'s wandb branch is covered
here with a fake ``wandb`` module in ``sys.modules``: init kwargs,
log forwarding, auto-group discovery, failure fallbacks, and the trainer's
per-epoch key-set parity with the reference's run.log dict.
"""

import json
import sys
import types

import numpy as np
import pytest

from dvae_tpu.utils.logging import MetricLogger


class FakeRun:
    def __init__(self, group):
        self.group = group


class FakeApi:
    def __init__(self, groups, fail=False):
        self._groups = groups
        self._fail = fail

    def runs(self, project):
        if self._fail:
            raise RuntimeError("network down")
        return [FakeRun(g) for g in self._groups]


def _fake_wandb(api_groups=(), api_fail=False, init_fail=False):
    mod = types.ModuleType("wandb")
    mod.init_calls = []
    mod.logged = []
    mod.finish_count = 0

    def init(**kw):
        if init_fail:
            raise RuntimeError("wandb.init exploded")
        mod.init_calls.append(kw)
        return types.SimpleNamespace(**kw)

    def log(metrics, step=None):
        mod.logged.append((dict(metrics), step))

    def finish():
        mod.finish_count += 1

    mod.init = init
    mod.log = log
    mod.finish = finish
    mod.Api = lambda: FakeApi(api_groups, fail=api_fail)
    return mod


@pytest.fixture
def fake_wandb(monkeypatch):
    def install(**kw):
        mod = _fake_wandb(**kw)
        monkeypatch.setitem(sys.modules, "wandb", mod)
        return mod

    return install


def test_init_log_finish_forwarding(fake_wandb, tmp_path):
    """The core surface: init kwargs (reference train.py:135-137), log
    forwarding with steps (cpl_mixvae.py:541-560), finish — while the
    local history and JSONL stay populated in parallel."""
    mod = fake_wandb()
    jsonl = str(tmp_path / "m.jsonl")
    lg = MetricLogger(use_wandb=True, project="dvae-tpu", run_name="run7",
                      group="exp-3", config={"n_arm": 5}, jsonl_path=jsonl)
    assert mod.init_calls == [{"project": "dvae-tpu", "name": "run7",
                               "group": "exp-3", "config": {"n_arm": 5}}]
    lg.log({"train/loss": 1.5}, step=0)
    lg.log({"train/loss": 1.25}, step=1)
    lg.finish()
    assert mod.logged == [({"train/loss": 1.5}, 0),
                          ({"train/loss": 1.25}, 1)]
    assert mod.finish_count == 1
    assert [r["train/loss"] for r in lg.history] == [1.5, 1.25]
    rows = [json.loads(l) for l in open(jsonl)]
    assert [r["step"] for r in rows] == [0, 1]


def test_auto_group_discovery_increments(fake_wandb):
    """Run grouping mined from the wandb API (reference
    dist/train_smartseq.py:292-370): next group = prefix-<n existing>."""
    mod = fake_wandb(api_groups=["smartseq-0", "smartseq-1", None,
                                 "otherexp-5", "smartseq-1"])
    MetricLogger(use_wandb=True, project="p", auto_group_prefix="smartseq")
    assert mod.init_calls[0]["group"] == "smartseq-2"  # {0,1} seen → 2


def test_auto_group_api_failure_falls_back_to_zero(fake_wandb):
    mod = fake_wandb(api_fail=True)
    MetricLogger(use_wandb=True, project="p", auto_group_prefix="smartseq")
    assert mod.init_calls[0]["group"] == "smartseq-0"


def test_explicit_group_bypasses_api(fake_wandb):
    mod = fake_wandb(api_fail=True)  # Api would raise if consulted
    MetricLogger(use_wandb=True, project="p", group="fixed",
                 auto_group_prefix="smartseq")
    assert mod.init_calls[0]["group"] == "fixed"


def test_init_failure_falls_back_to_local(fake_wandb, capsys):
    """A dead wandb backend must never kill a training run: the logger
    degrades to local history (reference behavior is a hard dependency —
    this exceeds it deliberately)."""
    fake_wandb(init_fail=True)
    lg = MetricLogger(use_wandb=True, project="p")
    assert "falling back to local logging" in capsys.readouterr().out
    lg.log({"train/loss": 2.0}, step=0)  # must not raise
    lg.finish()                          # must not raise
    assert lg.history[0]["train/loss"] == 2.0


def test_disabled_never_touches_wandb(monkeypatch):
    class Boom(types.ModuleType):
        def __getattr__(self, name):
            raise AssertionError("wandb touched while disabled")

    monkeypatch.setitem(sys.modules, "wandb", Boom("wandb"))
    lg = MetricLogger(use_wandb=False)
    lg.log({"a": 1.0})
    lg.finish()
    assert lg.history[0]["a"] == 1.0


def test_trainer_epoch_keys_match_reference_set(fake_wandb, tmp_path):
    """Drive a real (tiny) CplMixVAE.train with use_wandb=True and assert
    every per-epoch wandb dict carries the reference's key set
    (cpl_mixvae.py:541-560) under this build's naming:

        reference run.log key        →  this build
        train/total-loss                train/loss
        train/joint-loss                train/loss_joint
        train/negative-joint-entropy    train/neg_joint_entropy
        train/simplex-distance          train/simplex_distance
        train/l2-distance               train/l2_distance
        train/time                      train/epoch_time_s
        train/mem                       train/device_mb
        train/consensus_aug             train/consensus
        train/rec-loss{a}               train/rec_loss_arm{a}
    """
    from dvae_tpu.data.anndata_io import synthetic_dataset
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    mod = fake_wandb()
    ds = synthetic_dataset(n_cells=96, n_genes=24, n_types=4, seed=0)
    cpl = CplMixVAE(saving_folder=str(tmp_path), use_wandb=True)
    cpl.init_model(n_categories=4, input_dim=24, fc_dim=8, lowD_dim=4,
                   n_arm=2, tau=0.1, batch_size=32, epochs_per_jit=1)
    cpl.train(ds.log1p, n_epoch=2, run_name="keys-test", save_plots=False)

    assert mod.init_calls and mod.init_calls[0]["name"] == "keys-test"
    assert mod.init_calls[0]["config"]["n_arm"] == 2
    epoch_rows = [(m, s) for m, s in mod.logged
                  if any(k.startswith("train/") for k in m)]
    assert len(epoch_rows) == 2
    want = {"train/loss", "train/loss_joint", "train/neg_joint_entropy",
            "train/simplex_distance", "train/l2_distance",
            "train/consensus", "train/epoch_time_s", "train/device_mb",
            "train/rec_loss_arm0", "train/rec_loss_arm1"}
    for m, _ in epoch_rows:
        assert set(m) == want
        assert all(np.isfinite(v) for v in m.values())
    assert [s for _, s in epoch_rows] == [0, 1]
    assert mod.finish_count == 1
