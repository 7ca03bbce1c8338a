"""CLI tests: in-process invocation of every subcommand on synthetic data."""

import glob
import json
import os

import numpy as np
import pytest

from dvae_tpu.cli import main

_TINY = ["--synthetic", "--syn_cells", "200", "--syn_genes", "40",
         "--syn_types", "6", "--n_categories", "6", "--fc_dim", "12",
         "--latent_dim", "6", "--n_arm", "2", "--tau", "0.1"]


def test_train_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(["train", *_TINY, "--n_epoch", "2", "--epochs_per_jit", "2",
               "--batch_size", "40", "--saving_folder", str(tmp_path) + "/"])
    assert rc == 0
    ckpts = glob.glob(str(tmp_path) + "/*RUN0/*.ckpt")
    assert ckpts, "no checkpoint written"
    assert glob.glob(str(tmp_path) + "/*RUN0/metrics.jsonl")


def test_train_cli_hard_synthetic(tmp_path, monkeypatch):
    """--syn_hard routes to the ZINB-count hard-mode generator."""
    monkeypatch.chdir(tmp_path)
    rc = main(["train", *_TINY, "--syn_hard", "--n_epoch", "2",
               "--epochs_per_jit", "2", "--batch_size", "40",
               "--saving_folder", str(tmp_path) + "/"])
    assert rc == 0
    assert glob.glob(str(tmp_path) + "/*RUN0/*.ckpt")


def test_evaluate_cli(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main(["train", *_TINY, "--n_epoch", "2", "--epochs_per_jit", "2",
               "--batch_size", "40", "--saving_folder", str(tmp_path) + "/"])
    assert rc == 0
    run_dir = glob.glob(str(tmp_path) + "/*RUN0")[0]
    rc = main(["evaluate", *_TINY, "--batch_size", "40",
               "--saving_folder", run_dir])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert set(res) >= {"pairwise", "all", "mi", "avg_mi", "arms"}
    assert os.path.exists("evaluation/A2-RUN0-E0.npy")


def test_train_cli_hybrid_sharding(tmp_path, monkeypatch):
    """--sharding hybrid on a 2-slice-shaped (data=2, fsdp=4) mesh: the
    reference's HYBRID_SHARD demonstration (fsdp_mnist.py:223-226) driven
    through the real CLI on the 8-device virtual mesh."""
    monkeypatch.chdir(tmp_path)
    rc = main(["train", *_TINY, "--n_epoch", "2", "--epochs_per_jit", "2",
               "--batch_size", "40", "--sharding", "hybrid",
               "--mesh_data", "2", "--mesh_fsdp", "4",
               "--saving_folder", str(tmp_path) + "/"])
    assert rc == 0
    assert glob.glob(str(tmp_path) + "/*RUN0/*.ckpt")


def test_train_augmenter_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(["train-augmenter", *_TINY[:7], "--n_epoch", "2",
               "--batch_size", "40", "--noise_dim", "8", "--z_dim", "4",
               "--n_dim", "16", "--out", str(tmp_path / "aug.ckpt")])
    assert rc == 0
    assert os.path.exists(tmp_path / "aug.ckpt")


def test_missing_checkpoint_errors(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main(["evaluate", *_TINY, "--saving_folder", str(tmp_path)])
    assert rc == 1


def test_train_cli_resume(tmp_path, monkeypatch):
    """--resume reuses the newest matching run dir and continues from its
    latest checkpoint (the preemption/elastic restart loop)."""
    monkeypatch.chdir(tmp_path)
    base = ["train", *_TINY, "--epochs_per_jit", "2", "--batch_size", "40",
            "--saving_folder", str(tmp_path) + "/"]
    rc = main([*base, "--n_epoch", "2"])
    assert rc == 0
    # same command (same n_epoch => same folder prefix) + --resume: should
    # NOT create _RUN1, and the final checkpoint carries epoch 2 (0 left)
    rc = main([*base, "--n_epoch", "2", "--resume"])
    assert rc == 0
    assert not glob.glob(str(tmp_path) + "/*RUN1")
    assert glob.glob(str(tmp_path) + "/*RUN0/*epoch_2*.ckpt")
    # without --resume the same command starts a fresh _RUN1
    rc = main([*base, "--n_epoch", "2"])
    assert rc == 0
    assert glob.glob(str(tmp_path) + "/*RUN1")
