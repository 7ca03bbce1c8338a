"""Typed-API, checkpoint-util, profiling, and plot-artifact tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.config import VAEConfig
from dvae_tpu.models import api, mixvae
from dvae_tpu.utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                       make_run_dir, parse_epoch,
                                       save_checkpoint)

CFG = VAEConfig(n_categories=6, input_dim=40, fc_dim=16, lowD_dim=8,
                state_dim=2, n_arm=2, tau=0.1)
rng = np.random.default_rng(17)


class TestCheckpointUtils:
    def test_roundtrip_pickle(self, tmp_path):
        tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
        p = save_checkpoint(str(tmp_path / "x.ckpt"), tree, {"epoch": 7})
        tree2, meta = load_checkpoint(p)
        assert meta["epoch"] == 7
        np.testing.assert_allclose(tree2["b"]["c"], np.ones((2, 3)))

    def test_parse_epoch_and_latest(self, tmp_path):
        for e in (10, 200, 30):
            (tmp_path / f"cpl_mixVAE_model_epoch_{e}.ckpt").write_bytes(b"x")
        (tmp_path / "other.txt").write_bytes(b"x")
        assert parse_epoch("cpl_mixVAE_model_epoch_200.ckpt") == 200
        assert parse_epoch("nomatch.ckpt") == -1
        best = latest_checkpoint(str(tmp_path))
        assert best.endswith("epoch_200.ckpt")

    def test_make_run_dir_increments(self, tmp_path):
        a = make_run_dir(str(tmp_path) + "/", "K92")
        b = make_run_dir(str(tmp_path) + "/", "K92")
        assert a.endswith("_RUN0") and b.endswith("_RUN1")


class TestTypedAPI:
    def _train_state(self, tmp_path):
        from dvae_tpu.train.step import init_train_state, make_optimizer
        tx = make_optimizer(CFG)
        st = init_train_state(jax.random.key(0), CFG, tx)
        path = save_checkpoint(
            str(tmp_path / "cpl_mixVAE_model_epoch_5.ckpt"),
            {"params": st.params, "bn": st.bn, "opt_state": st.opt_state,
             "mask": st.mask},
            {"epoch": 5, "cfg": CFG.__dict__})
        return st, path

    def test_load_vae_and_generate(self, tmp_path):
        st, path = self._train_state(tmp_path)
        cfg, params, bn, mask = api.load_vae(path)
        assert cfg.n_categories == 6 and cfg.n_arm == 2
        x = rng.random((30, CFG.input_dim)).astype(np.float32)
        out = api.generate(cfg, params, bn, x, mask=mask, batch_size=16)
        assert out["recon"].shape == (2, 30, CFG.input_dim)
        assert out["pred_label"].shape == (2, 30)
        assert out["c_prob"].shape == (2, 30, 6)
        assert np.isfinite(out["loss_rec"]).all()

    def test_mk_run_discovery(self, tmp_path):
        _, path = self._train_state(tmp_path)
        run = api.mk_run(str(tmp_path))
        assert run["epoch"] == 5
        assert run["checkpoint"] == path

    def test_single_vae_apply(self):
        params = mixvae.init_params(jax.random.key(0), CFG)
        bn = mixvae.init_bn_state(CFG)
        p0 = jax.tree_util.tree_map(lambda l: l[0], params)
        b0 = jax.tree_util.tree_map(lambda l: l[0], bn)
        x = jnp.asarray(rng.random((12, CFG.input_dim)).astype(np.float32))
        outs, _ = api.single_vae_apply(CFG, p0, b0, x, jax.random.key(1))
        assert outs.x_rec.shape == (12, CFG.input_dim)


class TestStateChanges:
    def test_traversal_shapes_and_sorted(self):
        params = mixvae.init_params(jax.random.key(0), CFG)
        bn = mixvae.init_bn_state(CFG)
        x = jnp.asarray(rng.random((10, CFG.input_dim)).astype(np.float32))
        recon, s_vals = mixvae.state_changes(params, bn, CFG, x, d_s=0,
                                             key=jax.random.key(2), n_samp=5)
        assert recon.shape == (2, 5, 10, CFG.input_dim)
        assert s_vals.shape == (2, 5, 10)
        d = np.diff(np.asarray(s_vals), axis=1)
        assert (d >= 0).all()  # sorted along the sample axis


class TestProfiling:
    def test_step_timer(self):
        from dvae_tpu.utils.profiling import StepTimer
        t = StepTimer()
        x = jnp.ones((64, 64))
        t.start()
        y = x @ x
        dt = t.stop(sync_on=y)
        assert dt > 0
        assert t.summary()["n"] == 1

    def test_memory_snapshot(self, tmp_path):
        from dvae_tpu.utils.profiling import memory_snapshot
        p = str(tmp_path / "mem.json")
        snap = memory_snapshot(p)
        assert os.path.exists(p)
        assert len(snap) >= 1


class TestPlots:
    def test_artifacts_written(self, tmp_path):
        pytest.importorskip("matplotlib")
        from dvae_tpu.utils.plots import save_training_artifacts
        hist = [{"train/loss": 10.0 - i, "step": i} for i in range(5)]
        labels = rng.integers(0, 4, (2, 100))
        files = save_training_artifacts(str(tmp_path), hist, labels, K=4)
        assert len(files) == 2
        for f in files:
            assert os.path.getsize(f) > 0


class TestComparePytrees:
    def test_match_and_mismatch(self):
        from dvae_tpu.utils.checkpoint import compare_pytrees
        a = {"x": jnp.ones(3), "y": {"z": jnp.zeros((2, 2))}}
        assert compare_pytrees(a, a)["match"]
        b = {"x": jnp.ones(3), "y": {"z": jnp.ones((2, 2))}}
        r = compare_pytrees(a, b)
        assert not r["match"] and r["mismatched_paths"] == ["['y']['z']"]
        r2 = compare_pytrees(a, {"x": jnp.ones(3)})
        assert not r2["structure_equal"]


class TestOrbaxCheckpoint:
    def test_roundtrip_orbax(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from dvae_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
        tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
        p = save_checkpoint(str(tmp_path / "ck_orbax"), tree, {"epoch": 3},
                            use_orbax=True)
        assert os.path.isdir(p)  # orbax writes a directory per checkpoint
        tree2, meta = load_checkpoint(p)  # format auto-detected
        assert meta["epoch"] == 3
        np.testing.assert_allclose(tree2["b"]["c"], np.ones((2, 3)))


def test_is_normalized_and_clr():
    import jax.numpy as jnp
    import numpy as np
    import pytest as _pytest
    from dvae_tpu.models.api import clr, is_normalized

    p = jnp.asarray(np.full((3, 4), 0.25, np.float32))
    assert bool(jnp.all(is_normalized(p)))
    assert not bool(jnp.any(is_normalized(p * 2.0)))
    out = clr(p)
    # uniform simplex -> zero clr; rows always sum to ~0
    assert float(jnp.max(jnp.abs(out))) < 1e-6
    q = jnp.asarray([[0.7, 0.2, 0.1]])
    assert abs(float(jnp.sum(clr(q)))) < 1e-5
    with _pytest.raises(ValueError):
        clr(jnp.asarray([[0.9, 0.3]]))  # not on the simplex


def test_parser_exception_surface():
    """parse/any_char/ParserError (reference parser.py:7-31) on top of the
    Option-style combinators."""
    from dvae_tpu.utils.parser import (ParserError, any_char, any_digit,
                                       compose, parse)
    import pytest

    assert parse(any_char(), "xy") == ("x", "y")
    assert parse(compose(any_digit(), any_char()), "7q!") == (("7", "q"), "!")
    with pytest.raises(ParserError):
        parse(any_digit(), "abc")
    with pytest.raises(ParserError):
        parse(any_char(), "")


def test_set_seeds_and_mapv():
    from dvae_tpu.eval.metrics import mapv, set_seeds

    set_seeds(123)
    a = np.random.rand(4)
    set_seeds(123)
    b = np.random.rand(4)
    np.testing.assert_array_equal(a, b)
    assert dict(mapv(lambda v: v * 2, {"a": 1, "b": 5}.items())) == \
        {"a": 2, "b": 10}


def test_reparam_and_sample_normal_moments():
    from dvae_tpu.models.api import reparam, sample_normal

    k = jax.random.key(0)
    draws = reparam(jnp.zeros(20000), jnp.zeros(20000), k)
    assert abs(float(draws.mean())) < 0.05
    assert abs(float(draws.std()) - 1.0) < 0.05
    # shifted/scaled
    d2 = reparam(jnp.full(20000, 3.0), jnp.full(20000, np.log(4.0)), k)
    assert abs(float(d2.mean()) - 3.0) < 0.1
    assert abs(float(d2.std()) - 2.0) < 0.1
    ks = [sample_normal(jax.random.key(i)) for i in range(200)]
    assert abs(np.mean(ks)) < 0.25 and 0.6 < np.std(ks) < 1.4


def test_view_weights_summary(tmp_path):
    import os
    os.environ.setdefault("XLA_FLAGS", "")
    from dvae_tpu.data.anndata_io import synthetic_dataset
    from dvae_tpu.models.api import view_weights
    from dvae_tpu.train.cpl_mixvae import CplMixVAE

    ds = synthetic_dataset(n_cells=60, n_genes=24, n_types=4, seed=0)
    cpl = CplMixVAE(str(tmp_path))
    cpl.init_model(n_categories=4, input_dim=24, fc_dim=8, lowD_dim=4,
                   n_arm=2, tau=0.1, batch_size=30, epochs_per_jit=1)
    cpl.train(ds.log1p, n_epoch=1, save_plots=False)
    vw = view_weights(str(tmp_path))
    assert vw["summary"] and all(
        isinstance(s, tuple) for s, _ in vw["summary"].values())
    key = next(iter(k for k in vw["summary"] if "fc1" in k))
    assert vw["summary"][key][0][0] == 2  # stacked-arm leading axis


def test_compose_right_to_left():
    from dvae_tpu.eval.metrics import compose

    f = compose(lambda x: x + 1, lambda x: x * 3, lambda x: x - 2)
    assert f(5) == (5 - 2) * 3 + 1


def test_generate_pads_final_batch_single_shape(tmp_path):
    """generate(pad_final=True) evaluates a ragged tail through the same
    jitted shape with exactly trimmed outputs; ref_prior checkpoints demand
    an explicit prior."""
    import pytest

    from dvae_tpu.config import VAEConfig
    from dvae_tpu.models import init_bn_state, init_params
    from dvae_tpu.models.api import generate

    cfg = VAEConfig(n_categories=6, input_dim=20, fc_dim=8, lowD_dim=4,
                    n_arm=2, tau=0.1)
    params = init_params(jax.random.key(0), cfg)
    bn = init_bn_state(cfg)
    x = np.random.default_rng(0).random((23, 20)).astype(np.float32)
    out = generate(cfg, params, bn, x, batch_size=10)
    assert out["recon"].shape == (2, 23, 20)
    assert out["pred_label"].shape == (2, 23)
    assert np.isfinite(out["loss_rec"]).all()
    # the padded path agrees with the exact ragged path on full batches
    out2 = generate(cfg, params, bn, x, batch_size=10, pad_final=False)
    np.testing.assert_allclose(out["c_prob"][:, :20], out2["c_prob"][:, :20],
                               rtol=1e-6)
    with pytest.raises(ValueError, match="ref_prior"):
        generate(cfg.replace(ref_prior=True), params, bn, x, batch_size=10)
    # with a prior, the ref_prior path runs end to end
    c_p = np.full((23, 6), 1 / 6, np.float32)
    out3 = generate(cfg.replace(ref_prior=True), params, bn, x,
                    batch_size=10, c_p=c_p)
    assert np.isfinite(out3["loss_rec"]).all()


def test_make_run_dir_bare_base_gets_separator(tmp_path):
    """--saving_folder without a trailing slash must nest the run dir
    inside it, not create a mashed sibling directory."""
    from dvae_tpu.utils.checkpoint import latest_run_dir, make_run_dir

    base = str(tmp_path / "results")   # no trailing slash
    d = make_run_dir(base, "K9")
    assert d == os.path.join(base, "K9_RUN0")
    assert os.path.isdir(d)
    d2 = make_run_dir(base, "K9")
    assert d2.endswith("K9_RUN1")
    assert latest_run_dir(base, "K9") == d2
