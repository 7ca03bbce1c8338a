"""Host→device streaming pipeline (data/stream.py).

The capability under test: training from a HOST-resident dataset — the
reference's DataLoader-per-batch path (mmidas/utils/dataloader.py:123-132,
consumed at mmidas/cpl_mixvae.py:400-436) — with double-buffered async
device commits, identical per-batch numerics to the resident runner
(shared ``make_train_step``), and the ``CplMixVAE._run_phase`` contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvae_tpu.config import MeshConfig, TrainConfig, VAEConfig
from dvae_tpu.data.stream import BatchStreamer, make_streaming_runner
from dvae_tpu.train.step import init_train_state, make_optimizer

N, D, C = 64, 24, 6


def small_cfgs(**tkw):
    cfg = VAEConfig(n_categories=C, state_dim=2, input_dim=D, fc_dim=16,
                    lowD_dim=8, n_arm=2, fused_recon=False,
                    fused_encoder=False)
    tcfg = TrainConfig(batch_size=16, epochs_per_jit=2, seed=3, **tkw)
    return cfg, tcfg


def make_data(seed=0):
    return np.random.default_rng(seed).random((N, D), np.float32)


class TestBatchStreamer:
    def test_epoch_covers_each_row_once(self):
        x = make_data()
        s = BatchStreamer(x, 16, seed=7)
        seen = []
        for b in s.epoch(0):
            assert b.x.shape == (16, D)
            seen.append(np.asarray(b.x))
        assert len(seen) == 4
        got = np.concatenate(seen)
        # a permutation of the dataset: same multiset of rows
        assert np.allclose(np.sort(got, axis=0), np.sort(x, axis=0))

    def test_shuffle_is_deterministic_per_epoch_and_differs_across(self):
        x = make_data()
        a = [np.asarray(b.x) for b in BatchStreamer(x, 16, seed=7).epoch(2)]
        b = [np.asarray(b.x) for b in BatchStreamer(x, 16, seed=7).epoch(2)]
        c = [np.asarray(b.x) for b in BatchStreamer(x, 16, seed=7).epoch(3)]
        assert all(np.array_equal(u, v) for u, v in zip(a, b))
        assert not all(np.array_equal(u, v) for u, v in zip(a, c))

    def test_drop_last_and_prior_alignment(self):
        x = make_data()
        prior = x[:, :1] * 10.0  # row-identifying companion
        s = BatchStreamer(x, 24, prior=prior, seed=1)
        batches = list(s.epoch(0))
        assert len(batches) == 2  # 64 // 24, trailing 16 rows dropped
        for b in batches:
            assert np.allclose(np.asarray(b.prior),
                               np.asarray(b.x)[:, :1] * 10.0)

    def test_prefetch_depths_yield_identical_streams(self):
        x = make_data()
        for depth in (1, 3, 9):  # 9 > steps: clamped to steps
            ref = [np.asarray(b.x)
                   for b in BatchStreamer(x, 16, seed=5).epoch(1)]
            got = [np.asarray(b.x) for b in
                   BatchStreamer(x, 16, seed=5, prefetch=depth).epoch(1)]
            assert all(np.array_equal(u, v) for u, v in zip(ref, got))

    def test_batch_too_large_raises(self):
        with pytest.raises(ValueError):
            BatchStreamer(make_data(), N + 1)


class TestStreamingRunner:
    def test_matches_manual_step_loop(self):
        """Plumbing exactness: the runner must produce bit-identical state
        to driving the same jitted step by hand over the same batches."""
        from dvae_tpu.train.step import make_train_step
        cfg, tcfg = small_cfgs()
        tx = make_optimizer(cfg)
        x = make_data()
        state0 = init_train_state(jax.random.key(0), cfg, tx)
        runner = make_streaming_runner(cfg, tcfg, tx, N)
        state_a, ems = runner(2)(state0, x, None, 1.0)

        state_b = init_train_state(jax.random.key(0), cfg, tx)
        step = jax.jit(make_train_step(cfg, tcfg, tx))
        for e in range(2):
            for b in BatchStreamer(x, tcfg.batch_size,
                                   seed=tcfg.seed).epoch(e):
                state_b, _, _ = step(state_b, b.x, None, 1.0)
        for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                          jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    def test_epoch_metrics_contract(self):
        cfg, tcfg = small_cfgs()
        tx = make_optimizer(cfg)
        state = init_train_state(jax.random.key(0), cfg, tx)
        runner = make_streaming_runner(cfg, tcfg, tx, N)
        state, ems = runner(3)(state, make_data(), None, 1.0)
        assert ems.total.shape == (3,)
        assert ems.loss_rec.shape == (3, cfg.n_arm)
        assert ems.consensus.shape == (3,)
        assert np.all(np.isfinite(np.asarray(ems.total)))
        assert np.all((np.asarray(ems.consensus) >= 0)
                      & (np.asarray(ems.consensus) <= 1))
        assert int(np.asarray(state.epoch)) == 3

    def test_multidevice_batch_sharding(self):
        """Streamed batches land sharded over the mesh batch axes and the
        step still produces finite, correct-shaped results."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        from dvae_tpu.parallel.sharding import make_mesh
        mcfg = MeshConfig(data=2, fsdp=2)
        cfg, tcfg = small_cfgs(mesh=mcfg)
        mesh = make_mesh(mcfg, devices=jax.devices()[:4])
        tx = make_optimizer(cfg)
        state = init_train_state(jax.random.key(0), cfg, tx)
        runner = make_streaming_runner(cfg, tcfg, tx, N, mesh=mesh)
        state, ems = runner(2)(state, make_data(), None, 1.0)
        assert np.all(np.isfinite(np.asarray(ems.total)))


class TestTrainerIntegration:
    def test_train_stream_end_to_end(self, tmp_path):
        """CplMixVAE.train with stream=True: host dataset, loss decreases,
        checkpoints land, epochs advance."""
        from dvae_tpu.train.cpl_mixvae import CplMixVAE
        rng = np.random.default_rng(0)
        centers = rng.random((C, D), np.float32) * 2
        x = (centers[rng.integers(0, C, N)]
             + 0.05 * rng.standard_normal((N, D)).astype(np.float32))
        cpl = CplMixVAE(saving_folder=str(tmp_path), seed=1)
        cpl.init_model(n_categories=C, state_dim=2, input_dim=D,
                       fc_dim=16, lowD_dim=8, n_arm=2, batch_size=16,
                       epochs_per_jit=2, stream=True, fused=False)
        assert cpl.tcfg.stream
        path = cpl.train(x, n_epoch=4, save_plots=False)
        assert path
        assert int(np.asarray(cpl.state.epoch)) >= 1

    def test_train_stream_with_ref_prior(self, tmp_path):
        """stream=True + cfg.ref_prior: the prior table stays on host and
        streams row-aligned with x (train()'s numpy prior branch)."""
        from dvae_tpu.train.cpl_mixvae import CplMixVAE
        rng = np.random.default_rng(2)
        x = rng.random((N, D), np.float32)
        c_p = rng.dirichlet(np.ones(C), N).astype(np.float32)
        cpl = CplMixVAE(saving_folder=str(tmp_path), seed=1)
        cpl.init_model(n_categories=C, state_dim=2, input_dim=D,
                       fc_dim=16, lowD_dim=8, n_arm=2, batch_size=16,
                       epochs_per_jit=2, stream=True, fused=False,
                       ref_prior=True)
        cpl.train(x, n_epoch=2, c_p=c_p,
                  train_idx=np.arange(N), save_plots=False)
        assert int(np.asarray(cpl.state.epoch)) == 2

    def test_auto_stream_when_dataset_exceeds_hbm(self, tmp_path,
                                                  monkeypatch):
        """The resident path must fall back to streaming instead of OOMing
        when the dataset cannot coexist with the training state."""
        import dvae_tpu.train.cpl_mixvae as tm
        monkeypatch.setattr(tm, "_dataset_exceeds_hbm",
                            lambda x, dt, mesh: True)
        x = make_data()
        cpl = tm.CplMixVAE(saving_folder=str(tmp_path), seed=1)
        cpl.init_model(n_categories=C, state_dim=2, input_dim=D,
                       fc_dim=16, lowD_dim=8, n_arm=2, batch_size=16,
                       epochs_per_jit=2, fused=False)
        assert not cpl.tcfg.stream
        cpl.train(x, n_epoch=2, save_plots=False)
        assert cpl.tcfg.stream  # flipped by the guard

    def test_hbm_guard_math(self, monkeypatch):
        import dvae_tpu.train.cpl_mixvae as tm

        class FakeDev:
            def __init__(self, limit):
                self._l = limit

            def memory_stats(self):
                return {"bytes_limit": self._l}

        x = np.zeros((1000, 100), np.float32)  # 400 kB
        monkeypatch.setattr(tm.jax, "local_devices",
                            lambda: [FakeDev(1 << 20)])  # 1 MB
        assert not tm._dataset_exceeds_hbm(x, np.float32, None)
        monkeypatch.setattr(tm.jax, "local_devices",
                            lambda: [FakeDev(500_000)])
        assert tm._dataset_exceeds_hbm(x, np.float32, None)
        monkeypatch.setattr(tm.jax, "local_devices",
                            lambda: [FakeDev(None)])
        assert not tm._dataset_exceeds_hbm(x, np.float32, None)


class TestSparseStreaming:
    """scipy-sparse host datasets: nnz-scale host RAM, per-batch densify
    (single-cell matrices are 80-95% zeros — an atlas that cannot even be
    densified in host RAM still streams)."""

    def _sparse(self):
        sp = pytest.importorskip("scipy.sparse")
        rng = np.random.default_rng(4)
        dense = rng.random((N, D), np.float32) * (rng.random((N, D)) > 0.8)
        return sp.csr_matrix(dense), dense

    def test_batches_match_dense(self):
        xs, xd = self._sparse()
        a = [np.asarray(b.x) for b in BatchStreamer(xs, 16, seed=3).epoch(0)]
        bdense = [np.asarray(b.x)
                  for b in BatchStreamer(xd, 16, seed=3).epoch(0)]
        for u, v in zip(a, bdense):
            np.testing.assert_array_equal(u, v)

    def test_csc_converted_and_dtype_cast(self):
        sp = pytest.importorskip("scipy.sparse")
        xs, xd = self._sparse()
        s = BatchStreamer(sp.csc_matrix(xs), 16, seed=3,
                          dtype=jnp.bfloat16)
        b = next(iter(s.epoch(0)))
        assert b.x.dtype == jnp.bfloat16
        assert s.x.format == "csr"

    def test_train_stream_sparse_end_to_end(self, tmp_path):
        from dvae_tpu.train.cpl_mixvae import CplMixVAE
        xs, _ = self._sparse()
        cpl = CplMixVAE(saving_folder=str(tmp_path), seed=1)
        cpl.init_model(n_categories=C, state_dim=2, input_dim=D,
                       fc_dim=16, lowD_dim=8, n_arm=2, batch_size=16,
                       epochs_per_jit=2, stream=True, fused=False)
        cpl.train(xs, n_epoch=2, save_plots=False)
        assert int(np.asarray(cpl.state.epoch)) == 2
        # batched inference straight off the sparse matrix (per-batch
        # densify inside eval_model)
        res = cpl.eval_model(xs, batch_size=16)
        assert res["pred_label"].shape == (2, N)
        assert np.isfinite(res["total_loss"])

    def test_coo_train_prune_and_eval(self, tmp_path):
        """Non-CSR sparse formats normalize to CSR at ingestion: training,
        the pruning phase's label pass, AND eval_model must all row-slice
        a COO/CSC input without crashing."""
        sp = pytest.importorskip("scipy.sparse")
        from dvae_tpu.train.cpl_mixvae import CplMixVAE
        xs, _ = self._sparse()
        cpl = CplMixVAE(saving_folder=str(tmp_path), seed=1)
        cpl.init_model(n_categories=C, state_dim=2, input_dim=D,
                       fc_dim=16, lowD_dim=8, n_arm=2, batch_size=16,
                       epochs_per_jit=2, stream=True, fused=False)
        # min_con > 1 forces one prune iteration -> _predict_labels slices
        # x_all; COO is not subscriptable unless ingestion converted it
        cpl.train(sp.coo_matrix(xs), n_epoch=2, n_epoch_p=2, max_prun_it=1,
                  min_con=1.01, save_plots=False)
        assert int(np.asarray(cpl.state.epoch)) == 4
        assert int(np.asarray(cpl.state.mask).sum()) == C - 1
        res = cpl.eval_model(sp.coo_matrix(xs), batch_size=16)
        assert res["pred_label"].shape == (2, N)
        res2 = cpl.eval_model(sp.csc_matrix(xs), batch_size=16)
        np.testing.assert_array_equal(res2["pred_label"],
                                      res["pred_label"])

    def test_resident_path_densifies_sparse(self, tmp_path):
        from dvae_tpu.train.cpl_mixvae import CplMixVAE
        xs, _ = self._sparse()
        cpl = CplMixVAE(saving_folder=str(tmp_path), seed=1)
        cpl.init_model(n_categories=C, state_dim=2, input_dim=D,
                       fc_dim=16, lowD_dim=8, n_arm=2, batch_size=16,
                       epochs_per_jit=2, fused=False)
        cpl.train(xs, n_epoch=2, save_plots=False)
        assert not cpl.tcfg.stream
        assert int(np.asarray(cpl.state.epoch)) == 2


class TestReviewRegressions:
    def test_sparse_validation_set(self, tmp_path):
        """A sparse x_val must flow through validate()'s per-batch densify
        instead of crashing on a blanket jnp.asarray (review finding)."""
        sp = pytest.importorskip("scipy.sparse")
        from dvae_tpu.train.cpl_mixvae import CplMixVAE
        rng = np.random.default_rng(4)
        dense = rng.random((N, D), np.float32) * (rng.random((N, D)) > 0.8)
        xs = sp.csr_matrix(dense)
        cpl = CplMixVAE(saving_folder=str(tmp_path), seed=1)
        cpl.init_model(n_categories=C, state_dim=2, input_dim=D,
                       fc_dim=16, lowD_dim=8, n_arm=2, batch_size=16,
                       epochs_per_jit=1, stream=True, fused=False)
        cpl.train(xs[:48], x_val=xs[48:], n_epoch=2, save_plots=False)
        val = cpl.validate(xs[48:], batch_size=16)
        assert np.isfinite(val["loss"])
        # CSC validation input normalizes to CSR row slicing too
        val2 = cpl.validate(sp.csc_matrix(dense[48:]), batch_size=16)
        assert val2["loss"] == pytest.approx(val["loss"], rel=1e-5)

    def test_multiprocess_without_sharding_raises(self, monkeypatch):
        import dvae_tpu.data.stream as dstream
        monkeypatch.setattr(dstream.jax, "process_count", lambda: 2)
        monkeypatch.setattr(dstream.jax, "process_index", lambda: 0)
        x = np.zeros((64, 8), np.float32)
        with pytest.raises(ValueError, match="sharding"):
            BatchStreamer(x, 16)

    def test_replicated_sharding_keeps_full_batch(self, monkeypatch):
        """With a replicated (non-row-sharded) sharding, every process must
        contribute the FULL batch; only a row-sharded spec splits rows."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        import dvae_tpu.data.stream as dstream
        mesh = Mesh(np.array(jax.devices()[:2]), ("arm",))
        x = np.arange(64 * 4, dtype=np.float32).reshape(64, 4)
        monkeypatch.setattr(dstream.jax, "process_count", lambda: 2)
        monkeypatch.setattr(dstream.jax, "process_index", lambda: 1)
        s_rep = BatchStreamer(x, 16, sharding=NamedSharding(mesh, P()))
        assert not s_rep._rows_sharded
        assert len(s_rep._local_span(np.arange(16))) == 16
        s_row = BatchStreamer(
            x, 16, sharding=NamedSharding(mesh, P(("arm",), None)))
        assert s_row._rows_sharded
        np.testing.assert_array_equal(s_row._local_span(np.arange(16)),
                                      np.arange(8, 16))

    def test_streaming_runner_replicates_on_arm_only_mesh(self):
        """mesh present but batch not shardable over data axes: batches must
        commit replicated over the mesh, not single-device."""
        import jax
        from dvae_tpu.config import MeshConfig, TrainConfig, VAEConfig
        from dvae_tpu.data.stream import make_streaming_runner
        from dvae_tpu.parallel.sharding import make_mesh
        from dvae_tpu.train.step import init_train_state, make_optimizer
        cfg = VAEConfig(n_categories=C, input_dim=D, fc_dim=16, lowD_dim=8,
                        n_arm=2, tau=0.1, fused_recon=False,
                        fused_encoder=False)
        tcfg = TrainConfig(batch_size=16, epochs_per_jit=1,
                           mesh=MeshConfig(arm=2))
        mesh = make_mesh(MeshConfig(arm=2), devices=jax.devices()[:2])
        tx = make_optimizer(cfg)
        state = init_train_state(jax.random.key(0), cfg, tx)
        run = make_streaming_runner(cfg, tcfg, tx, n_train=N, mesh=mesh)(1)
        x = make_data()
        state2, ems = run(state, x, None, 1.0)
        assert np.isfinite(np.asarray(ems.total)).all()


def test_multiprocess_row_shard_validates_device_span(monkeypatch):
    """batch_size must divide over the DEVICE span of the row axis, not
    just the process count — caught at construction, not mid-epoch."""
    import pytest

    from dvae_tpu.data.stream import BatchStreamer
    from dvae_tpu.parallel.sharding import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(MeshConfig(data=2, arm=1, fsdp=4))
    sh = NamedSharding(mesh, P(("data", "fsdp"), None))  # rows over 8 devs
    x = np.zeros((64, 4), np.float32)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="8-device row axis"):
        BatchStreamer(x, batch_size=12, sharding=sh)
    # 16 divides over 8 devices: constructor accepts
    BatchStreamer(x, batch_size=16, sharding=sh)
