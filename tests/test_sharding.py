"""Sharding tests on the 8-device CPU mesh.

What the reference cannot test (no multi-process unit tests, SURVEY.md §4):
strategy equivalence — every FSDP-style strategy must produce IDENTICAL
numerics, differing only in array placement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.config import MeshConfig, ShardingStrategy, TrainConfig, VAEConfig
from dvae_tpu.data.anndata_io import synthetic_dataset
from dvae_tpu.parallel.sharding import (batch_sharding, make_mesh,
                                        param_shardings, replicated,
                                        strategy_shardings)
from dvae_tpu.train.step import (init_train_state, make_epoch_runner,
                                 make_optimizer)

CFG = VAEConfig(n_categories=8, input_dim=64, fc_dim=16, lowD_dim=8,
                state_dim=2, n_arm=2, tau=0.1)
TCFG = TrainConfig(batch_size=32, epochs_per_jit=2)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, arm=2, fsdp=2))


@pytest.fixture(scope="module")
def data():
    ds = synthetic_dataset(n_cells=160, n_genes=64, n_types=8, seed=0)
    return jnp.asarray(ds.log1p)


def test_mesh_axis_names(mesh):
    assert mesh.axis_names == ("data", "arm", "fsdp")
    assert mesh.devices.size == 8


def test_param_sharding_big_layers_sharded(mesh):
    tx = make_optimizer(CFG)
    state = init_train_state(jax.random.key(0), CFG, tx)
    shs = param_shardings(state.params, mesh, ShardingStrategy.FULL_SHARD)
    # fc1 (A, D=64, F=16): arm axis + fsdp on D (largest divisible dim)
    assert shs["fc1"]["w"].spec == jax.sharding.PartitionSpec(
        "arm", "fsdp", None)
    # replicated strategies: no fsdp anywhere
    shs_ddp = param_shardings(state.params, mesh, ShardingStrategy.DDP)
    for leaf in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda s: "fsdp" in str(s.spec), shs_ddp)):
        assert not leaf


def test_all_strategies_identical_loss(mesh, data):
    tx = make_optimizer(CFG)
    losses = {}
    for strat in ShardingStrategy:
        state = init_train_state(jax.random.key(7), CFG, tx)
        shs = strategy_shardings(strat, mesh, state.params, state.bn,
                                 state.opt_state)
        state = state._replace(
            params=jax.device_put(state.params, shs[0]),
            bn=jax.device_put(state.bn, shs[1]),
            opt_state=jax.device_put(state.opt_state, shs[2]))
        x = jax.device_put(data, replicated(mesh))
        run = jax.jit(make_epoch_runner(CFG, TCFG, tx, n_train=data.shape[0]))
        _, ems = run(state, x, None, 1.0)
        losses[strat.value] = np.asarray(ems.total)
    base = losses["ddp"]
    for k, v in losses.items():
        np.testing.assert_allclose(v, base, rtol=1e-5, err_msg=k)


def test_batch_sharding_spec(mesh):
    sh = batch_sharding(mesh)
    assert sh.spec == jax.sharding.PartitionSpec("arm", ("data", "fsdp"), None)


def test_put_dataset_row_major(mesh):
    """put_dataset must commit row-major with the host-side cast applied
    (an on-device convert picks a column-major auto layout on v5e, adding
    a full-dataset relayout copy to every epoch-runner call)."""
    from dvae_tpu.parallel.sharding import put_dataset
    x = np.random.default_rng(0).random((64, 32), dtype=np.float32)
    a = put_dataset(x, jnp.bfloat16)
    assert a.dtype == jnp.bfloat16
    assert a.format.layout.major_to_minor == (0, 1)
    np.testing.assert_allclose(np.asarray(a, np.float32), x, atol=4e-3)
    b = put_dataset(x, jnp.float32, replicated(mesh))
    assert b.sharding.spec == jax.sharding.PartitionSpec()
    assert b.format.layout.major_to_minor == (0, 1)


class TestPartitionedFusedOps:
    """ops/partitioned.py: the fused Pallas kernels' custom_partitioning
    rules must reproduce the unsharded oracles under real (arm, data, fsdp)
    shardings — on TPU the partitioner would otherwise replicate the
    opaque custom calls."""

    def _mesh(self):
        return make_mesh(MeshConfig(data=2, arm=2, fsdp=2))

    def test_partitioned_recon_matches_oracle(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dvae_tpu.ops.partitioned import make_partitioned_recon
        from dvae_tpu.ops.recon_pallas import recon_mse_reference

        mesh = self._mesh()
        r = np.random.default_rng(0)
        A, B, F, D = 4, 64, 16, 40
        h = jnp.asarray(r.normal(size=(A, B, F)).astype(np.float32))
        w = jnp.asarray(0.1 * r.normal(size=(A, F, D)).astype(np.float32))
        b = jnp.asarray(0.1 * r.normal(size=(A, D)).astype(np.float32))
        x = jnp.asarray(np.maximum(r.normal(0.5, 1, (B, D)), 0)
                        .astype(np.float32))
        xa = jnp.broadcast_to(x, (A, B, D))
        op = make_partitioned_recon(("arm",), ("data", "fsdp"))
        hs = jax.device_put(h, NamedSharding(
            mesh, P("arm", ("data", "fsdp"), None)))
        ws = jax.device_put(w, NamedSharding(mesh, P("arm", None, None)))
        bs = jax.device_put(b, NamedSharding(mesh, P("arm", None)))
        for xt, spec in ((x, P(("data", "fsdp"), None)),
                         (xa, P("arm", ("data", "fsdp"), None))):
            xts = jax.device_put(xt, NamedSharding(mesh, spec))
            s, m = jax.jit(op)(hs, ws, bs, xts)
            s0, m0 = recon_mse_reference(h, w, b, xa)
            np.testing.assert_allclose(np.asarray(s), np.asarray(s0),
                                       rtol=1e-5)
            np.testing.assert_allclose(np.asarray(m), np.asarray(m0))
            wgt = jnp.arange(1, A + 1, dtype=jnp.float32)
            g = jax.jit(jax.grad(
                lambda h, w, b: jnp.sum(op(h, w, b, xts)[0] * wgt),
                (0, 1, 2)))(hs, ws, bs)
            g0 = jax.grad(
                lambda h, w, b: jnp.sum(
                    recon_mse_reference(h, w, b, xa)[0] * wgt),
                (0, 1, 2))(h, w, b)
            for a, e in zip(g, g0):
                np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                           rtol=2e-4, atol=1e-4)

    def test_partitioned_encoder_matches_oracle(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dvae_tpu.ops.encoder_pallas import (dropout_fc1_reference,
                                                 dropout_mask_host)
        from dvae_tpu.ops.partitioned import make_partitioned_dropout_fc1

        mesh = self._mesh()
        r = np.random.default_rng(1)
        A, B, D, F = 4, 64, 40, 16
        x = jnp.asarray(np.maximum(r.normal(0.5, 1, (B, D)), 0)
                        .astype(np.float32))
        w = jnp.asarray(0.1 * r.normal(size=(A, D, F)).astype(np.float32))
        b = jnp.asarray(0.1 * r.normal(size=(A, F)).astype(np.float32))
        mask = dropout_mask_host(3, (A, B, D), 0.5)
        op = make_partitioned_dropout_fc1(("arm",), ("data", "fsdp"), 0.5)
        ws = jax.device_put(w, NamedSharding(mesh, P("arm", None, None)))
        bs = jax.device_put(b, NamedSharding(mesh, P("arm", None)))
        ms = jax.device_put(mask, NamedSharding(
            mesh, P("arm", ("data", "fsdp"), None)))
        xts = jax.device_put(x, NamedSharding(mesh, P(("data", "fsdp"),
                                                      None)))
        y = jax.jit(lambda w, b: op(jnp.int32(3), xts, w, b, ms))(ws, bs)
        y0 = dropout_fc1_reference(x, w, b, 0.5, mask)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                                   rtol=1e-5, atol=1e-5)
        g = jax.jit(jax.grad(
            lambda w, b: jnp.sum(jnp.sin(op(jnp.int32(3), xts, w, b, ms))),
            (0, 1)))(ws, bs)
        g0 = jax.grad(
            lambda w, b: jnp.sum(jnp.sin(
                dropout_fc1_reference(x, w, b, 0.5, mask))), (0, 1))(w, b)
        for a, e in zip(g, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=2e-4, atol=1e-5)

    def test_fused_multi_device_epoch_matches_single(self):
        """Full fused epoch runner: the partitioned multi-device path must
        match the single-device path (x_drop=0 removes mask-stream
        differences; rtol covers psum reduction-order)."""
        from dvae_tpu.data.anndata_io import synthetic_dataset
        from dvae_tpu.parallel.sharding import replicated, strategy_shardings
        from dvae_tpu.train.step import (init_train_state,
                                         make_epoch_runner, make_optimizer)

        cfg = CFG.replace(fused_recon=True, fused_encoder=True, x_drop=0.0)
        mesh = self._mesh()
        ds = synthetic_dataset(n_cells=160, n_genes=64, n_types=8, seed=0)
        x_all = jnp.asarray(ds.log1p)
        outs = {}
        for name in ("multi", "single"):
            tc = (TCFG.replace(mesh=MeshConfig(data=2, arm=2, fsdp=2))
                  if name == "multi" else TCFG)
            tx = make_optimizer(cfg)
            state = init_train_state(jax.random.key(0), cfg, tx)
            x = x_all
            if name == "multi":
                shs = strategy_shardings(ShardingStrategy.FULL_SHARD, mesh,
                                         state.params, state.bn,
                                         state.opt_state)
                state = state._replace(
                    params=jax.device_put(state.params, shs[0]),
                    bn=jax.device_put(state.bn, shs[1]),
                    opt_state=jax.device_put(state.opt_state, shs[2]))
                x = jax.device_put(x_all, replicated(mesh))
            run = jax.jit(make_epoch_runner(cfg, tc, tx, n_train=160))
            _, ems = run(state, x, None, 1.0)
            outs[name] = np.asarray(ems.total)
        np.testing.assert_allclose(outs["multi"], outs["single"], rtol=5e-4)

    def test_partitioned_zinb_matches_oracle(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dvae_tpu.ops.partitioned import make_partitioned_zinb
        from dvae_tpu.ops.zinb_pallas import zinb_heads_reference

        mesh = self._mesh()
        r = np.random.default_rng(2)
        A, B, F, D = 4, 64, 16, 40
        h = jnp.asarray(r.normal(size=(A, B, F)).astype(np.float32))
        mk = lambda: (
            jnp.asarray(0.1 * r.normal(size=(A, F, D)).astype(np.float32)),
            jnp.asarray(0.1 * r.normal(size=(A, D)).astype(np.float32)))
        (wr, br), (wp, bp), (wz, bz) = mk(), mk(), mk()
        x = jnp.asarray((np.maximum(r.normal(0.8, 1, (B, D)), 0)
                         * (r.random((B, D)) > 0.5)).astype(np.float32))
        xa = jnp.broadcast_to(x, (A, B, D))
        op = make_partitioned_zinb(("arm",), ("data", "fsdp"))
        put = lambda t, s: jax.device_put(t, NamedSharding(mesh, s))
        hs = put(h, P("arm", ("data", "fsdp"), None))
        args = (put(wr, P("arm", None, None)), put(br, P("arm", None)),
                put(wp, P("arm", None, None)), put(bp, P("arm", None)),
                put(wz, P("arm", None, None)), put(bz, P("arm", None)))
        xts = put(x, P(("data", "fsdp"), None))
        s = jax.jit(lambda *a: op(*a, xts))(hs, *args)
        s0 = zinb_heads_reference(h, wr, br, wp, bp, wz, bz, xa)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s0), rtol=2e-4)
        g = jax.jit(jax.grad(
            lambda *a: jnp.sum(op(*a, xts) * jnp.arange(1, A + 1)),
            tuple(range(7))))(hs, *args)
        g0 = jax.grad(
            lambda *a: jnp.sum(zinb_heads_reference(*a, xa)
                               * jnp.arange(1, A + 1)),
            tuple(range(7)))(h, wr, br, wp, bp, wz, bz)
        for a, e in zip(g, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=5e-3, atol=3e-3)

    def test_fused_zinb_multi_device_epoch_matches_single(self):
        from dvae_tpu.data.anndata_io import synthetic_dataset
        from dvae_tpu.parallel.sharding import replicated, strategy_shardings
        from dvae_tpu.train.step import (init_train_state,
                                         make_epoch_runner, make_optimizer)

        cfg = CFG.replace(fused_recon=True, fused_encoder=True, x_drop=0.0,
                          mode="ZINB")
        mesh = self._mesh()
        ds = synthetic_dataset(n_cells=160, n_genes=64, n_types=8, seed=0)
        x_all = jnp.asarray(ds.log1p)
        outs = {}
        for name in ("multi", "single"):
            tc = (TCFG.replace(mesh=MeshConfig(data=2, arm=2, fsdp=2))
                  if name == "multi" else TCFG)
            tx = make_optimizer(cfg)
            state = init_train_state(jax.random.key(0), cfg, tx)
            x = x_all
            if name == "multi":
                shs = strategy_shardings(ShardingStrategy.FULL_SHARD, mesh,
                                         state.params, state.bn,
                                         state.opt_state)
                state = state._replace(
                    params=jax.device_put(state.params, shs[0]),
                    bn=jax.device_put(state.bn, shs[1]),
                    opt_state=jax.device_put(state.opt_state, shs[2]))
                x = jax.device_put(x_all, replicated(mesh))
            run = jax.jit(make_epoch_runner(cfg, tc, tx, n_train=160))
            _, ems = run(state, x, None, 1.0)
            outs[name] = np.asarray(ems.total)
        assert np.isfinite(outs["multi"]).all()
        np.testing.assert_allclose(outs["multi"], outs["single"], rtol=5e-4)


def test_fused_eval_multi_device_matches_single():
    """The fused eval step (train/step.make_eval_step with cfg.fused_recon)
    must route through the partitioned kernels on a >1-device mesh and
    match the single-device result — eval gained the fused wiring after
    the train path, so it needs its own multi-device check."""
    from dvae_tpu.data.anndata_io import synthetic_dataset
    from dvae_tpu.parallel.sharding import (make_mesh, replicated,
                                            strategy_shardings)
    from dvae_tpu.train.step import (init_train_state, make_eval_step,
                                     make_optimizer)

    cfg = CFG.replace(fused_recon=True)
    mesh = make_mesh(MeshConfig(data=2, arm=2, fsdp=2))
    ds = synthetic_dataset(n_cells=64, n_genes=64, n_types=8, seed=0)
    x_all = jnp.asarray(ds.log1p)
    outs = {}
    for name in ("multi", "single"):
        tc = (TCFG.replace(mesh=MeshConfig(data=2, arm=2, fsdp=2))
              if name == "multi" else TCFG)
        tx = make_optimizer(cfg)
        state = init_train_state(jax.random.key(0), cfg, tx)
        x = x_all
        if name == "multi":
            shs = strategy_shardings(ShardingStrategy.FULL_SHARD, mesh,
                                     state.params, state.bn,
                                     state.opt_state)
            state = state._replace(
                params=jax.device_put(state.params, shs[0]),
                bn=jax.device_put(state.bn, shs[1]),
                opt_state=jax.device_put(state.opt_state, shs[2]))
            x = jax.device_put(x_all, replicated(mesh))
        aux, labels, _ = make_eval_step(cfg, tc)(state, x, None, 1.0)
        outs[name] = (np.asarray(aux.total), np.asarray(aux.loss_rec),
                      np.asarray(labels))
    np.testing.assert_allclose(outs["multi"][0], outs["single"][0],
                               rtol=5e-4)
    np.testing.assert_allclose(outs["multi"][1], outs["single"][1],
                               rtol=5e-4)
    np.testing.assert_array_equal(outs["multi"][2], outs["single"][2])


def test_fused_eval_partial_batch_on_mesh_falls_back():
    """A trailing eval batch the mesh batch axes cannot divide must take
    the materializing fallback (same numbers as unfused) instead of
    sharding the partitioned kernels unevenly."""
    from dvae_tpu.data.anndata_io import synthetic_dataset
    from dvae_tpu.parallel.sharding import make_mesh, replicated
    from dvae_tpu.train.step import (init_train_state, make_eval_step,
                                     make_optimizer)

    cfg = CFG.replace(fused_recon=True)
    mesh = make_mesh(MeshConfig(data=2, arm=2, fsdp=2))
    tc = TCFG.replace(mesh=MeshConfig(data=2, arm=2, fsdp=2))
    ds = synthetic_dataset(n_cells=39, n_genes=64, n_types=8, seed=1)
    x = jax.device_put(jnp.asarray(ds.log1p), replicated(mesh))  # 39 % 4 != 0
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(0), cfg, tx)
    aux_f, lab_f, _ = make_eval_step(cfg, tc)(state, x, None, 1.0)
    aux_0, lab_0, _ = make_eval_step(cfg.replace(fused_recon=False),
                                     tc)(state, x, None, 1.0)
    np.testing.assert_allclose(float(aux_f.total), float(aux_0.total),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(lab_f), np.asarray(lab_0))
