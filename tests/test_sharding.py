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
