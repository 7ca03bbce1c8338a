"""The ``local_bn_stats`` fidelity flag (cfg.bn_groups ghost batch norm).

The default BN is global (SyncBatchNorm-style) under batch sharding — a
documented deviation from the reference, whose DDP wrapping never syncs
per-rank BatchNorm statistics (mmidas/nn_model.py:208-255 under
train.py:141-143).  ``bn_groups = data×fsdp`` reproduces the reference's
per-rank semantics: each contiguous row-block (= each shard's rows under
row-major batch sharding) normalizes with its OWN statistics.  These tests
pin (i) grouped == independent per-shard-local computation, (ii) placement
invariance of the grouped form on the 8-device mesh, (iii) that the flag
actually changes semantics vs global BN, and (iv) the trainer flag
plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvae_tpu.config import MeshConfig, ShardingStrategy, TrainConfig, VAEConfig
from dvae_tpu.models.mixvae import _batch_norm
from dvae_tpu.parallel.sharding import make_mesh, replicated, strategy_shardings
from dvae_tpu.train.step import (init_train_state, make_epoch_runner,
                                 make_optimizer)

CFG = VAEConfig(n_categories=8, input_dim=64, fc_dim=16, lowD_dim=8,
                state_dim=2, n_arm=2, tau=0.1)


def test_grouped_bn_equals_independent_shards():
    """bn_groups=G on the full batch == plain BN run independently on each
    row-block (what the reference's rank g computes on its local batch)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.0, 2.0, (32, 5)).astype(np.float32))
    stats = {"mean": jnp.zeros(5), "var": jnp.ones(5)}
    y_g, st_g = _batch_norm(x, stats, train=True, momentum=0.01, eps=1e-8,
                            groups=4)
    blocks, block_stats = [], []
    for g in range(4):
        y_b, st_b = _batch_norm(x[g * 8:(g + 1) * 8], stats, train=True,
                                momentum=0.01, eps=1e-8)
        blocks.append(y_b)
        block_stats.append(st_b)
    np.testing.assert_allclose(np.asarray(y_g),
                               np.asarray(jnp.concatenate(blocks)),
                               rtol=1e-6, atol=1e-6)
    # running stats: across-group mean of the per-block updates
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(st_g[k]),
            np.mean([np.asarray(s[k]) for s in block_stats], axis=0),
            rtol=1e-6, atol=1e-6)


def test_grouped_bn_differs_from_global():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0.0, 1.0, (32, 5)).astype(np.float32))
    stats = {"mean": jnp.zeros(5), "var": jnp.ones(5)}
    y1, _ = _batch_norm(x, stats, train=True, momentum=0.01, eps=1e-8)
    y4, _ = _batch_norm(x, stats, train=True, momentum=0.01, eps=1e-8,
                        groups=4)
    assert float(jnp.max(jnp.abs(y1 - y4))) > 1e-3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_local_bn_sharded_matches_single_device():
    """On the (2,2,2) mesh with the batch row-sharded over data×fsdp=4
    devices, bn_groups=4 training produces the same losses as the
    IDENTICAL single-device execution — i.e. the sharded run reproduces
    the single-shard-local numbers (each shard normalized by its own
    stats), placement-invariantly."""
    mesh = make_mesh(MeshConfig(data=2, arm=2, fsdp=2))
    cfg = CFG.replace(bn_groups=4)
    tcfg = TrainConfig(batch_size=32, epochs_per_jit=2,
                       mesh=MeshConfig(data=2, arm=2, fsdp=2),
                       sharding=ShardingStrategy.FULL_SHARD)
    n_train = 64
    x_np = np.maximum(np.random.default_rng(2).normal(
        1.0, 1.0, (n_train, cfg.input_dim)), 0.0).astype(np.float32)
    tx = make_optimizer(cfg)

    # sharded execution
    state = init_train_state(jax.random.key(0), cfg, tx)
    shs = strategy_shardings(ShardingStrategy.FULL_SHARD, mesh,
                             state.params, state.bn, state.opt_state)
    state = state._replace(params=jax.device_put(state.params, shs[0]),
                           bn=jax.device_put(state.bn, shs[1]),
                           opt_state=jax.device_put(state.opt_state, shs[2]))
    x = jax.device_put(jnp.asarray(x_np), replicated(mesh))
    run = jax.jit(make_epoch_runner(cfg, tcfg, tx, n_train=n_train,
                                    mesh=mesh))
    _, ems = run(state, x, None, 1.0)
    total_sharded = np.asarray(ems.total)

    # identical single-device execution
    tcfg1 = TrainConfig(batch_size=32, epochs_per_jit=2)
    state1 = init_train_state(jax.random.key(0), cfg, tx)
    run1 = jax.jit(make_epoch_runner(cfg, tcfg1, tx, n_train=n_train))
    _, ems1 = run1(state1, jnp.asarray(x_np), None, 1.0)
    total_single = np.asarray(ems1.total)

    assert np.isfinite(total_sharded).all()
    np.testing.assert_allclose(total_sharded, total_single, rtol=2e-4)

    # and the flag changes the numbers vs global BN (same placement)
    cfg_g = CFG
    state_g = init_train_state(jax.random.key(0), cfg_g, tx)
    run_g = jax.jit(make_epoch_runner(cfg_g, tcfg1, tx, n_train=n_train))
    _, ems_g = run_g(state_g, jnp.asarray(x_np), None, 1.0)
    assert abs(float(total_single[-1]) - float(np.asarray(ems_g.total)[-1])) \
        > 1e-6


def test_trainer_flag_sets_bn_groups(tmp_path):
    from dvae_tpu.train.cpl_mixvae import CplMixVAE
    cpl = CplMixVAE(saving_folder=str(tmp_path), seed=0)
    cpl.init_model(n_categories=8, input_dim=64, fc_dim=16, lowD_dim=8,
                   n_arm=2, batch_size=16, tau=0.1,
                   mesh=MeshConfig(data=2, arm=2, fsdp=2),
                   sharding="full", local_bn_stats=True)
    assert cpl.cfg.bn_groups == 4
    cpl2 = CplMixVAE(saving_folder=str(tmp_path), seed=0)
    cpl2.init_model(n_categories=8, input_dim=64, fc_dim=16, lowD_dim=8,
                    n_arm=2, batch_size=16, tau=0.1)
    assert cpl2.cfg.bn_groups == 1
