"""FSDP tutorial/benchmark harness tests (8-device CPU mesh)."""

import jax
import numpy as np
import pytest

from dvae_tpu.config import ShardingStrategy
from dvae_tpu.examples.fsdp_tutorial import (MLPConfig, init_mlp,
                                             synthetic_mnist,
                                             train_mnist_fsdp)


def test_model_scales_match_reference():
    """ShallowNet ≈1M params, DeepNet ≈93M (fsdp_mnist.py:94-170)."""
    p_shallow = init_mlp(jax.random.key(0), MLPConfig.shallow())
    n_shallow = sum(int(p.size) for p in jax.tree_util.tree_leaves(p_shallow))
    assert 0.8e6 < n_shallow < 1.5e6
    dims = (784,) + MLPConfig.deep().widths + (10,)
    n_deep = sum(a * b + b for a, b in zip(dims[:-1], dims[1:]))
    assert 70e6 < n_deep < 110e6


def test_synthetic_mnist_learnable():
    x, y = synthetic_mnist(1000, seed=0)
    assert x.shape == (1000, 784) and set(np.unique(y)) <= set(range(10))


@pytest.mark.parametrize("strategy", ["full", "ddp"])
def test_tutorial_trains_and_shards(strategy):
    res = train_mnist_fsdp(model="shallow", strategy=strategy, n_epochs=4,
                           batch_size=256, lr=1e-2, verbose=False,
                           data=synthetic_mnist(2048, 0),
                           test_data=synthetic_mnist(512, 1))
    assert res.n_devices == len(jax.devices())
    assert res.train_losses[-1] < res.train_losses[0]
    assert res.test_accs[-1] > 0.5  # blobs are easy
    assert res.strategy == strategy


def test_bf16_precision_runs():
    res = train_mnist_fsdp(model="shallow", strategy="full", n_epochs=1,
                           batch_size=256, precision="bf16", verbose=False,
                           data=synthetic_mnist(1024, 0),
                           test_data=synthetic_mnist(256, 1))
    assert np.isfinite(res.train_losses).all()


# ---------------------------------------------------------------------------
# Science-example smoke tests (tiny shapes; production_scale's quality claim
# is pinned by tests/test_train.py::test_science_quality_pinned_seed)
# ---------------------------------------------------------------------------

def test_arm_parallelism_benchmark():
    from dvae_tpu.config import VAEConfig
    from dvae_tpu.examples.arm_parallelism import benchmark_arm_strategies

    cfg = VAEConfig(n_arm=2, input_dim=64, n_categories=8, fc_dim=16,
                    lowD_dim=8, tau=0.1)
    res = benchmark_arm_strategies(cfg, batch_size=64, n_iters=2)
    assert {"loop_ms", "vmap_ms"} <= set(res) or len(res) >= 2


def test_consensus_convergence_run():
    from dvae_tpu.examples.consensus_convergence import run

    out = run(n_cells=240, n_genes=32, n_types=6, n_categories=8,
              batch_size=60, n_epoch=200, epochs_per_jit=100,
              stop=0.5, verbose=False)
    assert 0.0 <= out["train_consensus"] <= 1.0
    assert 0.0 <= out["test_consensus"] <= 1.0
    assert out["curve_tail"]


def test_clusterability_study_scores():
    from dvae_tpu.examples.clusterability import clusterability_study

    rng = np.random.default_rng(0)
    centers = rng.normal(0, 4, (4, 8))
    y = rng.integers(0, 4, 200)
    x_low = centers[y] + rng.normal(0, 0.3, (200, 8))
    out = clusterability_study(x_low, y, (y + rng.integers(0, 2, 200)) % 4,
                               kfold=2)
    assert out["rf_accuracy"]["discovered"] > 0.9
    assert out["silhouette_discovered"] > 0.2


def test_state_traversal_study():
    import jax

    from dvae_tpu.config import VAEConfig
    from dvae_tpu.examples.state_traversal import traversal_study
    from dvae_tpu.models import mixvae

    cfg = VAEConfig(n_categories=6, input_dim=32, fc_dim=12, lowD_dim=6,
                    state_dim=2, n_arm=2, tau=0.1)
    params = mixvae.init_params(jax.random.key(0), cfg)
    bn = mixvae.init_bn_state(cfg)
    x = np.random.default_rng(1).random((10, 32), dtype=np.float32)
    out = traversal_study(cfg, params, bn, x, d_s=1, n_samp=5)
    assert out["recon"].shape == (2, 5, 10, 32)
    assert out["gene_order"].shape[-1] == 32
