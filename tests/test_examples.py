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
