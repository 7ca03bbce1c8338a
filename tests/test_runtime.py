"""Multi-host runtime tests (parallel/runtime.py) on the virtual CPU mesh.

The DCN-spanning pieces that can run single-process are exercised directly
(global-array formation, process-local slicing math, bootstrap no-op); the
multi-process rank arithmetic is tested by patching process_index/count —
the math is process-count-generic, so single-process coverage is real
coverage.  Reference anchors: hybrid sharding fsdp_mnist.py:223-226,
DistributedSampler dataloader.py:117-122, rendezvous _dist_utils.py:12-48.
"""

import jax
import numpy as np
import pytest

from dvae_tpu.config import MeshConfig, ShardingStrategy
from dvae_tpu.parallel.runtime import (global_batch, initialize_distributed,
                                       local_slice, process_info)
from dvae_tpu.parallel.sharding import make_mesh, param_shardings


class TestProcessInfo:
    def test_single_process(self):
        idx, count = process_info()
        assert idx == 0 and count == 1

    def test_initialize_noop(self):
        # num_processes in (None, 1) must not touch jax.distributed
        initialize_distributed(None, None, None)
        initialize_distributed("127.0.0.1:1234", 1, 0)
        assert jax.process_count() == 1


class TestLocalSlice:
    def test_single_process_full_range(self):
        s = local_slice(100, 4)
        assert (s.start, s.stop) == (0, 100)

    @pytest.mark.parametrize("pid", [0, 1, 2, 3])
    def test_four_process_partition(self, monkeypatch, pid):
        monkeypatch.setattr(jax, "process_index", lambda: pid)
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        s = local_slice(1000, 8)
        assert (s.start, s.stop) == (250 * pid, 250 * (pid + 1))

    def test_partition_covers_dataset(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        got = []
        for pid in range(4):
            monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
            s = local_slice(1000, 8)
            got.extend(range(s.start, s.stop))
        assert got == list(range(1000))


class TestGlobalBatch:
    def test_forms_sharded_global_array(self):
        mesh = make_mesh(MeshConfig(data=2, arm=2, fsdp=2))
        x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
        g = global_batch(x, mesh)
        assert g.shape == (16, 4)
        np.testing.assert_array_equal(np.asarray(g), x)
        # sharded over data x fsdp: each shard holds 16/4 rows
        shard_shapes = {s.data.shape for s in g.addressable_shards}
        assert shard_shapes == {(4, 4)}


class TestHybridMesh:
    """2-slice-shaped ordering on the 8-device mesh: ``fsdp`` walks devices
    within a slice (ICI), ``data`` crosses slices (DCN) — the reference's
    HYBRID_SHARD placement (fsdp_mnist.py:223-226)."""

    def test_device_order_slices(self):
        devs = jax.devices()[:8]
        mesh = make_mesh(MeshConfig(data=2, arm=1, fsdp=4), devices=devs)
        # slice 0 = devices 0-3 (fsdp-contiguous), slice 1 = devices 4-7
        assert list(mesh.devices[0, 0, :]) == devs[:4]
        assert list(mesh.devices[1, 0, :]) == devs[4:]

    def test_hybrid_param_placement(self):
        """HYBRID_SHARD: params sharded over ``fsdp`` only — each 'slice'
        holds a full copy, shards live on ICI neighbors."""
        import jax.numpy as jnp

        mesh = make_mesh(MeshConfig(data=2, arm=1, fsdp=4))
        params = {"fc1": {"w": jnp.ones((2, 64, 16)),
                          "b": jnp.ones((2, 16))}}
        shs = param_shardings(params, mesh, ShardingStrategy.HYBRID_SHARD)
        spec = shs["fc1"]["w"].spec
        assert "fsdp" in str(spec) and "data" not in str(spec)
        x = jax.device_put(params["fc1"]["w"], shs["fc1"]["w"])
        # 4-way fsdp sharding, replicated across the 2 data 'slices'
        assert len({s.index for s in x.addressable_shards}) == 4


class TestLocalSliceValidation:
    def test_indivisible_rows_raise(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        with pytest.raises(ValueError, match="divide evenly"):
            local_slice(1001, 8)
        with pytest.raises(ValueError, match="batch axis"):
            local_slice(1004, 8)
