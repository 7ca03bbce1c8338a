"""Two-process jax.distributed integration test — the real multi-host path.

Spawns 2 OS processes (tests/_dcn_worker.py), each with 4 virtual CPU
devices, rendezvousing through a localhost coordinator.  This exercises
what single-process tests cannot: ``jax.distributed.initialize`` itself,
``make_array_from_process_local_data`` across process boundaries, and a
training step over a mesh whose ``data`` axis spans processes.

Reference anchors: rendezvous mmidas/_dist_utils.py:12-48 (MASTER_ADDR/
PORT + NCCL init), DistributedSampler mmidas/utils/dataloader.py:117-122,
hybrid-shard slice placement fsdp_mnist.py:223-226.

The single-process 8-device oracle (same mesh shape, same seeds) pins the
numerics: the distributed run must produce the identical loss.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dcn_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    return env


@pytest.fixture(scope="module")
def dcn_results(tmp_path_factory):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    ckpt_dir = str(tmp_path_factory.mktemp("dcn") / "sharded_ckpt")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--coordinator", coord,
             "--num-processes", "2", "--process-id", str(pid),
             "--ckpt-dir", ckpt_dir],
            env=_worker_env(4), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("DCN worker timed out")
        assert p.returncode == 0, f"rank failed:\n{err[-3000:]}"
        # the Gloo transport logs to stdout, sometimes after our JSON line
        payload = [ln for ln in out.splitlines() if ln.startswith('{"pid"')]
        assert payload, f"no result line in worker stdout:\n{out[-2000:]}"
        outs.append(json.loads(payload[-1]))
    return outs


def test_both_ranks_complete(dcn_results):
    assert {r["pid"] for r in dcn_results} == {0, 1}
    assert all(r["nprocs"] == 2 for r in dcn_results)


def test_cross_process_mean_agrees(dcn_results):
    # global mean of the row-sharded dataset: a psum over the DCN axis
    full = np.arange(64 * 32, dtype=np.float32).reshape(64, 32) / (64 * 32)
    for r in dcn_results:
        np.testing.assert_allclose(r["gmean"], full.mean(), rtol=1e-6)


def test_multiprocess_streaming_batch_assembly(dcn_results):
    """BatchStreamer across 2 processes: each rank committed only its row
    span, yet both see the identical, correctly assembled GLOBAL batch
    (the worker already asserted element equality against the
    seed-deterministic selection; here we pin rank agreement)."""
    full = np.arange(64 * 32, dtype=np.float32).reshape(64, 32) / (64 * 32)
    order = np.random.default_rng((9, 0)).permutation(64)[:32]
    want = float(full[order].sum())
    for r in dcn_results:
        np.testing.assert_allclose(r["stream_batch_sum"], want, rtol=1e-6)


def test_sharded_checkpoint_roundtrip_across_processes(dcn_results):
    """Orbax save of the FULL_SHARD-sharded state from BOTH processes,
    restore to the same placements, then one more epoch from the original
    vs the restored state: identical loss, shardings preserved, metadata
    intact (multi-host resume end-to-end — the reference imports
    FullStateDictConfig, train.py:14-16, but never ships distributed
    checkpointing; SURVEY §5.4)."""
    for r in dcn_results:
        ck = r["ckpt"]
        assert ck["shard_ok"], f"rank {r['pid']}: shardings not preserved"
        assert ck["loss_orig"] == ck["loss_restored"], \
            f"rank {r['pid']}: post-restore step diverged: {ck}"
        assert ck["ok"] is True
    # both ranks ran the same global program on the restored state
    assert (dcn_results[0]["ckpt"]["loss_restored"]
            == dcn_results[1]["ckpt"]["loss_restored"])


def test_distributed_loss_matches_single_process_oracle(dcn_results):
    """The 2-process run over (data=2, arm=1, fsdp=4) must equal the
    single-process 8-device run of the same mesh shape: identical seeds,
    identical partitioning, only the runtime differs.  Tolerance 1e-4: the
    cross-process all-reduce reassociates the sum (measured ~4e-5 relative
    on this loss), it is not bit-identical to the single-runtime reduce."""
    from dvae_tpu.config import (MeshConfig, ShardingStrategy, TrainConfig,
                                 VAEConfig)
    from dvae_tpu.parallel.sharding import make_mesh, strategy_shardings
    from dvae_tpu.train.step import (init_train_state, make_epoch_runner,
                                     make_optimizer)

    n, d = 64, 32
    full = np.arange(n * d, dtype=np.float32).reshape(n, d) / (n * d)
    cfg = VAEConfig(n_categories=8, input_dim=d, fc_dim=16, lowD_dim=8,
                    state_dim=2, n_arm=2, tau=0.1)
    tcfg = TrainConfig(batch_size=32, epochs_per_jit=1)
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(7), cfg, tx)
    mesh = make_mesh(MeshConfig(data=2, arm=1, fsdp=4))
    shs = strategy_shardings(ShardingStrategy.FULL_SHARD, mesh, state.params,
                             state.bn, state.opt_state)
    state = state._replace(
        params=jax.device_put(state.params, shs[0]),
        bn=jax.device_put(state.bn, shs[1]),
        opt_state=jax.device_put(state.opt_state, shs[2]))
    run = jax.jit(make_epoch_runner(cfg, tcfg, tx, n_train=n))
    _, ems = run(state, jnp.asarray(full), None, 1.0)
    oracle = float(np.asarray(ems.total).ravel()[-1])

    # the two ranks run the same global program — they must agree exactly
    assert dcn_results[0]["loss"] == dcn_results[1]["loss"]
    for r in dcn_results:
        np.testing.assert_allclose(r["loss"], oracle, rtol=1e-4)
