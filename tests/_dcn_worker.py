"""Worker process for the two-process DCN integration test (test_dcn.py).

Runs as one rank of a 2-process jax.distributed job on the CPU backend
(4 virtual devices per process -> 8 global).  Exercises the REAL multi-host
path the single-process unit tests can only mock: coordinator rendezvous
(reference mmidas/_dist_utils.py:12-48), cross-process global-array
formation (reference DistributedSampler, mmidas/utils/dataloader.py:117-122),
and a training step over a mesh whose ``data`` axis spans processes — the
DCN placement of the reference's HYBRID_SHARD (fsdp_mnist.py:223-226).

Prints one JSON line per rank: {"pid", "nprocs", "gmean", "loss"}.
"""

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--ckpt-dir", default=None,
                    help="run the sharded orbax save/restore roundtrip "
                         "into this (process-shared) directory")
    args = ap.parse_args()

    import jax

    # sitecustomize pins the axon TPU plugin; force CPU post-import,
    # pre-backend-init (same recipe as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dvae_tpu.config import (MeshConfig, ShardingStrategy, TrainConfig,
                                 VAEConfig)
    from dvae_tpu.parallel.runtime import (global_batch, initialize_distributed,
                                           local_slice, process_info)
    from dvae_tpu.parallel.sharding import (make_mesh, replicated,
                                            strategy_shardings)
    from dvae_tpu.train.step import (init_train_state, make_epoch_runner,
                                     make_optimizer)

    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)
    pid, nprocs = process_info()
    assert (pid, nprocs) == (args.process_id, args.num_processes)
    assert len(jax.devices()) == 4 * nprocs
    assert len(jax.local_devices()) == 4

    # data axis spans processes (the DCN hop); fsdp walks the 4 local
    # devices (the ICI analogue) — jax's default device order lists each
    # process's devices contiguously, so reshape(2, 1, 4) lands exactly there
    mesh = make_mesh(MeshConfig(data=nprocs, arm=1, fsdp=4))
    local_procs = {d.process_index for d in mesh.devices[pid, 0, :]}
    assert local_procs == {pid}, f"fsdp axis crosses processes: {local_procs}"

    # --- cross-process global-array formation + a collective over DCN ---
    n, d = 64, 32
    full = np.arange(n * d, dtype=np.float32).reshape(n, d) / (n * d)
    rows = local_slice(n, nprocs * 4)
    g = global_batch(full[rows], mesh)  # P(('data','fsdp')) over rows
    assert g.shape == (n, d)
    gmean = jax.jit(
        jnp.mean,
        out_shardings=NamedSharding(mesh, P()))(g)
    np.testing.assert_allclose(np.asarray(gmean), full.mean(), rtol=1e-6)

    # --- one real training step over the process-spanning mesh ---
    cfg = VAEConfig(n_categories=8, input_dim=d, fc_dim=16, lowD_dim=8,
                    state_dim=2, n_arm=2, tau=0.1)
    tcfg = TrainConfig(batch_size=32, epochs_per_jit=1)
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(7), cfg, tx)
    shs = strategy_shardings(ShardingStrategy.FULL_SHARD, mesh, state.params,
                             state.bn, state.opt_state)
    state = state._replace(
        params=jax.device_put(state.params, shs[0]),
        bn=jax.device_put(state.bn, shs[1]),
        opt_state=jax.device_put(state.opt_state, shs[2]))
    # every process holds the (deterministic) full dataset; commit replicated
    x = global_batch(full, mesh, P())
    run = jax.jit(make_epoch_runner(cfg, tcfg, tx, n_train=n))
    state2, ems = run(state, x, None, 1.0)
    loss = float(np.asarray(ems.total).ravel()[-1])

    # --- sharded checkpoint roundtrip across BOTH processes: orbax save of
    # the FULL_SHARD-sharded state (each rank writes its addressable
    # shards), restore to the same placements, then step both the original
    # and the restored state — the multi-host resume story end-to-end
    # (reference gap: FullStateDictConfig imported train.py:14-16, unused) ---
    ckpt = {"ok": None}
    if args.ckpt_dir:
        from dvae_tpu.utils.checkpoint import (abstract_like, restore_sharded,
                                               save_sharded)
        payload = {"params": state2.params, "bn": state2.bn,
                   "opt_state": state2.opt_state, "mask": state2.mask,
                   "key_data": jax.random.key_data(state2.key),
                   "epoch": state2.epoch}
        save_sharded(args.ckpt_dir, payload, metadata={"epoch": 1})
        restored, meta = restore_sharded(args.ckpt_dir,
                                         abstract_like(payload))
        shard_ok = all(
            r.sharding.is_equivalent_to(o.sharding, o.ndim)
            for o, r in zip(jax.tree_util.tree_leaves(payload),
                            jax.tree_util.tree_leaves(restored)))
        state3 = state2._replace(
            params=restored["params"], bn=restored["bn"],
            opt_state=restored["opt_state"], mask=restored["mask"],
            key=jax.random.wrap_key_data(restored["key_data"]),
            epoch=restored["epoch"])
        _, ems_a = run(state2, x, None, 1.0)
        _, ems_b = run(state3, x, None, 1.0)
        la = float(np.asarray(ems_a.total).ravel()[-1])
        lb = float(np.asarray(ems_b.total).ravel()[-1])
        ckpt = {"ok": bool(la == lb and shard_ok and
                           meta.get("epoch") == 1),
                "loss_orig": la, "loss_restored": lb,
                "shard_ok": bool(shard_ok)}

    # --- multi-process streaming: full host dataset per process, GLOBAL
    # batch size, each rank commits its row span of the identically
    # shuffled batch (data/stream.py contract) ---
    from dvae_tpu.data.stream import BatchStreamer
    bs = NamedSharding(mesh, P(("data", "fsdp"), None))
    streamer = BatchStreamer(full, 32, seed=9, sharding=bs)
    batches = list(streamer.epoch(0))
    assert len(batches) == 2
    assert batches[0].x.shape == (32, d)  # GLOBAL batch shape
    # assembled global batch equals the seed-deterministic selection
    order = np.random.default_rng((9, 0)).permutation(n)[:32]
    got = np.asarray(
        jax.jit(lambda t: t,
                out_shardings=NamedSharding(mesh, P()))(batches[0].x))
    np.testing.assert_allclose(got, full[order], rtol=0, atol=0)
    stream_batch_sum = float(got.sum())

    print(json.dumps({"pid": pid, "nprocs": nprocs,
                      "gmean": float(np.asarray(gmean)),
                      "stream_batch_sum": stream_batch_sum,
                      "loss": loss, "ckpt": ckpt}))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
