"""Per-op TPU time breakdown of the production training step.

Reconstructs the xprof op_profile recipe: ``jax.XlaRuntimeError``-free
alternative to ``cost_analysis()`` (which reports 0 FLOPs/bytes for Pallas
custom calls) — trace a few steps with ``jax.profiler.trace``, then convert
the captured ``.xplane.pb`` with tensorboard_plugin_profile and print the
self-time tree.

Usage:
    python scripts/op_profile.py [--zinb] [--augment] [--steps 30]

Prints the top-k ops by self time plus the total device time per step.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# tensorboard_plugin_profile ships stale _pb2 files; the pure-python
# protobuf runtime accepts them (slow parse, fine for profiles this size)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture(mode: str, steps: int, trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.config import TrainConfig, VAEConfig
    from dvae_tpu.train.step import (init_train_state, make_epoch_runner,
                                     make_optimizer)

    cfg = VAEConfig(n_arm=5, fused_recon=True, fused_encoder=True,
                    **({"mode": "ZINB"} if mode == "zinb" else {}))
    if mode == "eval":
        return _capture_eval(steps, trace_dir)
    tcfg = TrainConfig(batch_size=5000, epochs_per_jit=1, bf16=True,
                       rng_impl="rbg", shuffle_block=8)
    N = 20_000
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(0), cfg, tx,
                             rng_impl=tcfg.rng_impl)

    augment = None
    if mode == "augment":
        from dvae_tpu.augment.augmenter import (AugmenterConfig, augment_arms,
                                                init_augmenter)
        acfg = AugmenterConfig()
        ap, abn = init_augmenter(jax.random.key(7), acfg, jnp.bfloat16)

        def augment(key, x, n_arm):
            return augment_arms(ap, abn, acfg, key, x, n_arm, scale=0.1)

    from dvae_tpu.parallel.sharding import put_dataset
    rng = np.random.default_rng(0)
    x_all = put_dataset(rng.random((N, cfg.input_dim), dtype=np.float32),
                        jnp.bfloat16)
    run = jax.jit(make_epoch_runner(cfg, tcfg, tx, n_train=N,
                                    augment=augment,
                                    consensus_every_epoch=False))
    state, ems = run(state, x_all, None, 1.0)      # compile
    np.asarray(ems.total)                          # sync (tunnel-safe)
    with jax.profiler.trace(trace_dir):
        for _ in range(max(steps // 4, 1)):        # 4 steps per epoch chunk
            state, ems = run(state, x_all, None, 1.0)
        np.asarray(ems.total)


def _capture_eval(steps: int, trace_dir: str) -> None:
    """Per-op profile of the eval step (production shape, augmenter on —
    the summarize_inference hot path, reference cpl_mixvae.py:1450-1619)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.augment.augmenter import (AugmenterConfig, augment_arms,
                                            init_augmenter)
    from dvae_tpu.config import TrainConfig, VAEConfig
    from dvae_tpu.parallel.sharding import put_dataset
    from dvae_tpu.train.step import (init_train_state, make_eval_step,
                                     make_optimizer)

    cfg = VAEConfig(n_arm=5, fused_recon=True, fused_encoder=True)
    tcfg = TrainConfig(batch_size=5000, bf16=True, rng_impl="rbg")
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.key(0), cfg, tx,
                             rng_impl=tcfg.rng_impl)
    acfg = AugmenterConfig()
    ap, abn = init_augmenter(jax.random.key(7), acfg, jnp.bfloat16)

    def augment(key, x, n_arm):
        return augment_arms(ap, abn, acfg, key, x, n_arm, scale=0.1)

    ev = make_eval_step(cfg, tcfg, augment=augment)
    rng = np.random.default_rng(0)
    # committed in the compute dtype, as CplMixVAE._eval_dtype does
    x = put_dataset(rng.random((5000, cfg.input_dim), dtype=np.float32),
                    jnp.bfloat16)
    aux, lab, outs = ev(state, x, None, 1.0)       # compile
    np.asarray(lab)
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            aux, lab, outs = ev(state, x, None, 1.0)
        np.asarray(lab)


def _capture_gan(steps: int, trace_dir: str, bf16: bool) -> None:
    """Per-op profile of the augmenter GAN pretraining step
    (augment/train.make_gan_step at the production shape, B=1000)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dvae_tpu.augment.augmenter import (AugmenterConfig,
                                            DiscriminatorConfig,
                                            init_augmenter,
                                            init_discriminator)
    from dvae_tpu.augment.train import GanState, make_gan_step
    from dvae_tpu.parallel.sharding import put_dataset

    a_cfg = AugmenterConfig()
    d_cfg = DiscriminatorConfig()
    a_tx, d_tx = optax.adam(1e-3), optax.adam(1e-3)
    k_a, k_d, k_run = jax.random.split(jax.random.key(0), 3)
    a_params, a_bn = init_augmenter(k_a, a_cfg)
    d_params, d_bn = init_discriminator(k_d, d_cfg)
    state = GanState(a_params, a_bn, d_params, d_bn,
                     a_tx.init(a_params), d_tx.init(d_params), k_run)
    rng = np.random.default_rng(0)
    x = rng.gamma(0.3, 2.0, (20_000, a_cfg.input_dim)).astype(np.float32)
    x[x < 1.0] = 0.0
    x_all = put_dataset(x, jnp.float32)
    B, n = 1000, x.shape[0]
    nsteps = n // B
    step_fn = make_gan_step(a_cfg, d_cfg, a_tx, d_tx, bf16=bf16)

    @jax.jit
    def run_epoch(state, x_all):
        key, k_perm = jax.random.split(state.key)
        state = state._replace(key=key)
        plan = jax.random.permutation(k_perm, n)[: nsteps * B]
        plan = plan.reshape(nsteps, B)

        def body(st, sel):
            return step_fn(st, jnp.take(x_all, sel, axis=0))

        state, ms = jax.lax.scan(body, state, plan)
        return state, jax.tree_util.tree_map(jnp.mean, ms)

    for _ in range(2):  # compile + one-time-cost absorption
        state, m = run_epoch(state, x_all)
        np.asarray(m.a_loss)
    epochs = max(steps // nsteps, 1)
    with jax.profiler.trace(trace_dir):
        for _ in range(epochs):
            state, m = run_epoch(state, x_all)
        np.asarray(m.a_loss)
    return epochs * nsteps


def parse(trace_dir: str, top_k: int, n_steps: int) -> None:
    from xprof.convert import raw_to_tool_data

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane under {trace_dir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "op_profile", {})
    tree = json.loads(data)

    def walk(node, depth, rows):
        name = node.get("name", "?")
        if "idle" in str(name).lower():
            return
        # EXACTLY the op level (program → category → op = depth 3), never
        # deeper: op groups ("X and its duplicate(s)") are inclusive of
        # their duplicate children (descending double-counts), fusion
        # nodes hold all time themselves with zero-rawTime instruction
        # children (see utils/profiling.xplane_total_device_ms)
        if depth >= 3:
            t = node.get("metrics", {}).get("rawTime", 0)
            if t:
                rows.append((t, name, depth))
            return
        for ch in node.get("children", []):
            walk(ch, depth + 1, rows)

    by_prog = tree.get("byProgram", tree)
    rows: list = []
    walk(by_prog, 0, rows)
    leaves = [(t, n) for t, n, d in rows]
    leaves.sort(reverse=True)
    total_ps = sum(t for t, _ in leaves)
    print(f"total device time: {total_ps/1e12*1e3:.3f} ms "
          f"({total_ps/1e12*1e3/max(n_steps,1):.3f} ms/step over "
          f"{n_steps} steps)")
    for t, n in leaves[:top_k]:
        print(f"  {t/1e12*1e3:9.3f} ms  {100*t/total_ps:5.1f}%  {n[:100]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--zinb", action="store_true")
    ap.add_argument("--augment", action="store_true")
    ap.add_argument("--eval", action="store_true",
                    help="profile the eval step instead of training")
    ap.add_argument("--gan", action="store_true",
                    help="profile the augmenter GAN pretraining step")
    ap.add_argument("--gan-bf16", action="store_true")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse an existing --trace-dir without running")
    args = ap.parse_args()
    mode = ("gan" if args.gan else "eval" if args.eval
            else "zinb" if args.zinb
            else "augment" if args.augment else "mse")
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix=f"opprof_{mode}_")
    steps = args.steps if mode == "eval" else (args.steps // 4) * 4 or 4
    print(f"trace dir: {trace_dir}", flush=True)
    if not args.parse_only:
        if mode == "gan":
            steps = _capture_gan(steps, trace_dir, args.gan_bf16)
        else:
            capture(mode, steps, trace_dir)
    parse(trace_dir, args.top, steps)


if __name__ == "__main__":
    main()
