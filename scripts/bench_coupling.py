"""Production-shape verdict for the fused coupling-distance Pallas kernel.

``ops/coupling_pallas.py`` (custom_vjp, two numerical guards) is gated by
``VAEConfig.use_pallas`` — the same flag as the Gumbel sampling kernel —
so the committed 3.14-vs-2.66 ms/step use_pallas verdict (config.py)
conflated the two.  This measures the coupling kernel ALONE against the
XLA Gram-matrix path (models/losses.coupling_distance) at the production
shape (A=5, B=5000, C=92, f32 — coupling always computes in f32):

  * eval/fwd path — the kernel's custom_vjp forward;
  * train path — value_and_grad (the kernel's backward is the recompute
    VJP of the XLA implementation, so train = kernel fwd + XLA bwd).

Each timed region is one jitted ``lax.scan`` of ITERS calls (input
perturbed per-iteration so CSE can't collapse the loop), so the figure is
device-dominated even through the tunnel's dispatch RTTs.

Usage: python scripts/bench_coupling.py [--iters 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

A, B, C = 5, 5000, 92
EPS = 1e-8


def bench(fn, c, iters: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def run(c):
        def body(acc, i):
            d = fn(c * (1.0 + 1e-7 * i))
            return acc + d, ()

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(iters, dtype=jnp.float32))
        return acc

    for _ in range(2):                      # compile + settle
        np.asarray(run(c))
    t0 = time.perf_counter()
    np.asarray(run(c))
    return (time.perf_counter() - t0) / iters * 1e6   # µs/call


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.models.losses import coupling_distance
    from dvae_tpu.ops.coupling_pallas import coupling_distance_pallas
    from dvae_tpu.utils.tools import enable_compile_cache

    enable_compile_cache()
    # softmax-like posteriors (the real input is a τ-sharpened softmax)
    logits = jax.random.normal(jax.random.key(0), (A, B, C)) * 3.0
    c = jax.nn.softmax(logits, axis=-1).astype(jnp.float32)

    # numerics first: the two paths must agree (same guards)
    v_xla = float(coupling_distance(c, EPS))
    v_pal = float(coupling_distance_pallas(c, EPS))
    rel = abs(v_pal - v_xla) / max(abs(v_xla), 1e-30)
    print(f"value xla={v_xla:.6g} pallas={v_pal:.6g} rel={rel:.2e}")
    assert rel < 1e-4, "kernel diverged from the XLA path"

    results = {}
    for name, f in (("xla", lambda x: coupling_distance(x, EPS)),
                    ("pallas", lambda x: coupling_distance_pallas(x, EPS))):
        results[f"fwd_{name}"] = bench(f, c, args.iters)
        results[f"grad_{name}"] = bench(
            lambda x, f=f: jax.grad(lambda y: f(y))(x).sum(), c, args.iters)
    for k, v in results.items():
        print(f"{k:12s} {v:8.2f} µs/call")
    print(f"fwd speedup pallas/xla: "
          f"{results['fwd_xla'] / results['fwd_pallas']:.2f}x; "
          f"grad: {results['grad_xla'] / results['grad_pallas']:.2f}x")


if __name__ == "__main__":
    main()
