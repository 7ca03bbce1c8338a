"""Declarative high-level trainer — the Lightning-variant capability.

Equivalent capability to the reference's PyTorch-Lightning take on the MNIST
benchmark (``dist/pl.py``): ``LightningModule`` subclasses with
``training_step``/``validation_step``/``configure_optimizers`` (:26-140),
``L.Trainer(max_epochs, strategy='fsdp', use_distributed_sampler, logger)``
+ ``trainer.fit(model, train_loader, test_loader)`` (:181-188), per-epoch
``epoch_time``/``cuda_memory``/``train_loss``/``val_loss`` logging
(:53-75), and the post-run average-epoch-time / average-memory summary the
reference mines back out of the wandb API (:191-207) — re-designed TPU-first:

  * A ``FitModule`` is a *pure-function* bundle (init / step / optimizer),
    not a stateful nn.Module: params live in a pytree the Trainer owns.
  * ``strategy='fsdp'`` becomes the same ``ShardingStrategy`` matrix used
    everywhere in this framework (parallel/sharding.py): a 1-D ``dp`` mesh
    with param/opt-state ``NamedSharding`` rules; no process groups, no
    ``devices=[1, 3]`` pinning, no rendezvous.
  * The epoch is ONE jitted ``lax.scan`` over pre-staged batches instead of
    a per-batch python loop — host dispatch disappears from the hot path.
  * ``use_distributed_sampler`` keeps its reference meaning: True shards
    the batch axis across the mesh (each device sees a distinct
    micro-batch); False replicates the batch (every device computes the
    full batch — the reference's ``--no-sampler`` duplicated-work mode,
    kept for benchmark parity).
  * The post-run summary comes from the logger's in-memory history — no
    wandb-API round trip — but is also pushed to wandb when enabled.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dvae_tpu.config import ShardingStrategy
from dvae_tpu.utils.logging import MetricLogger, avg, device_memory_mb


class FitModule:
    """Subclass API (the reference's ``L.LightningModule`` role).

    Required:
      * ``init_params(key) -> params`` pytree
      * ``training_step(params, batch, key) -> (loss, metrics dict)`` —
        differentiable in ``params``; ``batch`` is a tuple of arrays.
      * ``configure_optimizer() -> optax.GradientTransformation``
        (reference ``configure_optimizers``, dist/pl.py:76-78)

    Optional:
      * ``validation_step(params, batch) -> metrics dict`` (scalars).

    Epoch timing and device-memory logging are built into the Trainer
    (the reference implements them as ``on_train_epoch_start/end`` hooks
    and a per-step ``cuda_memory`` log, dist/pl.py:53-66).
    """

    def init_params(self, key: jax.Array):
        raise NotImplementedError

    def training_step(self, params, batch, key: jax.Array):
        raise NotImplementedError

    def configure_optimizer(self) -> optax.GradientTransformation:
        raise NotImplementedError

    validation_step: Any = None


def _generic_shardings(tree, mesh: Mesh, shard: bool, axis: str = "dp"):
    """Shard each leaf's largest mesh-divisible dim (2-D+ leaves only);
    replicate the rest.  The pytree analogue of FSDP's size-based auto-wrap:
    vectors and indivisible layers stay replicated."""
    n = mesh.devices.size
    repl = NamedSharding(mesh, P())

    def rule(leaf):
        if not (shard and hasattr(leaf, "ndim") and leaf.ndim >= 2):
            return repl
        cands = [(leaf.shape[i], i) for i in range(leaf.ndim)
                 if leaf.shape[i] % n == 0]
        if not cands:
            return repl
        _, i = max(cands)
        spec = [None] * leaf.ndim
        spec[i] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, tree)


@dataclass
class Trainer:
    """``L.Trainer`` equivalent (reference dist/pl.py:181-187)."""

    max_epochs: int = 10
    strategy: ShardingStrategy | str = ShardingStrategy.FULL_SHARD
    devices: Optional[int] = None          # None = all local devices
    use_distributed_sampler: bool = True
    shuffle: bool = False                  # reference loaders use shuffle=False
    seed: int = 1                          # reference default (dist/pl.py:215)
    logger: Optional[MetricLogger] = None
    history: list = field(default_factory=list)   # reset by each fit()
    _fitted: Any = None

    def fit(self, module: FitModule, train_data, val_data=None,
            batch_size: int = 64, val_batch_size: int = 1000,
            verbose: bool = False) -> dict:
        """Run the fit loop; returns the post-run summary dict.

        ``train_data``/``val_data`` are tuples of equal-length arrays
        (e.g. ``(x, y)``) — the loader analogue.  Remainder rows beyond a
        whole number of batches are dropped (reference ``drop_last=True``,
        dist/pl.py:166).
        """
        self.history = []
        strategy = ShardingStrategy(self.strategy)
        devs = jax.devices()[: self.devices or len(jax.devices())]
        mesh = Mesh(np.asarray(devs), ("dp",))
        logger = self.logger or MetricLogger()
        shard_params = strategy in (ShardingStrategy.FULL_SHARD,
                                    ShardingStrategy.HYBRID_SHARD)
        shard_opt = strategy in (
            ShardingStrategy.FULL_SHARD, ShardingStrategy.HYBRID_SHARD,
            ShardingStrategy.SHARD_GRAD_OP,
            ShardingStrategy.HYBRID_SHARD_ZERO2)

        params = module.init_params(jax.random.key(self.seed))
        tx = module.configure_optimizer()
        opt_state = tx.init(params)
        params = jax.device_put(
            params, _generic_shardings(params, mesh, shard_params))
        opt_state = jax.device_put(
            opt_state, _generic_shardings(opt_state, mesh, shard_opt))

        bspec = ("dp",) if self.use_distributed_sampler else (None,)
        batch_sh = NamedSharding(mesh, P(None, *bspec))  # (steps, B, ...)

        def stage(data, bs, sh=batch_sh):
            """(steps, B, ...) device arrays, remainder dropped."""
            n = data[0].shape[0]
            steps = n // bs
            if steps == 0:
                raise ValueError(f"batch_size {bs} > dataset size {n}")
            return steps, tuple(
                jax.device_put(
                    jnp.asarray(a[: steps * bs]).reshape(
                        (steps, bs) + a.shape[1:]), sh)
                for a in data)

        n_steps, tbatches = stage(train_data, batch_size)
        vbatches = None
        if val_data is not None and module.validation_step is not None:
            # clamp: a validation set smaller than val_batch_size should
            # evaluate as one batch, not crash in stage(); the batch axis
            # must stay divisible by the sampler's dp span
            dp = len(devs) if self.use_distributed_sampler else 1
            n_val = val_data[0].shape[0]
            vbs = min(val_batch_size, n_val)
            vbs = max(dp, vbs - vbs % dp)
            if vbs > n_val:
                # fewer val rows than the dp span: the batch axis cannot
                # shard evenly, so evaluate the whole set as ONE
                # replicated batch instead of crashing in stage()
                _, vbatches = stage(val_data, n_val,
                                    NamedSharding(mesh, P(None, None)))
            else:
                _, vbatches = stage(val_data, vbs)

        def grad_step(carry, inp):
            params, opt_state = carry
            key, batch = inp

            def lf(p):
                loss, metrics = module.training_step(p, batch, key)
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(
                lf, has_aux=True)(params)
            grads = jax.tree_util.tree_map(
                lambda g, p: g.astype(p.dtype), grads, params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # a module-provided 'train_loss' metric wins over the raw loss
            return (params, opt_state), {"train_loss": loss, **metrics}

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run_epoch(params, opt_state, batches, key):
            # donating params/opt_state lets XLA update them in place —
            # no 2x parameter+optimizer copy at every epoch boundary
            keys = jax.random.split(key, n_steps)
            (params, opt_state), ms = jax.lax.scan(
                grad_step, (params, opt_state), (keys, batches))
            return params, opt_state, jax.tree_util.tree_map(jnp.mean, ms)

        @jax.jit
        def run_val(params, batches):
            ms = jax.lax.map(
                lambda b: module.validation_step(params, b), batches)
            return jax.tree_util.tree_map(jnp.mean, ms)

        perm_rng = np.random.default_rng(self.seed)
        for epoch in range(self.max_epochs):
            t0 = time.perf_counter()
            eb = tbatches
            if self.shuffle:
                order = perm_rng.permutation(n_steps * batch_size)
                eb = tuple(
                    jax.device_put(
                        a.reshape((-1,) + a.shape[2:])[order].reshape(
                            a.shape), batch_sh) for a in tbatches)
            params, opt_state, ms = run_epoch(
                params, opt_state, eb,
                jax.random.fold_in(jax.random.key(self.seed), epoch))
            rec = {k: float(np.asarray(v)) for k, v in ms.items()}
            if vbatches is not None:
                vms = run_val(params, vbatches)
                rec.update({f"val_{k}" if not k.startswith("val_") else k:
                            float(np.asarray(v)) for k, v in vms.items()})
            rec["epoch_time"] = time.perf_counter() - t0
            rec["device_memory_mb"] = device_memory_mb()
            self.history.append(rec)
            logger.log(rec, step=epoch)
            if verbose:
                print(f"epoch {epoch}: " + " ".join(
                    f"{k}={v:.4g}" for k, v in rec.items()))

        # post-run summary (reference dist/pl.py:191-207 mines these back
        # out of the wandb API; our history is local)
        summary = {
            "avg_epoch_time": avg(r["epoch_time"] for r in self.history[1:]
                                  or self.history),
            "avg_memory_usage": avg(r["device_memory_mb"]
                                    for r in self.history),
        }
        logger.log(summary)
        self._fitted = (params, opt_state)
        return summary

    @property
    def params(self):
        """Trained parameters from the last ``fit`` call."""
        if self._fitted is None:
            raise RuntimeError("Trainer.params: no completed fit() yet")
        return self._fitted[0]


# ---------------------------------------------------------------------------
# The reference's PLNet / PLDeepNet analogues (dist/pl.py:26-140), built on
# the tutorial MLPs so the Lightning path benches the same model scales.
# ---------------------------------------------------------------------------

class MNISTFitModule(FitModule):
    """``PLNet`` (≈1M params) / ``PLDeepNet`` (≈87M) as a FitModule.

    ``model``: "net" | "deep" (reference ``make_model``, dist/pl.py:141-148),
    or pass an explicit ``MLPConfig`` for test-sized nets.
    """

    def __init__(self, model: str = "net", cfg=None, lr: float = 1e-3):
        from dvae_tpu.examples.fsdp_tutorial import MLPConfig
        if cfg is None:
            cfg = (MLPConfig.shallow() if model == "net"
                   else MLPConfig.deep())
        self.cfg, self.lr = cfg, lr

    def init_params(self, key):
        from dvae_tpu.examples.fsdp_tutorial import init_mlp
        return init_mlp(key, self.cfg)

    def _loss(self, params, batch):
        from dvae_tpu.examples.fsdp_tutorial import apply_mlp
        x, y = batch
        logits = apply_mlp(params, x)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return loss, acc

    def training_step(self, params, batch, key):
        loss, _ = self._loss(params, batch)
        return loss, {}

    def validation_step(self, params, batch):
        loss, acc = self._loss(params, batch)
        return {"loss": loss, "acc": acc}

    def configure_optimizer(self):
        return optax.adam(self.lr)


def fit_mnist_demo(model: str = "net", max_epochs: int = 3,
                   strategy: str = "full", batch_size: int = 64,
                   n_train: int = 8192, verbose: bool = True) -> dict:
    """The ``pl_main`` walkthrough (dist/pl.py:150-207) end to end on
    synthetic MNIST; returns the post-run summary."""
    from dvae_tpu.examples.fsdp_tutorial import synthetic_mnist
    trainer = Trainer(max_epochs=max_epochs, strategy=strategy)
    summary = trainer.fit(
        MNISTFitModule(model), synthetic_mnist(n_train, seed=0),
        val_data=synthetic_mnist(2048, seed=1), batch_size=batch_size,
        verbose=verbose)
    if verbose:
        print(f"Average epoch time: {summary['avg_epoch_time']:.3f}s")
        print(f"Average memory usage: {summary['avg_memory_usage']:.1f}MB")
    return summary
