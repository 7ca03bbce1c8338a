"""VAE-GAN data augmenter — noise-conditioned VAE + discriminator.

Equivalent capability to the reference augmenter networks
(mmidas/augmentation/udagan.py: ``Augmenter`` :16-118, ``Discriminator``
:121-145, ``Augmenter_smartseq`` :217-329; drift duplicate in networks.py),
re-designed TPU-first:

  * The reference's "batched" arm-major forward pushes (A, B, D) through
    BatchNorm1d with a permute trick so the statistics pool over A·B
    (udagan.py:284-309).  Here the whole forward is written directly on
    (A, B, D) tensors with batch-norm reductions over the leading two axes
    — same math, no permutes, one fused XLA program.
  * Batch-norms: eps=1e-10, momentum=0.01, affine=False (udagan.py:31-88);
    the noise path ``bnz`` is affine=True (torch default, udagan.py:29).
  * ``reparam_trick`` draws Gaussian noise and uses the sigmoid head
    directly as the std (mmidas/augmentation/aug_utils.py:51-64).

Architecture (Augmenter_smartseq, D=input_dim, H=n_dim, Z=latent, NZ=noise):
  enc:  drop(x) → fc1(D,D//5) BN relu → fc2 BN relu → fc3(,H) BN relu
        → fc4(H,H) BN relu → concat(noise: elu(BNz(W z)))
        → fc5(H+NZ, H//5) BN relu → mu=BN(fc_mu), sigma=sigmoid(fc_sigma)
  dec:  s=mu+ε·sigma → fc6(Z,H//5) … fc10 BN relu → relu(fc11(,D))
The generic ``Augmenter`` variant (10x / ZINB) differs only in widths, the
fc5/fc5n split, and optional ZINB head fc11_p (udagan.py:16-118).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-10
BN_MOMENTUM = 0.01
# bnz is a torch-default BatchNorm1d in the reference (udagan.py:227 /
# networks.py:19): eps=1e-5, momentum=0.1 — unlike every fc BN
_BN_HYPERS = {"bnz": (1e-5, 0.1)}


@dataclass(frozen=True)
class AugmenterConfig:
    noise_dim: int = 50
    latent_dim: int = 10
    input_dim: int = 5032
    n_dim: int = 500            # smartseq default (udagan.py:217); 100 for 10x
    p_drop: float = 0.5
    n_zim: int = 1              # >1 adds the ZINB dropout head fc11_p
    variant: str = "smartseq"   # "smartseq" | "generic"


def _linear_shapes(cfg: AugmenterConfig) -> dict:
    D, H, Z, NZ = cfg.input_dim, cfg.n_dim, cfg.latent_dim, cfg.noise_dim
    D5, H5 = D // 5, H // 5
    shapes = {
        "noise": (NZ, NZ),          # bias-free (udagan.py:28)
        "fc1": (D, D5), "fc2": (D5, D5), "fc3": (D5, H), "fc4": (H, H),
        "fc5": (H + NZ, H5),
        "fc_mu": (H5, Z), "fc_sigma": (H5, Z),
        "fc6": (Z, H5), "fc7": (H5, H), "fc8": (H, H), "fc9": (H, D5),
        "fc10": (D5, D5), "fc11": (D5, D),
    }
    if cfg.variant == "generic":
        # udagan.py:16-118: the generic Augmenter keeps BOTH a plain fc5
        # (n_dim -> n_dim//5, used when noise=False) and the noise-concat
        # fc5n; our "fc5" is the reference fc5n, "fc5_plain" its fc5
        shapes["fc5_plain"] = (H, H5)
    if cfg.n_zim > 1:
        shapes["fc11_p"] = (D5, D)
    return shapes


_BN_LAYERS = ("bnz", "bn1", "bn2", "bn3", "bn4", "bn5", "bn_mu",
              "bn6", "bn7", "bn8", "bn9", "bn10")


def _bn_dims(cfg: AugmenterConfig) -> dict:
    D5, H, H5, Z, NZ = (cfg.input_dim // 5, cfg.n_dim, cfg.n_dim // 5,
                        cfg.latent_dim, cfg.noise_dim)
    dims = {"bnz": NZ, "bn1": D5, "bn2": D5, "bn3": H, "bn4": H, "bn5": H5,
            "bn_mu": Z, "bn6": H5, "bn7": H, "bn8": H, "bn9": D5, "bn10": D5}
    if cfg.variant == "generic":
        # the plain fc5 branch keeps its OWN running stats (reference
        # batch_fc5 vs batch_fc5n are independent BatchNorm1d layers)
        dims["bn5_plain"] = H5
    return dims


def init_augmenter(key: jax.Array, cfg: AugmenterConfig, dtype=jnp.float32):
    """Returns (params, bn_state)."""
    shapes = _linear_shapes(cfg)
    names = list(shapes)
    keys = jax.random.split(key, len(names))
    params = {}
    for n, k in zip(names, keys):
        fan_in, fan_out = shapes[n]
        bound = 1.0 / np.sqrt(fan_in)
        kw, kb = jax.random.split(k)
        params[n] = {
            "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
            "b": (None if n == "noise" else
                  jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)),
        }
    bn = {}
    for n, d in _bn_dims(cfg).items():
        bn[n] = {"mean": jnp.zeros((d,), dtype), "var": jnp.ones((d,), dtype)}
        if n == "bnz":  # affine=True
            bn[n]["scale"] = jnp.ones((d,), dtype)
            bn[n]["bias"] = jnp.zeros((d,), dtype)
    return params, bn


def _lin(p, x):
    y = x @ p["w"]
    return y if p["b"] is None else y + p["b"]


def _bn(x, stats, train: bool, eps: float = BN_EPS,
        momentum: float = BN_MOMENTUM):
    """Normalize over all leading axes (pools over A·B in arm-major mode —
    the permute-trick semantics of udagan.py:284-309).

    Statistics compute in the running-stat dtype (f32 — batch moments in
    bf16 lose ~3 digits and would also silently promote every activation
    back to f32, defeating mixed-precision matmuls downstream); the
    normalized output returns in the activation dtype.  ``eps``/``momentum``
    default to the fc-BN values; bnz overrides with torch defaults
    (_BN_HYPERS).
    """
    red = tuple(range(x.ndim - 1))
    xf = x.astype(stats["mean"].dtype)
    if train:
        mean = jnp.mean(xf, axis=red)
        var = jnp.var(xf, axis=red)
        n = int(np.prod(x.shape[:-1]))
        unbiased = var * (n / max(n - 1, 1))
        new = dict(stats)
        new["mean"] = (1 - momentum) * stats["mean"] + momentum * mean
        new["var"] = (1 - momentum) * stats["var"] + momentum * unbiased
    else:
        mean, var, new = stats["mean"], stats["var"], stats
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "scale" in stats:
        y = y * stats["scale"] + stats["bias"]
    return y.astype(x.dtype), new


def _drop(key, x, rate, train):
    if not train or rate <= 0:
        return x
    keep = 1.0 - rate
    return jnp.where(jax.random.bernoulli(key, keep, x.shape),
                     x / keep, 0.0).astype(x.dtype)


def _noise_concat(params, bn_fn, cfg: AugmenterConfig, h, k_noise,
                  scale, dtype):
    """z-draw + elu(BNz(W z)) + concat + fc5 (udagan.py:288-296)."""
    z = scale * jax.random.normal(k_noise, h.shape[:-1] + (cfg.noise_dim,),
                                  dtype)
    z = bn_fn("bnz", _lin(params["noise"], z), act=jax.nn.elu)
    h = jnp.concatenate([h, z], axis=-1)
    return bn_fn("bn5", _lin(params["fc5"], h))


def _latent_decode(params, bn_fn, cfg: AugmenterConfig, h, k_reparam,
                   zinb_head: bool):
    """fc_mu/fc_sigma reparam + the fc6..fc11 decoder (udagan.py:297-309);
    shared by ``apply_augmenter`` and the ``augment_arms`` fast path so
    the two forwards cannot drift apart.  Returns (s, x_mu, x_p|None)."""
    mu = bn_fn("bn_mu", _lin(params["fc_mu"], h), act=None)
    sigma = jax.nn.sigmoid(_lin(params["fc_sigma"], h))
    s = mu + jax.random.normal(k_reparam, mu.shape, mu.dtype) * sigma

    h = bn_fn("bn6", _lin(params["fc6"], s))
    h = bn_fn("bn7", _lin(params["fc7"], h))
    h = bn_fn("bn8", _lin(params["fc8"], h))
    h = bn_fn("bn9", _lin(params["fc9"], h))
    h = bn_fn("bn10", _lin(params["fc10"], h))
    x_mu = jax.nn.relu(_lin(params["fc11"], h))
    x_p = (jax.nn.sigmoid(_lin(params["fc11_p"], h)) if zinb_head else None)
    return s, x_mu, x_p


def apply_augmenter(params, bn, cfg: AugmenterConfig, x: jax.Array,
                    key: jax.Array, train: bool = False,
                    noise: bool = True, scale: float = 1.0):
    """Forward. ``x``: (..., D) — works on (B, D) or arm-major (A, B, D).

    Returns (s, x_out, new_bn) with x_out (..., D) (or (..., 2D) when
    n_zim>1 — [x_mu, x_p] concatenated like udagan.py:112-115).
    """
    k_drop, k_noise, k_reparam = jax.random.split(key, 3)
    new_bn = dict(bn)

    def bnr(name, h, act=jax.nn.relu):
        eps, mom = _BN_HYPERS.get(name, (BN_EPS, BN_MOMENTUM))
        y, new_bn[name] = _bn(h, bn[name], train, eps, mom)
        return act(y) if act else y

    h = _drop(k_drop, x, cfg.p_drop, train)
    h = bnr("bn1", _lin(params["fc1"], h))
    h = bnr("bn2", _lin(params["fc2"], h))
    h = bnr("bn3", _lin(params["fc3"], h))
    h = bnr("bn4", _lin(params["fc4"], h))

    if cfg.variant == "smartseq":
        # smartseq has no deterministic branch (udagan.py:247-251): its
        # noise-off forward is the SAME fc5 path with a zero z draw, so
        # noise=False must zero the scale, not silently inject full noise
        h = _noise_concat(params, bnr, cfg, h, k_noise,
                          scale if noise else 0.0, x.dtype)
    elif noise:
        h = _noise_concat(params, bnr, cfg, h, k_noise, scale, x.dtype)
    else:
        h = bnr("bn5_plain", _lin(params["fc5_plain"], h))

    s, x_mu, x_p = _latent_decode(params, bnr, cfg, h, k_reparam,
                                  zinb_head=cfg.n_zim > 1)
    if x_p is not None:
        return s, jnp.concatenate([x_mu, x_p], axis=-1), new_bn
    return s, x_mu, new_bn


def augment_arms(params, bn, cfg: AugmenterConfig, key: jax.Array,
                 x: jax.Array, n_arm: int, scale: float = 0.1) -> jax.Array:
    """Frozen-augmenter per-arm views: (B, D) → (A, B, D).

    The in-training-loop call (reference cpl_mixvae.py:422-425:
    ``netA(x.expand(A,-1,-1), True, 0.1)[1]`` with the augmenter in .eval()
    — frozen weights and running BN stats).

    In eval mode dropout is identity and batch-norm reads running stats, so
    the fc1–fc4 encoder trunk is **arm-independent**: it runs once on
    (B, D) and broadcasts; arms diverge only at the per-arm noise concat
    before fc5.  At A=5/D=5032/H=500 this removes ~40% of the augmenter's
    FLOPs vs the reference's expand-then-forward (which recomputes the
    trunk A times).  The RNG key split/draw order matches
    ``apply_augmenter`` exactly, so results are identical to the naive
    broadcast path (oracle-tested).  The unused ZINB ``fc11_p`` head (its
    output is discarded here) is skipped too.
    """
    _, k_noise, k_reparam = jax.random.split(key, 3)

    def ev(name, h, act=jax.nn.relu):
        eps, mom = _BN_HYPERS.get(name, (BN_EPS, BN_MOMENTUM))
        y, _ = _bn(h, bn[name], False, eps, mom)
        return act(y) if act else y

    h = ev("bn1", _lin(params["fc1"], x))
    h = ev("bn2", _lin(params["fc2"], h))
    h = ev("bn3", _lin(params["fc3"], h))
    h = ev("bn4", _lin(params["fc4"], h))
    h = jnp.broadcast_to(h, (n_arm,) + h.shape)

    h = _noise_concat(params, ev, cfg, h, k_noise, scale, x.dtype)
    _, x_mu, _ = _latent_decode(params, ev, cfg, h, k_reparam,
                                zinb_head=False)
    if cfg.n_zim > 1:
        # binary-masked ZINB augmentation (build/lib nn_model semantics):
        # keep entries where the original was nonzero
        return x_mu * (x > 0).astype(x_mu.dtype)
    return x_mu


def kl_dist(mu1, var1, mu2, var2, eps: float = 1e-6):
    """KL divergence between two diagonal Gaussians, summed over dims and
    averaged over the batch (reference ``KL_dist``,
    mmidas/augmentation/aug_utils.py:20-27)."""
    logli = (jnp.log((var2 + eps) / (var1 + eps))
             + (var1 + (mu1 - mu2) ** 2) / (2.0 * var2 + eps) - 0.5)
    return jnp.mean(jnp.sum(logli, axis=1))


@dataclass(frozen=True)
class GeneratorConfig:
    """The reference ``Generator`` (udagan.py:148-214): a plain VAE with
    its own (narrower) topology — fc1(D→n_dim), fc2/fc3 (n_dim-wide),
    mu/sigma straight from n_dim, decoder fc6/fc7/fc10 only (no noise
    path, no fc4/fc5/fc8/fc9).  Unused by any reference entry point but
    part of the module surface."""

    latent_dim: int = 10
    input_dim: int = 5032
    n_dim: int = 100
    n_zim: int = 1
    p_drop: float = 0.1


def init_generator(key: jax.Array, cfg: GeneratorConfig, dtype=jnp.float32):
    """Returns (params, bn_state) for ``apply_generator``."""
    D, H, Z = cfg.input_dim, cfg.n_dim, cfg.latent_dim
    shapes = {"fc1": (D, H), "fc2": (H, H), "fc3": (H, H),
              "fc_mu": (H, Z), "fc_sigma": (H, Z),
              "fc6": (Z, H), "fc7": (H, H), "fc10": (H, H), "fc11": (H, D)}
    if cfg.n_zim > 1:
        shapes["fc11_p"] = (H, D)
    keys = jax.random.split(key, len(shapes))
    params = {}
    for (n, (fi, fo)), k in zip(shapes.items(), keys):
        bound = 1.0 / np.sqrt(fi)
        kw, kb = jax.random.split(k)
        params[n] = {"w": jax.random.uniform(kw, (fi, fo), dtype,
                                             -bound, bound),
                     "b": jax.random.uniform(kb, (fo,), dtype,
                                             -bound, bound)}
    dims = {"bn1": H, "bn2": H, "bn3": H, "bn_mu": Z, "bn6": H, "bn7": H,
            "bn10": H}
    bn = {n: {"mean": jnp.zeros((d,), dtype), "var": jnp.ones((d,), dtype)}
          for n, d in dims.items()}
    return params, bn


def apply_generator(params, bn, cfg: GeneratorConfig, x: jax.Array,
                    key: jax.Array, train: bool = False):
    """Forward (udagan.py:198-213).  Returns (s, x_out, new_bn); x_out is
    (..., 2D) [x_mu, x_p] when n_zim > 1."""
    k_drop, k_reparam = jax.random.split(key)
    new_bn = dict(bn)

    def bnr(name, h, act=jax.nn.relu):
        y, new_bn[name] = _bn(h, bn[name], train)
        return act(y) if act else y

    h = _drop(k_drop, x, cfg.p_drop, train)
    h = bnr("bn1", _lin(params["fc1"], h))
    h = bnr("bn2", _lin(params["fc2"], h))
    h = bnr("bn3", _lin(params["fc3"], h))
    mu = bnr("bn_mu", _lin(params["fc_mu"], h), act=None)
    sigma = jax.nn.sigmoid(_lin(params["fc_sigma"], h))
    s = mu + jax.random.normal(k_reparam, mu.shape, mu.dtype) * sigma
    h = bnr("bn6", _lin(params["fc6"], s))
    h = bnr("bn7", _lin(params["fc7"], h))
    h = bnr("bn10", _lin(params["fc10"], h))
    x_mu = jax.nn.relu(_lin(params["fc11"], h))
    if cfg.n_zim > 1:
        x_p = jax.nn.sigmoid(_lin(params["fc11_p"], h))
        return s, jnp.concatenate([x_mu, x_p], axis=-1), new_bn
    return s, x_mu, new_bn


# ---------------------------------------------------------------------------
# Discriminator (udagan.py:121-145)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DiscriminatorConfig:
    input_dim: int = 5032
    p_drop: float = 0.2


def init_discriminator(key: jax.Array, cfg: DiscriminatorConfig,
                       dtype=jnp.float32):
    D = cfg.input_dim
    D5 = D // 5
    shapes = {"fc1": (D, D5), "fc2": (D5, D5), "disc": (D5, 1)}
    keys = jax.random.split(key, len(shapes))
    params = {}
    for (n, (fi, fo)), k in zip(shapes.items(), keys):
        bound = 1.0 / np.sqrt(fi)
        kw, kb = jax.random.split(k)
        params[n] = {"w": jax.random.uniform(kw, (fi, fo), dtype, -bound, bound),
                     "b": jax.random.uniform(kb, (fo,), dtype, -bound, bound)}
    bn = {n: {"mean": jnp.zeros((D5,), dtype), "var": jnp.ones((D5,), dtype)}
          for n in ("bn1", "bn2")}
    return params, bn


def apply_discriminator(params, bn, cfg: DiscriminatorConfig, x: jax.Array,
                        key: jax.Array, train: bool = False):
    """Returns (features, probs, new_bn)."""
    new_bn = dict(bn)
    h = _drop(key, x, cfg.p_drop, train)
    h, new_bn["bn1"] = _bn(_lin(params["fc1"], h), bn["bn1"], train)
    h = jax.nn.relu(h)
    h, new_bn["bn2"] = _bn(_lin(params["fc2"], h), bn["bn2"], train)
    h = jax.nn.relu(h)
    probs = jax.nn.sigmoid(_lin(params["disc"], h))
    return h, probs, new_bn


# ---------------------------------------------------------------------------
# Checkpoint loading for the training loop
# ---------------------------------------------------------------------------

def save_augmenter(path: str, params, bn, cfg: AugmenterConfig,
                   extra: Optional[dict] = None) -> str:
    """Checkpoint includes the hyperparameter dict, which loading reads
    back — reference augmentation/train.py:139-147 + cpl_mixvae.py:128-149."""
    from dvae_tpu.utils.checkpoint import save_checkpoint
    meta = {"cfg": cfg.__dict__, **(extra or {})}
    return save_checkpoint(path, {"params": params, "bn": bn}, meta)


def load_augmenter(path: str):
    """Returns (params, bn, cfg)."""
    from dvae_tpu.utils.checkpoint import load_checkpoint
    tree, meta = load_checkpoint(path)
    cfg = AugmenterConfig(**meta["cfg"])
    params = jax.tree_util.tree_map(jnp.asarray, tree["params"])
    bn = jax.tree_util.tree_map(jnp.asarray, tree["bn"])
    return params, bn, cfg


def make_augment_apply(params, bn, cfg, dtype=None):
    """Frozen closure over in-memory augmenter weights:
    (key, x, n_arm, scale) → (A, B, D).

    ``dtype``: cast the frozen weights once (bf16 under mixed-precision
    training — with f32 weights a bf16 activation promotes every augmenter
    matmul to the 3-pass f32 MXU rate).  BN running stats stay f32
    (``_bn`` computes in the stat dtype and returns the activation dtype).
    The ONE place the cast/closure rule lives — the trainer's f32 and bf16
    paths and ``load_augmenter_apply`` all delegate here.
    """
    params = cast_augmenter_params(params, dtype)

    def fn(key, x, n_arm, scale=0.1):
        return augment_arms(params, bn, cfg, key, x, n_arm, scale)
    return fn


def frozen_random_augment_fn(input_dim: int, bf16: bool = False,
                             n_dim=None, seed: int = 7, scale: float = 0.1):
    """Random-weight frozen augmenter closure: (key, x, n_arm) → (A, B, D).

    Forward cost and sharding behavior equal a trained augmenter's
    (reference cpl_mixvae.py:422-425), so benches and compile censuses use
    this instead of shipping a checkpoint.  ``bf16`` casts the weights once
    (the make_augment_apply cast rule); ``n_dim`` overrides the latent
    width for small shapes.  The ONE copy — bench.py and parallel/census.py
    both delegate here.
    """
    kw = {"input_dim": input_dim}
    if n_dim is not None:
        kw["n_dim"] = n_dim
    acfg = AugmenterConfig(**kw)
    params, bn = init_augmenter(jax.random.key(seed), acfg)
    apply = make_augment_apply(params, bn, acfg,
                               jnp.bfloat16 if bf16 else None)

    def fn(key, x, n_arm):
        return apply(key, x, n_arm, scale)
    return fn


def load_augmenter_apply(path: str, dtype=None):
    """``make_augment_apply`` over a checkpoint file (reference
    ``mk_augmenter``, cpl_mixvae.py:128-149)."""
    params, bn, cfg = load_augmenter(path)
    return make_augment_apply(params, bn, cfg, dtype)


def cast_augmenter_params(params, dtype=None):
    """Cast floating param leaves (None = identity); BN stats stay f32."""
    if dtype is None:
        return params
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
