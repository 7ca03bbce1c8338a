"""Import reference PyTorch ``.pth`` checkpoints into dvae_tpu pytrees.

The migration path for a reference user: their trained artifacts are torch
checkpoints —

  * trainer checkpoints ``{"model_state_dict", "optimizer_state_dict"}``
    (reference mmidas/cpl_mixvae.py:777-788), with per-arm ``nn.ModuleList``
    parameter names ``fc1.{arm}.weight`` … ``fc11.{arm}.bias`` (ZINB heads
    ``fc11_p``/``fc11_r``; mmidas/nn_model.py:184-206) and batch-norm
    buffers ``batch_l{1..5}.{arm}.running_mean/running_var``
    (:208-247; ``batch_s`` exists but is never applied in forward);
  * augmenter checkpoints ``{"netA", "netD", "optimA", "optimD",
    "parameters"}`` (mmidas/augmentation/train.py:139-147) with the
    ``Augmenter_smartseq`` layer names (udagan.py:217-283) and the
    hyperparameters dict that ``mk_augmenter`` reads back
    (cpl_mixvae.py:128-149: ``num_n``/``num_z``/``n_features``).

Conversions performed here:
  * torch ``nn.Linear.weight`` is (out, in) → transposed to our (in, out);
  * per-arm ModuleList entries → stacked leading-A-axis leaves;
  * ``torch.nn.utils.prune`` reparameterization (``weight_orig`` ×
    ``weight_mask``, cpl_mixvae.py:1152-1161) is folded into the dense
    weight, and the (C,) category mask is recovered from the ``fcc`` row
    mask;
  * torch Adam state (``exp_avg``/``exp_avg_sq``/``step``) → optax
    ``ScaleByAdamState`` (``mu``/``nu``/``count``) — both apply bias
    correction at update time, so resuming is semantically seamless;
  * all model hyperparameters (A, D, F, L, C, S, ZINB mode) are inferred
    from tensor shapes, so no config file is needed.

Requires torch only for ``torch.load`` deserialization (CPU).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from dvae_tpu.utils.checkpoint import parse_epoch, save_checkpoint

# our mixVAE linear names == reference ModuleList attribute names
# (models/mixvae._arm_shapes); bn names map to the reference buffers
_MIXVAE_BN = {"bn1": "batch_l1", "bn2": "batch_l2", "bn3": "batch_l3",
              "bn4": "batch_l4", "bn5": "batch_l5"}

# our augmenter names (augment/augmenter._linear_shapes / _BN_LAYERS) →
# reference Augmenter_smartseq attribute names (udagan.py:217-283)
_AUG_LINEAR = {name: name for name in (
    "noise", "fc1", "fc2", "fc3", "fc4", "fc5", "fc_mu", "fc_sigma",
    "fc6", "fc7", "fc8", "fc9", "fc10", "fc11")}
_AUG_BN = {"bnz": "bnz", "bn_mu": "batch_fc_mu",
           **{f"bn{i}": f"batch_fc{i}" for i in range(1, 11)}}


def _load_torch(path: str) -> dict:
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


_WRAPPER_SEGMENTS = frozenset(
    {"module", "_fsdp_wrapped_module", "_orig_mod", "_checkpoint_wrapped_module"})


def _strip_prefixes(sd: dict) -> dict:
    """Drop wrapper name segments (DDP ``module``, FSDP
    ``_fsdp_wrapped_module``, compile ``_orig_mod``) so names match the
    bare model.  Whole dotted segments only — a layer whose own name
    merely contains one of these as a substring is untouched."""
    return {".".join(seg for seg in k.split(".")
                     if seg not in _WRAPPER_SEGMENTS): v
            for k, v in sd.items()}


def _linear(sd: dict, key: str):
    """(weight, bias|None) with any pruning reparameterization folded."""
    if f"{key}.weight" in sd:
        w = _np(sd[f"{key}.weight"])
    else:  # torch.nn.utils.prune: weight = weight_orig * weight_mask
        w = _np(sd[f"{key}.weight_orig"]) * _np(sd[f"{key}.weight_mask"])
    b = sd.get(f"{key}.bias")
    if b is None and f"{key}.bias_orig" in sd:
        b = _np(sd[f"{key}.bias_orig"]) * _np(sd[f"{key}.bias_mask"])
    return w, (None if b is None else _np(b))


# ---------------------------------------------------------------------------
# mixVAE trainer checkpoints
# ---------------------------------------------------------------------------

def mixvae_from_state_dict(sd: dict):
    """(params, bn, mask, inferred-hparams dict) from a reference
    ``model_state_dict``."""
    sd = _strip_prefixes(sd)
    n_arm = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("fc1."))
    names = ["fc1", "fc2", "fc3", "fc4", "fc5", "fcc", "fc_mu", "fc_sigma",
             "fc6", "fc7", "fc8", "fc9", "fc10", "fc11"]
    zinb = "fc11_p.0.weight" in sd or "fc11_p.0.weight_orig" in sd
    if zinb:
        names += ["fc11_p", "fc11_r"]
    params = {}
    for name in names:
        ws, bs = [], []
        for a in range(n_arm):
            w, b = _linear(sd, f"{name}.{a}")
            ws.append(w.T)          # torch (out, in) → ours (in, out)
            bs.append(b)
        params[name] = {"w": np.stack(ws), "b": np.stack(bs)}
    bn = {}
    for ours, ref in _MIXVAE_BN.items():
        bn[ours] = {
            "mean": np.stack([_np(sd[f"{ref}.{a}.running_mean"])
                              for a in range(n_arm)]),
            "var": np.stack([_np(sd[f"{ref}.{a}.running_var"])
                             for a in range(n_arm)]),
        }
    C = params["fcc"]["w"].shape[-1]
    if "fcc.0.weight_mask" in sd:
        # category c is pruned when its fcc output row is fully masked
        row_mask = _np(sd["fcc.0.weight_mask"])          # (C, L)
        mask = (np.abs(row_mask).sum(axis=1) > 0).astype(np.float32)
    else:
        mask = np.ones((C,), np.float32)
    D, F = params["fc1"]["w"].shape[1:]
    L = params["fc5"]["w"].shape[-1]
    S = params["fc_mu"]["w"].shape[-1]
    inferred = dict(n_arm=n_arm, input_dim=D, fc_dim=F, lowD_dim=L,
                    n_categories=C, state_dim=S,
                    mode="ZINB" if zinb else "MSE")
    return params, bn, mask, inferred


def _adam_state_from_torch(opt_sd: dict, params: dict, lr: float,
                           sd_keys):
    """optax ``adam(lr)`` state with torch Adam moments copied in.

    Torch indexes parameters by position in ``model.parameters()`` order.
    Rather than assuming a layer order, the slot list is derived from the
    ``model_state_dict`` key iteration order (``sd_keys``) — torch state
    dicts preserve module registration order, and registration order IS
    ``parameters()`` order for the Linear weights/biases (the batch-norms
    are affine=False and contribute only buffers, which are filtered
    out).  This keeps same-shaped layer pairs (fc2/fc3/fc4, fc_mu/
    fc_sigma, fc11_p/fc11_r) correctly matched even though a shape check
    could not tell them apart.  Returns None when the mapping fails (e.g.
    a pruned checkpoint whose reparameterized params double up).
    """
    import optax

    slots = []          # (name, "w"|"b", arm) in torch parameters() order
    for k in sd_keys:
        parts = k.split(".")
        if len(parts) != 3 or parts[0] not in params:
            continue    # buffers (batch_l*, num_batches_tracked), extras
        name, arm, kind = parts[0], int(parts[1]), parts[2]
        if kind in ("weight", "weight_orig"):
            slots.append((name, "w", arm))
        elif kind in ("bias", "bias_orig"):
            slots.append((name, "b", arm))
        elif kind.endswith("_mask"):
            return None  # pruning reparam present: parameters() order
            #              differs from the folded view — skip moments
    state = opt_sd.get("state", {})
    if len(state) != len(slots):
        return None
    mu = {n: {"w": np.zeros_like(params[n]["w"]),
              "b": None if params[n]["b"] is None
              else np.zeros_like(params[n]["b"])} for n in params}
    nu = {n: {"w": np.zeros_like(params[n]["w"]),
              "b": None if params[n]["b"] is None
              else np.zeros_like(params[n]["b"])} for n in params}
    count = 0
    for idx, (name, kind, a) in enumerate(slots):
        s = state.get(idx)
        if s is None or "exp_avg" not in s:
            return None
        m, v = _np(s["exp_avg"]), _np(s["exp_avg_sq"])
        if kind == "w":
            m, v = m.T, v.T
        if m.shape != params[name][kind][a].shape:
            return None
        mu[name][kind][a] = m
        nu[name][kind][a] = v
        count = max(count, int(_np(s["step"])))
    opt_state = optax.adam(lr).init(params)
    adam = opt_state[0]._replace(
        count=np.asarray(count, np.int32), mu=mu, nu=nu)
    return (adam,) + tuple(opt_state[1:])


def import_mixvae_checkpoint(path: str, out_path: Optional[str] = None,
                             import_optimizer: bool = True,
                             ckpt: Optional[dict] = None) -> str:
    """Convert a reference trainer ``.pth`` to a dvae_tpu ``.ckpt`` that
    ``CplMixVAE.load_model`` (and ``init_model(trained_model=…)``) accepts.
    ``ckpt`` may pass the already-deserialized dict (the CLI auto-detect
    loads it once for both kind detection and conversion).  Returns the
    written path."""
    import optax

    ckpt = _load_torch(path) if ckpt is None else ckpt
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    params, bn, mask, inferred = mixvae_from_state_dict(sd)
    lr = 1e-3
    opt_sd = ckpt.get("optimizer_state_dict")
    if opt_sd and opt_sd.get("param_groups"):
        lr = float(opt_sd["param_groups"][0].get("lr", lr))
    opt_state = None
    if import_optimizer and opt_sd:
        opt_state = _adam_state_from_torch(
            opt_sd, params, lr, list(_strip_prefixes(sd)))
    moments_imported = opt_state is not None
    if opt_state is None:
        if import_optimizer and opt_sd:
            print("WARNING: could not map the torch Adam moments onto the "
                  "stacked-arm layout (pruned-checkpoint reparametrization, "
                  "slot-count or shape mismatch) — resuming with a FRESH "
                  "optimizer state; loss may transiently spike.")
        opt_state = optax.adam(lr).init(params)
    out_path = out_path or os.path.splitext(path)[0] + ".ckpt"
    inferred["lr"] = lr
    return save_checkpoint(
        out_path,
        {"params": params, "bn": bn, "opt_state": opt_state, "mask": mask},
        {"epoch": parse_epoch(path), "cfg": inferred,
         "moments_imported": moments_imported,
         "imported_from": os.path.abspath(path)})


# ---------------------------------------------------------------------------
# Augmenter checkpoints
# ---------------------------------------------------------------------------

def augmenter_from_checkpoint(ckpt: dict):
    """(params, bn, AugmenterConfig) from a reference augmenter checkpoint
    dict (``netA`` state dict + ``parameters``)."""
    from dvae_tpu.augment.augmenter import AugmenterConfig

    p = ckpt["parameters"]
    sd = _strip_prefixes(ckpt["netA"])

    def has(ref):
        return f"{ref}.weight" in sd or f"{ref}.weight_orig" in sd

    # layout detection: the generic Augmenter (udagan.py:16-118 /
    # networks.py — the class dist/train_agumenter.py builds) carries BOTH
    # a plain fc5 and a noise-concat fc5n; Augmenter_smartseq has one fc5
    # that already takes the noise concat.  Mapping the generic fc5 into
    # our noise slot would produce a checkpoint that crashes on first use.
    generic = has("fc5n")
    lin_map = dict(_AUG_LINEAR)
    bn_map = dict(_AUG_BN)
    if generic:
        lin_map["fc5"] = "fc5n"          # our noise-concat branch
        lin_map["fc5_plain"] = "fc5"     # the deterministic branch
        bn_map["bn5"] = "batch_fc5n"
        bn_map["bn5_plain"] = "batch_fc5"
    n_zim = int(p.get("n_zim", 2 if has("fc11_p") else 1))
    # infer n_dim from the weights when present (generic default is 100,
    # smartseq 500 — trusting a default would mis-shape the other family)
    if has("fc4"):
        n_dim = int(_np(sd["fc4.weight" if "fc4.weight" in sd
                           else "fc4.weight_orig"]).shape[0])
    else:
        n_dim = int(p.get("n_dim", 500))
    cfg = AugmenterConfig(
        noise_dim=int(p["num_n"]), latent_dim=int(p["num_z"]),
        input_dim=int(p["n_features"]),
        n_dim=n_dim,
        p_drop=float(p.get("p_drop", 0.2 if generic else 0.5)),
        n_zim=n_zim,
        variant="generic" if generic else "smartseq")

    params = {}
    for ours, ref in lin_map.items():
        if not has(ref):
            continue
        w, b = _linear(sd, ref)
        params[ours] = {"w": w.T, "b": b}
    if has("fc11_p"):
        w, b = _linear(sd, "fc11_p")
        params["fc11_p"] = {"w": w.T, "b": b}
    bn = {}
    for ours, ref in bn_map.items():
        if f"{ref}.running_mean" not in sd:
            continue
        st = {"mean": _np(sd[f"{ref}.running_mean"]),
              "var": _np(sd[f"{ref}.running_var"])}
        if f"{ref}.weight" in sd:       # bnz is affine=True (udagan.py:29)
            st["scale"] = _np(sd[f"{ref}.weight"])
            st["bias"] = _np(sd[f"{ref}.bias"])
        bn[ours] = st
    return params, bn, cfg


def import_augmenter_checkpoint(path: str,
                                out_path: Optional[str] = None,
                                ckpt: Optional[dict] = None) -> str:
    """Convert a reference augmenter ``.pth`` (the ``aug_model`` entry of
    mmidas.toml) to the dvae_tpu augmenter checkpoint format consumed by
    ``CplMixVAE(aug_file=…)``.  Returns the written path."""
    from dvae_tpu.augment.augmenter import save_augmenter

    ckpt = _load_torch(path) if ckpt is None else ckpt
    params, bn, cfg = augmenter_from_checkpoint(ckpt)
    out_path = out_path or os.path.splitext(path)[0] + ".ckpt"
    return save_augmenter(out_path, params, bn, cfg,
                          {"imported_from": os.path.abspath(path)})
