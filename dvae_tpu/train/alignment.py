"""Cross-arm category alignment (TPU-build extension; off by default).

The coupling loss (models/losses.coupling_distance — reference
mmidas/nn_model.py:557-569) is a per-category L2 between arms'
categorical posteriors, so *consensus* requires every arm to use the
same category INDEX for the same cluster.  Gradient descent does align
arms eventually, but the index-matching part of that convergence is a
permutation search done by SGD: on hard data the arms each recover the
structure (pairwise-label AMI plateaus) tens of thousands of epochs
before they agree on a labeling of it (the round-4 hard-mode A=5 study:
per-arm AMI 0.71 at 30k epochs, consensus 0.034 — the easy-mode flagship
needed 408k epochs for consensus 0.756).

This module closes that gap with an exact discrete move the optimizer
cannot make: Hungarian-match every arm's labels to a reference arm's and
apply the matched permutation to the (few) parameter tensors indexed by
the category axis.  The permutation is *loss-neutral per arm* — each
arm's reconstruction, KL, and entropy terms are exactly invariant (its
categories are only renamed) — while the cross-arm coupling term drops
to its aligned value instantly.  Adam's first/second moments are
permuted identically so optimization resumes as if the arm had always
used the new labeling.

Category-indexed tensors (models/mixvae._arm_shapes):

  * ``fcc``      (L, C)   — logits head: weight columns + bias
  * ``fc_mu``    (L+C, S) — state head: input rows L..L+C (y = [x_low, c])
  * ``fc_sigma`` (L+C, S) — same rows
  * ``fc6``      (C+S, L) — decoder input rows 0..C (z = [c_smp, s])

Batch-norm carries no category axis.  Under a partially pruned mask
(the (C,) mask is shared across arms) the Hungarian match is restricted
to the ACTIVE category set — each arm's permutation maps active→active
and fixes every pruned index, so the shared mask is exactly invariant
and per-arm semantics (pruned categories stay -inf in every arm) are
preserved.  This matters during the pruning phase itself: the prune
criterion is per-category CROSS-ARM agreement
(train/cpl_mixvae.per_category_agreement), which conflates "bad
category" with "index not yet aligned across arms" — aligning first
makes the criterion measure what it means.  Not applicable under
``ref_prior`` (category indices are pinned by the external prior
table); the trainer gates on it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "match_to_reference",
    "permute_categories",
    "permute_opt_state",
    "align_state",
]


def match_to_reference(labels: np.ndarray, K: int, ref_arm: int = 0,
                       active: np.ndarray | None = None) -> np.ndarray:
    """(A, K) relabeling table ``m`` with ``m[a, old] = new``.

    For each arm, Hungarian-matches its label histogram against
    ``ref_arm``'s (maximum-agreement assignment on the (K, K) confusion
    matrix); the reference arm maps to identity.  ``labels``: (A, N)
    ints in [0, K).

    ``active``: optional (K,) boolean keep-mask (a pruned-category mask).
    When given, matching runs on the active×active confusion submatrix
    and every pruned index maps to itself — the returned permutations
    fix the mask's partition exactly (an unrestricted match could send
    an empty active row to a pruned column, silently un-pruning it).
    """
    from scipy.optimize import linear_sum_assignment

    labels = np.asarray(labels)
    A = labels.shape[0]
    ref = labels[ref_arm]
    m = np.tile(np.arange(K), (A, 1))
    act = None if active is None else np.flatnonzero(np.asarray(active))
    for a in range(A):
        if a == ref_arm:
            continue
        conf = np.zeros((K, K), np.int64)
        np.add.at(conf, (labels[a], ref), 1)
        if act is None:
            rows, cols = linear_sum_assignment(-conf)
            m[a, rows] = cols
        else:
            rows, cols = linear_sum_assignment(-conf[np.ix_(act, act)])
            m[a, act[rows]] = act[cols]
    return m


def _inv(m: np.ndarray) -> np.ndarray:
    """Row-wise inverse permutation: ``inv[a, new] = old``."""
    return np.argsort(m, axis=1)


def _like(new: jax.Array, old) -> jax.Array:
    """Pin the permuted leaf back onto the original leaf's sharding —
    a gather's output placement is the partitioner's choice otherwise.
    Restores memory_kind too (host-offloaded Adam state stays offloaded)."""
    if isinstance(old, jax.Array) and hasattr(old, "sharding"):
        return jax.device_put(new, old.sharding)
    return new


def _gatherable(x):
    """Stage a host-offloaded leaf (``memory_kind='pinned_host'``, the
    CPU-offload opt-state placement) into device memory for the gather —
    XLA's gather requires all operands in one memory space.  ``_like``
    pins the result back to the original (host) sharding afterwards."""
    try:
        sh = x.sharding
        if sh.memory_kind not in (None, "device"):
            return jax.device_put(x, sh.with_memory_kind("device"))
    except AttributeError:
        pass
    return x


def permute_categories(params, m: np.ndarray, cfg) -> dict:
    """Apply per-arm category relabeling ``m`` to a stacked-arm param
    pytree (params, or an Adam moment tree of the same structure).

    With ``inv = argsort(m)``, new slot ``j`` takes old slot ``inv[j]``,
    so post-permutation argmax labels satisfy ``new = m[a, old]`` and
    every per-arm output is exactly invariant (categories renamed only).
    """
    L, C, S = cfg.lowD_dim, cfg.n_categories, cfg.state_dim
    A = cfg.n_arm
    inv = jnp.asarray(_inv(np.asarray(m)))            # (A, C)
    out = {k: dict(v) for k, v in params.items()}

    fcc = out["fcc"]
    fcc["w"] = _like(jnp.take_along_axis(
        _gatherable(fcc["w"]), inv[:, None, :], axis=2), fcc["w"])
    fcc["b"] = _like(jnp.take_along_axis(_gatherable(fcc["b"]), inv, axis=1),
                     fcc["b"])

    head_rows = jnp.concatenate(
        [jnp.tile(jnp.arange(L), (A, 1)), L + inv], axis=1)      # (A, L+C)
    for name in ("fc_mu", "fc_sigma"):
        d = out[name]
        d["w"] = _like(jnp.take_along_axis(
            _gatherable(d["w"]), head_rows[:, :, None], axis=1), d["w"])

    dec_rows = jnp.concatenate(
        [inv, C + jnp.tile(jnp.arange(S), (A, 1))], axis=1)      # (A, C+S)
    fc6 = out["fc6"]
    fc6["w"] = _like(jnp.take_along_axis(
        _gatherable(fc6["w"]), dec_rows[:, :, None], axis=1), fc6["w"])
    return out


def permute_opt_state(opt_state, m: np.ndarray, cfg):
    """Permute the Adam moments inside an optax state the same way the
    params were — the moment entries for a category must follow it.
    Handles adam/adamw (any chain containing ScaleByAdamState); states
    without per-param leaves pass through untouched.
    """
    import optax

    def fix(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(mu=permute_categories(s.mu, m, cfg),
                              nu=permute_categories(s.nu, m, cfg))
        return s

    return jax.tree_util.tree_map(
        fix, opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState))


def moved_counts(m: np.ndarray, labels: np.ndarray) -> Tuple[int, int]:
    """(total, active) remapped-index counts for relabeling ``m``.

    ``active`` counts only categories that have ≥1 cell assigned in the
    arm whose index moved — the number that matters: a Hungarian row for
    an unused category is a near-tie, and its index shuffles freely from
    one alignment to the next without touching any cell's label.
    """
    K = m.shape[1]
    changed = m != np.arange(K)
    support = np.stack([np.bincount(lab, minlength=K) > 0
                        for lab in np.asarray(labels)])
    return int(changed.sum()), int((changed & support).sum())


def align_state(state, labels: np.ndarray, cfg, ref_arm: int = 0,
                mask: np.ndarray | None = None
                ) -> Tuple[object, np.ndarray, int]:
    """Hungarian-align every arm to ``ref_arm`` and permute params +
    Adam moments.  Returns ``(new_state, m, moved)`` where ``moved`` is
    the total number of categories whose index changed (0 = already
    aligned, state returned unchanged).

    ``mask``: optional (C,) pruning keep-mask.  Matching is restricted
    to active categories (pruned indices are fixed points), so the
    shared mask needs no update — it is invariant under ``m``.
    """
    K = cfg.n_categories
    active = None
    if mask is not None:
        mask = np.asarray(mask)
        if not bool(np.all(mask > 0)):
            active = mask > 0
    m = match_to_reference(labels, K, ref_arm, active=active)
    moved = int((m != np.arange(K)).sum())
    if moved == 0:
        return state, m, 0
    return state._replace(
        params=permute_categories(state.params, m, cfg),
        opt_state=permute_opt_state(state.opt_state, m, cfg)), m, moved
