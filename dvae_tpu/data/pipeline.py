"""Batching pipeline: stratified splits + device-resident epoch batching.

Equivalent capability to the reference ``get_loaders``
(mmidas/utils/dataloader.py:86-168) — stratified train/test split, shuffled
fixed-size train batches with drop_last, B=1 test loader, whole-data loader,
and per-process data sharding (the reference's ``DistributedSampler``) —
re-designed TPU-first:

  * The production path keeps the **whole dataset resident in HBM** and
    builds each epoch's batches with an on-device ``jax.random.permutation``
    + gather *inside the jitted multi-epoch scan* (see dvae_tpu/train).  At
    the reference's production shape (N≈20k cells × D≈5k genes ≈ 400 MB
    fp32, B=5000 → 3–4 steps/epoch, E up to 500k epochs) the host dataloader
    round-trip *is* the bottleneck; on-device batching makes an epoch cost
    zero host work.
  * Host-side iterators (``BatchIterator``) with identical semantics are
    kept for datasets that don't fit HBM and for parity tests.
  * Multi-host: each process owns an equal slice (``shard_for_process``),
    the analogue of ``DistributedSampler(rank, num_replicas)``
    (dataloader.py:117-122); global arrays form via
    ``jax.make_array_from_process_local_data``.

The reference's per-label split calls ``train_test_split`` on the *full*
dataset and then indexes the label's positions with those global indices
(dataloader.py:96-108) — an out-of-bounds bug for any label smaller than the
dataset.  We implement the evident intent: an independent shuffled split
*within* each label's indices.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Splits
# ---------------------------------------------------------------------------

def train_test_split_indices(n: int, train_size: float, seed: Optional[int]):
    """Uniform shuffled split of ``range(n)`` (reference ``data_gen``,
    dataloader.py:73-83)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_train = int(train_size * n) if isinstance(train_size, float) else train_size
    return np.sort(perm[:n_train]), np.sort(perm[n_train:])


def stratified_split_indices(labels: np.ndarray, train_size: float,
                             seed: Optional[int]):
    """Per-label stratified split (intent of dataloader.py:96-108)."""
    rng = np.random.default_rng(seed)
    train_ind, test_ind = [], []
    for ll in np.unique(labels):
        idx = np.where(labels == ll)[0]
        perm = rng.permutation(len(idx))
        k = int(train_size * len(idx))
        train_ind.append(idx[perm[:k]])
        test_ind.append(idx[perm[k:]])
    return np.concatenate(train_ind), np.concatenate(test_ind)


def shard_for_process(indices: np.ndarray, process_index: int,
                      process_count: int, *, even: bool = True) -> np.ndarray:
    """This process's slice of a global index set.

    ``even=True`` pads by wrapping (DistributedSampler semantics: every rank
    sees the same number of samples, padding with repeats)."""
    if process_count <= 1:
        return indices
    n = len(indices)
    if even:
        per = -(-n // process_count)  # ceil
        # wrap-pad (np.resize repeats cyclically): indices[:pad] underfills
        # when the pad exceeds n, leaving ranks with unequal batch counts —
        # an SPMD deadlock at the next collective
        padded = np.resize(indices, per * process_count)
        return padded[process_index::process_count]
    return indices[process_index::process_count]


# ---------------------------------------------------------------------------
# Host-side iterators (parity with the torch DataLoader surface)
# ---------------------------------------------------------------------------

@dataclass
class BatchIterator:
    """Shuffling batch iterator over (x, index) pairs.

    Mirrors the reference train loader (B=5000, shuffle, drop_last,
    dataloader.py:123-132); with ``batch_size=1, shuffle=False, drop_last=
    False`` it is the test loader (:143-152); with ``shuffle=False`` over all
    rows it is the all-data loader (:155-168).
    """

    x: np.ndarray            # (N, D) float32
    indices: np.ndarray      # (N,) global sample indices (ride along for
                             # ref-prior gathers, reference cpl_mixvae.py:427-432)
    batch_size: int
    shuffle: bool = True
    drop_last: bool = True
    seed: int = 0

    def __post_init__(self):
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reference ``sampler.set_epoch`` (fsdp_tutorial.py:225)."""
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.indices)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                (self.seed, self._epoch)).permutation(n)
            self._epoch += 1
        nb = len(self)
        for i in range(nb):
            sel = order[i * self.batch_size: (i + 1) * self.batch_size]
            yield self.x[sel], self.indices[sel]


def get_loaders(
    dataset: np.ndarray,
    label: np.ndarray | list = (),
    seed: Optional[int] = None,
    batch_size: int = 128,
    train_size: float = 0.9,
    use_dist_sampler: bool = False,
    world_size: int = 1,
    rank: int = 0,
):
    """Reference-parity loader factory (dataloader.py:86-168).

    Returns (train_loader, test_loader, alldata_loader) as ``BatchIterator``s
    yielding numpy (x, index) pairs: train = stratified shuffled drop_last
    batches; test = B=1 sequential; all-data = sequential full pass.
    """
    dataset = np.asarray(dataset, dtype=np.float32)
    n = dataset.shape[0]
    if len(label) > 0:
        train_ind, test_ind = stratified_split_indices(
            np.asarray(label), train_size, seed)
    else:
        train_ind, test_ind = train_test_split_indices(n, train_size, seed)

    if use_dist_sampler and world_size > 1:
        train_sel = shard_for_process(train_ind, rank, world_size)
        test_sel = shard_for_process(test_ind, rank, world_size)
    else:
        train_sel, test_sel = train_ind, test_ind

    train = BatchIterator(dataset[train_sel], train_sel, batch_size,
                          shuffle=True, drop_last=True, seed=seed or 0)
    test = BatchIterator(dataset[test_sel], test_sel, 1,
                         shuffle=False, drop_last=False)
    alldata = BatchIterator(dataset, np.arange(n), batch_size,
                            shuffle=False, drop_last=False)
    return train, test, alldata

