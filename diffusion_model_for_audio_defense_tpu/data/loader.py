"""Minimal batch loader (replaces torch DataLoader for this framework).

Features actually used by the reference pipelines: shuffling, weighted
sampling (balanced classes), per-process sharding for multi-host data
parallelism (replaces ``DistributedSampler``, SURVEY.md §2.8 P4), custom
collate. Map-style datasets in, stacked numpy batches out.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def default_collate(batch):
    out = {}
    for k in batch[0]:
        vals = [item[k] for item in batch]
        if isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[k] = np.asarray(vals)
        elif isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        collate_fn: Optional[Callable] = None,
        weights: Optional[np.ndarray] = None,
        num_samples: Optional[int] = None,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or default_collate
        self.weights = weights
        self.num_samples = num_samples or len(dataset)
        self.seed = seed
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        rng = np.random.default_rng((self.seed, self.epoch))
        n = len(self.dataset)
        if self.weights is not None:
            p = np.asarray(self.weights, dtype=np.float64)
            idx = rng.choice(n, size=self.num_samples, replace=True, p=p / p.sum())
        elif self.shuffle:
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        # shard across processes (multi-host DP), DistributedSampler-style:
        # pad to ceil(n/world)*world by wrapping (torch DistributedSampler
        # semantics) so every process yields the SAME number of batches —
        # unequal shards would desync collective train steps across hosts
        if self.process_count > 1:
            total = -(-len(idx) // self.process_count) * self.process_count
            if total != len(idx):
                idx = np.concatenate([idx, idx[: total - len(idx)]])
            return idx[self.process_index :: self.process_count]
        return idx

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        idx = self._indices()
        end = len(idx) - len(idx) % self.batch_size if self.drop_last else len(idx)
        for i in range(0, end, self.batch_size):
            yield self.collate_fn([self.dataset[int(j)] for j in idx[i : i + self.batch_size]])
