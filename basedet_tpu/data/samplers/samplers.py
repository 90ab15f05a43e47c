"""Samplers: aspect-ratio grouping, inference sharding, infinite streams.

Capability analogue of /root/reference/basedet/data/samplers/
(AspectRatioGroupSampler: group_sampler.py:60, InferenceSampler:
inference_sampler.py:7-36). On TPU, "rank" sharding maps to per-host data
sharding (each host feeds its local devices a slice of the global batch).
"""
from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


class AspectRatioGroupSampler:
    """Batch indices grouped by aspect-ratio bucket (h/w >= 1 vs < 1) so
    padded batches waste less (reference group_sampler.py:60)."""

    def __init__(
        self,
        aspect_ratios: Sequence[float],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
    ):
        self.groups = (np.asarray(aspect_ratios) >= 1.0).astype(np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def __iter__(self) -> Iterator[List[int]]:
        idxs = np.arange(len(self.groups))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idxs)
        self.epoch += 1
        buckets: dict = {0: [], 1: []}
        for i in idxs:
            g = int(self.groups[i])
            buckets[g].append(int(i))
            if len(buckets[g]) == self.batch_size:
                yield buckets[g]
                buckets[g] = []
        leftover = buckets[0] + buckets[1]
        for i in range(0, len(leftover), self.batch_size):
            chunk = leftover[i:i + self.batch_size]
            if len(chunk) == self.batch_size:
                yield chunk

    def __len__(self) -> int:
        return len(self.groups) // self.batch_size


class InferenceSampler:
    """Contiguous shard of the dataset per rank
    (reference inference_sampler.py:15-28)."""

    def __init__(self, total: int, rank: int = 0, world_size: int = 1):
        shard = (total + world_size - 1) // world_size
        self.begin = min(rank * shard, total)
        self.end = min(self.begin + shard, total)

    def __iter__(self) -> Iterator[int]:
        return iter(range(self.begin, self.end))

    def __len__(self) -> int:
        return self.end - self.begin
