"""Minimal deterministic data loader with background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(reference: libs/data/dataset.py:1278-1307): per-epoch shuffling comes from
an explicit seeded RNG (identical across hosts), each host reads its own
rank-strided shard, and a thread pool overlaps feature IO with device compute.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class DataLoader:
    """Iterates batches of raw sample dicts (batch assembly is the caller's
    job, mirroring the reference's trivial collator)."""

    def __init__(self, dataset, batch_size, shuffle, seed=2022,
                 drop_last=True, rank=0, world_size=1, num_threads=4,
                 transform=None, shard_within_batch=False):
        """``transform`` (optional) maps the list of raw samples to the
        final batch INSIDE the prefetch thread, overlapping batch assembly
        (padding/copies) with device compute.

        Sharding modes for ``world_size > 1``:
          * default (DistributedSampler-style): each rank iterates its own
            rank-strided subset; ``batch_size`` is PER-RANK and ranks see
            disjoint batches.
          * ``shard_within_batch``: every rank walks the SAME globally
            ordered batches of ``batch_size`` (the global batch) and loads
            only its contiguous block of each -- the host-local piece of a
            global device array sharded on axis 0 (assembled with
            jax.make_array_from_process_local_data in parallel/mesh.py).
            Loss-identical to the single-process run by construction.
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.rank = rank
        self.world_size = world_size
        self.num_threads = max(1, num_threads)
        self.transform = transform
        self.shard_within_batch = shard_within_batch
        if shard_within_batch:
            assert batch_size % world_size == 0, (
                f"global batch {batch_size} not divisible by "
                f"{world_size} processes")
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch
        self.dataset.set_epoch(epoch)

    def _epoch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.world_size > 1 and not self.shard_within_batch:
            # rank-strided shard, equal-size with drop_last semantics
            per = n // self.world_size if self.drop_last else -(-n // self.world_size)
            idx = idx[self.rank::self.world_size][:per]
        return idx

    def __len__(self):
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        idx = self._epoch_indices()
        n_batches = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_batches)]
        if self.shard_within_batch and self.world_size > 1:
            per = self.batch_size // self.world_size
            batches = [b[self.rank * per:(self.rank + 1) * per]
                       for b in batches]

        def build(b):
            samples = [self.dataset[int(i)] for i in b]
            return self.transform(samples) if self.transform else samples

        if self.num_threads <= 1:
            for b in batches:
                yield build(b)
            return

        q = queue.Queue(maxsize=2)

        def worker():
            for b in batches:
                q.put(build(b))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
