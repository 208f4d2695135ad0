"""Multithreaded batching loader (the torch DataLoader replacement).

Decode/augment runs in a thread pool (PIL/numpy release the GIL for the
heavy parts), batches are stacked numpy dicts, and an optional device
prefetcher overlaps host->HBM transfer with compute. Deterministic:
per-item RNG is derived from (seed, epoch, index) inside the dataset, so
shuffling/workers don't change augmentations (unlike the reference, which
relies on worker-process seeding — trainer.py:78-81).
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Dict, Iterator

import numpy as np


def _stack(items) -> Dict:
    out = {}
    for k in items[0]:
        out[k] = np.stack([it[k] for it in items], axis=0)
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        drop_last: bool = True,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed * 100_003 + self.epoch)
            rng.shuffle(order)
        if self.drop_last:
            order = order[: (n // self.batch_size) * self.batch_size]

        def fetch(idx):
            try:
                return self.dataset.__getitem__(int(idx), epoch=self.epoch)
            except TypeError:
                return self.dataset[int(idx)]

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            batch_idx = [
                order[i : i + self.batch_size]
                for i in range(0, len(order), self.batch_size)
            ]
            # pipeline: keep a couple of batches in flight
            pending = []
            it = iter(batch_idx)
            for _ in range(2):
                try:
                    idxs = next(it)
                    pending.append([pool.submit(fetch, i) for i in idxs])
                except StopIteration:
                    break
            while pending:
                futs = pending.pop(0)
                try:
                    idxs = next(it)
                    pending.append([pool.submit(fetch, i) for i in idxs])
                except StopIteration:
                    pass
                yield _stack([f.result() for f in futs])


def device_prefetch(iterator, mesh=None, size: int = 2):
    """Overlap host->device transfer with compute. If a mesh is given the
    batch is dp-sharded; otherwise placed on the default device."""
    import jax

    if mesh is not None:
        from ..parallel.mesh import shard_batch

        def place(b):
            return shard_batch(
                jax.tree_util.tree_map(jax.numpy.asarray, b), mesh
            )
    else:
        def place(b):
            return jax.tree_util.tree_map(jax.numpy.asarray, b)

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for b in iterator:
                q.put(place(b))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
