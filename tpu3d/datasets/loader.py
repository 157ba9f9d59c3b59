"""Prefetching host-side batch loader (replaces torch DataLoader workers).

Samples are built by a thread pool while the previous batch trains on device;
batches are fixed-shape numpy dicts ready for a single host->device transfer.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class BatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = False, seed: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "epoch"):
            self.dataset.epoch = epoch

    def _batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        if self.drop_last:
            order = order[: (n // self.batch_size) * self.batch_size]
        for i in range(0, len(order), self.batch_size):
            idx = order[i: i + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                break
            # pad the final short batch by repeating (fixed device shapes);
            # callers can mask via 'batch_valid'
            valid = np.ones(self.batch_size, dtype=bool)
            if len(idx) < self.batch_size:
                valid[len(idx):] = False
                idx = np.concatenate(
                    [idx, np.full(self.batch_size - len(idx), idx[-1])])
            yield idx, valid

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx, valid in self._batches():
                        samples = list(pool.map(self.dataset.__getitem__, idx))
                        batch = self.dataset.collate_batch(samples)
                        batch["batch_valid"] = valid
                        q.put(batch)
                q.put(sentinel)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
