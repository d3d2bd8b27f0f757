"""Batching + background prefetch for map-style datasets.

Replaces torch ``DataLoader`` + ``DistributedSampler`` + ``collate_fn``
(reference ``main.py:226-239``, ``util/misc.py:295-330``): a thread
prefetches and collates host batches while the accelerator runs the previous
step. Targets are already padded per sample, so collation is a plain stack
(no NestedTensor — shapes are static by construction).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from snipper_tpu.data.snippet import stack_batch


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                idx = self._indices()
                nb = len(self)
                for b in range(nb):
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    if len(sel) < self.batch_size and self.drop_last:
                        break
                    q.put(stack_batch([self.dataset[int(i)] for i in sel]))
            except BaseException as e:  # surface worker errors to consumer
                q.put(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
