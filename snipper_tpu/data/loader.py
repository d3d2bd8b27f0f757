"""Batching + background prefetch for map-style datasets.

Replaces torch ``DataLoader`` + ``DistributedSampler`` + ``collate_fn``
(reference ``main.py:226-239``, ``util/misc.py:295-330``): a thread
prefetches and collates host batches while the accelerator runs the previous
step. Targets are already padded per sample, so collation is a plain stack
(no NestedTensor — shapes are static by construction).

Multi-host sharding (the ``DistributedSampler`` role, reference
``main.py:229-231``): every process derives the SAME global permutation from
``(seed, epoch)``, pads it by wrap-around to a multiple of
``process_count``, then takes the ``process_index``-strided slice — disjoint,
equal-length per-host index shards whose union covers the dataset.
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
                 prefetch: int = 2, process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 num_workers: int = 0):
        """``batch_size`` is the PER-PROCESS batch; ``process_index`` /
        ``process_count`` default to the jax runtime's values.
        ``num_workers > 0`` decodes the samples of a batch in a thread pool
        (image decode/warp release the GIL) — the torch ``num_workers``
        role without process forking."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.epoch = 0
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        assert 0 <= process_index < process_count
        self.process_index = process_index
        self.process_count = process_count

    def _shard_len(self):
        # padded-by-wraparound shard length (identical on every process)
        n = len(self.dataset)
        return (n + self.process_count - 1) // self.process_count

    def __len__(self):
        n = self._shard_len()
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)  # fresh per-epoch aug streams

    def _indices(self):
        """This process's index shard for the current epoch."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        if self.process_count > 1:
            total = self._shard_len() * self.process_count
            if total > idx.size:  # wrap-around padding, as DistributedSampler
                idx = np.concatenate([idx, idx[: total - idx.size]])
            idx = idx[self.process_index::self.process_count]
        return idx

    def __iter__(self) -> Iterator[Dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        cancelled = threading.Event()  # consumer abandoned the iterator

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone —
            otherwise an early ``break`` mid-epoch (max_steps, preemption)
            leaks this thread blocked on the full queue plus its staged
            batches, every epoch."""
            while not cancelled.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            pool = None
            try:
                if self.num_workers > 0:
                    from concurrent.futures import ThreadPoolExecutor

                    pool = ThreadPoolExecutor(self.num_workers)
                idx = self._indices()
                nb = len(self)
                for b in range(nb):
                    if cancelled.is_set():
                        break
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    if len(sel) < self.batch_size and self.drop_last:
                        break
                    if pool is not None:
                        samples = list(pool.map(
                            self.dataset.__getitem__,
                            [int(i) for i in sel]))
                    else:
                        samples = [self.dataset[int(i)] for i in sel]
                    if not put(stack_batch(samples)):
                        break
            except BaseException as e:  # surface worker errors to consumer
                put(e)
            finally:
                if pool is not None:
                    pool.shutdown(wait=False)
                put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # runs on normal exhaustion AND on GeneratorExit when the
            # consumer breaks early: release the producer
            cancelled.set()


def device_prefetch(iterator: Iterator[Dict], put) -> Iterator[Dict]:
    """Double-buffered host->device feed: keep the NEXT batch's transfer in
    flight while the current step runs (jax transfers are async), so the
    accelerator never waits on PCIe/tunnel latency. ``put`` is e.g.
    ``lambda b: shard_batch(b, mesh)``."""
    pending = None
    for batch in iterator:
        nxt = put(batch)
        if pending is not None:
            yield pending
        pending = nxt
    if pending is not None:
        yield pending
