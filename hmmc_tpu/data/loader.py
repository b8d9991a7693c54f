"""Batching loader with parallel host decode and device prefetch.

Replaces the reference's torch DataLoader + DistributedSampler stack
(dataloaders/dataloader.py:9-177). Differences by design:

- one GLOBAL loader per job (no per-rank sharding): batches are global
  arrays sharded over the mesh's data axis by the caller;
- decode runs in a thread pool (cv2/PIL release the GIL in the hot parts);
- ``prefetch`` keeps N batches in flight so host decode overlaps device
  compute (double buffering).

Epoch seeding mirrors DistributedSampler.set_epoch: ``shuffle(epoch)``
reshuffles deterministically from (seed, epoch).
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List

import numpy as np


def _stack_samples(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        seed: int = 42,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.default_rng(self.seed + self._epoch)
        return rng.permutation(n)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        n = len(order)
        limit = (n // self.batch_size * self.batch_size
                 if self.drop_last else n)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, limit, self.batch_size)]
        if not batches:
            return iter(())

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(
                        self.dataset.__getitem__, batch_idx.tolist()))
                    out_q.put(_stack_samples(samples))
            except Exception as e:  # surface worker errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()

        def gen():
            try:
                while True:
                    item = out_q.get()
                    if item is None:
                        return
                    if isinstance(item, Exception):
                        raise item
                    yield item
            finally:
                stop.set()
                pool.shutdown(wait=False)

        return gen()


def device_prefetch(iterator, place_fn: Callable, depth: int = 2):
    """Pipelines host->device transfer: keeps `depth` batches resident on
    device ahead of the consumer."""
    buf = collections.deque()
    for batch in iterator:
        buf.append(place_fn(batch))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
