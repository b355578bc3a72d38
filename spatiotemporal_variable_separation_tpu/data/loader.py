"""Host data pipeline: shuffled batching with parallel background assembly.

TPU-native replacement for the reference's ``torch.utils.data.DataLoader``
with worker processes (``var_sep/main.py:111-114``): ``num_workers`` batches
are assembled concurrently on a thread pool (PIL/numpy release the GIL
during decode/copy) ahead of the training loop while the TPU computes, and
``prefetch_to_device`` keeps N batches in flight on device so host->HBM
transfers overlap with the train step."""

from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

import jax


class Batcher:
    """Iterate (cond, target) minibatches over a map-style dataset.

    ``dataset`` needs ``__len__`` and ``__getitem__ -> tuple of arrays``.
    Batches are stacked numpy arrays.  ``drop_last`` mirrors DataLoader's
    default False only for eval; training drops ragged batches so shapes
    stay static for jit."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 num_workers: int = 0, max_batches: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.num_workers = num_workers
        self.max_batches = max_batches

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            n = n // self.batch_size
        else:
            n = (n + self.batch_size - 1) // self.batch_size
        if self.max_batches is not None:
            n = min(n, self.max_batches)
        return n

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def _assemble(self, batch_idx: np.ndarray):
        items = [self.dataset[int(i)] for i in batch_idx]
        return tuple(np.stack(parts) for parts in zip(*items))

    def __iter__(self) -> Iterator:
        idx = self._indices()
        n = len(self)
        slices = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                  for i in range(n)]
        if self.num_workers <= 0:
            for s in slices:
                yield self._assemble(s)
            return
        # parallel assembly: num_workers batches in flight, order preserved.
        import collections as _collections
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.num_workers) as ex:
            futures = _collections.deque()
            it = iter(slices)
            for s in list(zip(range(self.num_workers + 1), it)):
                futures.append(ex.submit(self._assemble, s[1]))
            for s in it:
                yield futures.popleft().result()
                futures.append(ex.submit(self._assemble, s))
            while futures:
                yield futures.popleft().result()


def background_iter(iterable, size: int) -> Iterator:
    """Drain ``iterable`` on a daemon thread through a bounded queue so up
    to ``size`` items are produced ahead of the consumer.  A producer
    exception is re-raised at the consumer instead of silently ending."""
    q: queue.Queue = queue.Queue(maxsize=max(1, size))
    stop = object()

    def producer():
        try:
            for item in iterable:
                q.put((None, item))
        except BaseException as e:  # noqa: BLE001 — surfaced to consumer
            q.put((e, None))
            return
        q.put((None, stop))

    threading.Thread(target=producer, daemon=True).start()
    while True:
        err, item = q.get()
        if err is not None:
            raise err
        if item is stop:
            return
        yield item


def prefetch_to_device(iterator: Iterator, size: int = 2, sharding=None) -> Iterator:
    """Keep ``size`` batches resident on device ahead of the consumer.

    With ``sharding`` (e.g. a batch NamedSharding over the data mesh axis),
    batches are placed sharded; otherwise on the default device."""
    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
