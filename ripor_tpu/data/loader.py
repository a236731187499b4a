"""Host-side data loading: background collation + device prefetch.

The reference keeps its accelerators fed with torch DataLoader worker
processes (dataset/dataloader.py:42-185). The TPU-native equivalent is a
thread pool running the (pure-Python) sample+collate path ahead of the
training loop, plus an N-deep device prefetch queue so the host->HBM
transfer of batch t+1 overlaps the device step t (the standard JAX input
pipeline pattern; transfers go through jax.device_put and are async).
"""
from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional



class PrefetchLoader:
    """Wrap a batch iterable with a background producer thread.

    ``batches`` may be any iterable of numpy-batch dicts (e.g. the
    generators from data/collators.py). ``buffer`` batches are collated
    ahead. Exceptions in the producer re-raise in the consumer.
    """

    _DONE = object()

    def __init__(self, batches: Iterable[Dict], buffer: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=buffer)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._produce, args=(iter(batches),), daemon=True)
        self._thread.start()

    def _produce(self, it: Iterator[Dict]) -> None:
        try:
            for b in it:
                self._q.put(b)
        except BaseException as e:  # re-raised on the consumer side
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item


def device_prefetch(batches: Iterable[Dict], size: int = 2,
                    sharding=None) -> Iterator[Dict]:
    """Move batches to device ``size`` steps ahead of consumption so H2D
    transfer overlaps compute. With a NamedSharding, batches land already
    sharded over the mesh (replaces shard_batch-per-step in the loop)."""
    import jax

    def put(b):
        if sharding is None:
            return jax.tree.map(jax.device_put, b)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), b)

    buf: "collections.deque" = collections.deque()
    it = iter(batches)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def epoch_batches(make_epoch: Callable[[int], Iterable[Dict]],
                  num_epochs: int) -> Iterator[Dict]:
    """Chain per-epoch batch iterables (reference epoch loop,
    tasks/trainer.py:582-727)."""
    for e in range(num_epochs):
        yield from make_epoch(e)
