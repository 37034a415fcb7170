"""Background prefetching for the data pipeline.

The reference hides wav-loading latency behind 8 DataLoader worker
processes (``adaptive_attack_eval.py:106``, ``num_workers=8``). The
TPU-native equivalent is simpler: the accelerator is driven asynchronously
by one controller, so a single background *thread* that stays ``depth``
batches ahead (loading + collating + optionally ``device_put``) fully
overlaps host IO with device compute — no worker processes, no IPC.

``prefetch(loader, depth)``            — host-side lookahead.
``prefetch_to_device(loader, depth)``  — additionally uploads each batch
    (optionally with a sharding) so the train step never waits on the
    host→HBM copy; jax transfers are async, so queueing the ``device_put``
    from the thread overlaps the DMA with the current step.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_DONE = object()


def _put(queue_, stop, item) -> bool:
    """Bounded put that gives up when the consumer is gone — a plain
    ``put()`` on a full queue would block forever after ``close()``,
    pinning the thread + its pending batches."""
    while not stop.is_set():
        try:
            queue_.put(item, timeout=0.1)
            return True
        except queue.Full:
            continue
    return False


def _iterate_into(queue_, it, stop):
    try:
        for item in it:
            if not _put(queue_, stop, item):
                return
    except BaseException as e:  # surface loader errors in the consumer
        _put(queue_, stop, e)
        return
    finally:
        _put(queue_, stop, _DONE)


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Yield from ``iterable`` with a background thread ``depth`` items
    ahead. Safe for infinite generators; the thread dies with the consumer
    (daemon) or when the iterator is closed/garbage-collected."""
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    t = threading.Thread(target=_iterate_into, args=(q, iter(iterable), stop), daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def prefetch_to_device(iterable: Iterable, depth: int = 2, sharding=None) -> Iterator:
    """``prefetch`` + async ``jax.device_put`` of every array leaf.

    The put is issued from the background thread, so the host→device DMA of
    batch i+1 overlaps the compute of batch i. Pass a ``NamedSharding`` to
    land batches directly in their dp layout.
    """
    import jax
    import numpy as np

    def put(batch):
        def leaf(a):
            if isinstance(a, (np.ndarray, jax.Array)):
                return jax.device_put(a, sharding) if sharding is not None else jax.device_put(a)
            return a

        return jax.tree.map(leaf, batch)

    return prefetch(map(put, iter(iterable)), depth=depth)
