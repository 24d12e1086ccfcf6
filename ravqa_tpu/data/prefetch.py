"""Background-thread input prefetching (host/device overlap).

TPU-native replacement for the reference's torch DataLoader worker
processes (/root/reference/src/data_ops/common_data_opts.py:152-199
``num_workers`` + pin_memory prefetching): host batch assembly
(tokenization, negative sampling, collate) runs in a daemon thread a
bounded number of batches ahead of the consumer, and — optionally — each
finished batch is pushed to device from the producer thread so the
host->HBM transfer overlaps the previous step's compute (``jax.device_put``
is asynchronous; dispatching it early is what hides the PCIe/ICI copy).

One thread suffices where torch needed worker *processes*: the heavy host
work (C++ WordPiece tokenization via ctypes, numpy collate) releases the
GIL, and the TPU step itself runs device-side while Python assembles the
next batch.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_SENTINEL = object()


def prefetch(batches: Iterable, size: int = 2,
             transform: Optional[Callable] = None) -> Iterator:
    """Iterate `batches` on a daemon thread, keeping up to `size` finished
    batches buffered ahead of the consumer. Order-preserving. Exceptions
    raised by the source iterator are re-raised at the consuming site.

    transform: optional callable applied to each batch ON THE PRODUCER
    THREAD (e.g. a device_put / shard function) so its cost overlaps the
    consumer's compute.
    """
    assert size >= 1
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()

    def stop_aware_put(item) -> bool:
        """put() that gives up when the consumer has gone away — a plain
        blocking put here would park the daemon thread (and the batches it
        holds, device-resident under prefetch_to_device) forever."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for b in batches:
                if transform is not None:
                    b = transform(b)
                if not stop_aware_put(b):
                    return
            stop_aware_put(_SENTINEL)
        except BaseException as e:                     # re-raise downstream
            stop_aware_put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    def consume():
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    return _PrefetchIterator(consume())


class _PrefetchIterator:
    """Iterator wrapper marking prefetch-OWNED streams: consumers that
    finish early (fit() ending at `steps`, early stop) may close() it to
    stop the daemon producer deterministically; generic caller-owned
    generators must NOT be closed by fit (a second fit() on the same
    loader would silently train zero steps)."""

    _ravqa_prefetch_owned = True

    def __init__(self, gen):
        self._gen = gen

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._gen)

    def close(self):
        self._gen.close()


def prefetch_to_device(batches: Iterable, size: int = 2,
                       mesh=None) -> Iterator:
    """prefetch() + early device dispatch: each dict batch's arrays are
    device_put from the producer thread (sharded over `mesh`'s first axis
    when given — executors' shard_batch semantics) so transfers overlap
    the in-flight training step.
    """
    import jax

    if mesh is None:
        def to_dev(b):
            return {k: jax.device_put(v) for k, v in b.items()} \
                if isinstance(b, dict) else jax.device_put(b)
    else:
        from ..parallel import shard_batch

        def to_dev(b):
            return shard_batch(b, mesh)
    return prefetch(batches, size=size, transform=to_dev)
