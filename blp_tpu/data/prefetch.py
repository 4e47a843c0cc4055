"""Background host→device batch prefetching.

The reference overlaps nothing: torch DataLoader workers feed a blocking
loop (reference: train.py:343-350). On TPU the jitted step dispatches
asynchronously, so the only way the input pipeline can stall the device is
the host-side work between dispatches — batch assembly (numpy gathers over
the packed text matrix) and the host→device transfer, which pays a full
round-trip latency on a tunneled chip. This module hides both behind device
compute: a daemon thread assembles and `device_put`s up to `size` batches
ahead while the device is busy with earlier steps.

Measured on the link_prediction driver loop (v5e, B=128 flagship): the
in-line pipeline ran at 1,798 triples/s vs 2,055 for the raw step; see
PERFORMANCE.md for the prefetched number.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax

_END = object()


def prefetch_to_device(
    batches: Iterable,
    *,
    size: int = 2,
    placement: Callable | None = None,
) -> Iterator:
    """Yield device-resident batches, assembled+transferred `size` ahead.

    `batches` is any iterable of host batches (the iterator itself runs on
    the background thread, so per-batch assembly work inside a generator is
    also overlapped). `placement` maps a host batch to device — defaults to
    `jax.device_put` (committed default device); pass e.g.
    `lambda b: train_parallel.shard_batch(b, mesh)` for a sharded layout.

    Exceptions from the producer are re-raised at the consuming `next()`.
    The thread is a daemon and owns no files, so abandoning the iterator
    early (e.g. `stop_after_epochs`) leaks nothing but a bounded queue.
    """
    placement = placement or jax.device_put
    q: queue.Queue = queue.Queue(maxsize=max(1, size))

    def producer():
        try:
            for b in batches:
                q.put(placement(b))
        except BaseException as e:  # surfaced to the consumer
            q.put(_END)
            q.put(e)
            return
        q.put(_END)
        q.put(None)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            err = q.get()
            if err is not None:
                raise err
            return
        yield item
