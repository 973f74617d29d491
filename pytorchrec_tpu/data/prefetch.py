"""Device prefetch: overlap host-side batch slicing with device compute.

The reference overlaps input with compute via DataLoader worker processes
(model/IModel.py:183-187). TPU-first equivalent: a small lookahead thread
slices the next batches and enqueues ``jax.device_put`` while the current
step runs — JAX dispatch is async, so the transfer rides alongside compute
without worker processes or pickling.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax

_SENTINEL = object()


def prefetch(
    iterator: Iterator[Any],
    size: int = 2,
    transform: Optional[Callable[[Any], Any]] = None,
) -> Iterator[Any]:
    """Lookahead-prefetch an iterator via a daemon thread.

    ``transform`` (e.g. a sharded ``device_put``) runs inside the prefetch
    thread so transfers start before the consumer asks.
    """
    if size <= 0:
        yield from iterator
        return

    buffer: "queue.Queue[Any]" = queue.Queue(maxsize=size)
    error: list = []

    def producer():
        try:
            for item in iterator:
                buffer.put(transform(item) if transform is not None else item)
        except BaseException as e:  # surfaced on the consumer side
            error.append(e)
        finally:
            buffer.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = buffer.get()
        if item is _SENTINEL:
            if error:
                raise error[0]
            return
        yield item


def device_put_prefetch(iterator: Iterator[Any], sharding=None, size: int = 2) -> Iterator[Any]:
    """Prefetch + start the host->device transfer in the lookahead thread."""

    def put(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), batch)

    return prefetch(iterator, size=size, transform=put)
