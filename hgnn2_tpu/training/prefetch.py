"""Host-side batch prefetching.

Batch assembly (padding, chi tables) and host->device transfer run on the
host; overlapping them with device steps hides their latency — important
on high-latency device links. prefetch(loader) builds batches in a
background thread, keeping `size` batches in flight.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(iterable: Iterable, size: int = 2) -> Iterator:
    """Yields items of `iterable`, materialized `size` items ahead in a
    background thread. Exceptions re-raise at the consuming site."""
    q: queue.Queue = queue.Queue(maxsize=size)

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate to consumer
            q.put(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
