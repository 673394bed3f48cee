"""Background-thread batch prefetcher.

The reference keeps the accelerator fed with 4 DataLoader worker
processes (train.py:271); here the heavy augmentation runs on device, so
a single producer thread assembling host windows one batch ahead is
enough to hide memmap I/O behind device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_END = object()


def prefetch(it: Iterable, depth: int = 2) -> Iterator:
    """Iterate ``it`` on a daemon thread, buffering up to ``depth`` items.
    Exceptions propagate to the consumer; abandoning the iterator (break /
    GC) stops the producer instead of leaving it running into interpreter
    shutdown."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raise in consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drain so a blocked producer can observe the stop flag and exit
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=5)
