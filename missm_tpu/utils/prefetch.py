"""Host-side input prefetching.

The reference leans on torch DataLoader workers (and in fact never wires
`num_workers` up — data_loader.py:312 — so it runs single-threaded). Here a
background thread decodes/collates ahead of the device and optionally
performs the host->device transfer, double-buffering so the TPU never waits
on input between steps (the >90% duty-cycle target of BASELINE.md).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class _Sentinel:
    pass


_DONE = _Sentinel()


class Prefetcher:
    """Wraps an iterable; a worker thread stays `depth` batches ahead.
    Exceptions in the worker re-raise at the consuming site."""

    def __init__(self, iterable: Iterable, depth: int = 2,
                 transfer: Optional[Callable] = None):
        self.iterable = iterable
        self.depth = depth
        self.transfer = transfer

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        err = []

        def work():
            try:
                for item in self.iterable:
                    if self.transfer is not None:
                        item = self.transfer(item)
                    q.put(item)
            except BaseException as e:  # noqa: BLE001 - propagate to consumer
                err.append(e)
            finally:
                q.put(_DONE)

        t = threading.Thread(target=work, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _DONE:
                break
            yield item
        t.join()
        if err:
            raise err[0]


def prefetch(iterable: Iterable, depth: int = 2,
             transfer: Optional[Callable] = None) -> Prefetcher:
    return Prefetcher(iterable, depth, transfer)
