"""Prefetcher lifecycle: normal exhaustion, error propagation, and —
the preemption-critical case — cooperative shutdown when the consumer
abandons the generator mid-stream (the train loop's mid-epoch SIGTERM
break). An abandoned prefetcher must release its worker threads and
buffered batches instead of leaving daemon threads blocked on q.put
forever."""
import threading
import time

import pytest

from missm_tpu.utils.prefetch import prefetch


def _workers():
    return [t for t in threading.enumerate() if t.name == "missm-prefetch"]


def _wait_no_workers(timeout=10.0):
    deadline = time.time() + timeout
    while _workers() and time.time() < deadline:
        time.sleep(0.02)
    return _workers()


def test_prefetch_normal_exhaustion():
    out = list(prefetch(iter(range(7)), depth=2))
    assert out == list(range(7))
    assert _wait_no_workers() == []


def test_prefetch_error_propagates():
    def gen():
        yield 1
        raise ValueError("boom")

    it = iter(prefetch(gen(), depth=2))
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)
    assert _wait_no_workers() == []


def test_prefetch_abandon_releases_nested_workers():
    """Break after 2 items from a NESTED prefetcher over an infinite
    source (the train loop's exact two-stage pipeline shape): closing
    the outer generator must cascade — both workers exit, nothing stays
    blocked on a full queue holding batches."""
    produced = []

    def infinite():
        i = 0
        while True:
            produced.append(i)
            yield i
            i += 1

    it = iter(prefetch(prefetch(infinite(), depth=2), depth=2,
                       transfer=lambda x: x * 10))
    assert next(it) == 0
    assert next(it) == 10
    assert len(_workers()) == 2
    it.close()  # what CPython refcounting does on a for-loop break
    assert _wait_no_workers() == []
    # bounded readahead, not a runaway producer
    assert len(produced) <= 10


def test_prefetch_transfer_applies_in_worker():
    seen_threads = set()

    def mark(x):
        seen_threads.add(threading.current_thread().name)
        return x + 1

    assert list(prefetch(iter(range(3)), transfer=mark)) == [1, 2, 3]
    assert seen_threads == {"missm-prefetch"}
    assert _wait_no_workers() == []
