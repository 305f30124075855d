"""Prefetcher and StepTimer behavior."""
import time

import numpy as np
import pytest

from missm_tpu.utils.prefetch import prefetch
from missm_tpu.utils.profiling import StepTimer


def test_prefetch_order_and_transfer():
    items = list(range(10))
    out = list(prefetch(iter(items), depth=3, transfer=lambda x: x * 2))
    assert out == [x * 2 for x in items]


def test_prefetch_overlaps():
    """Producer sleeping 20ms/item + consumer sleeping 20ms/item should
    overlap to ~n*20ms, not ~n*40ms."""
    def slow_gen():
        for i in range(8):
            time.sleep(0.02)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_gen(), depth=2):
        time.sleep(0.02)
    dt = time.perf_counter() - t0
    assert dt < 8 * 0.04 * 0.85  # clearly better than serial


def test_prefetch_propagates_errors():
    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch(bad_gen()))


def test_step_timer_duty_cycle():
    t = StepTimer()
    for _ in range(3):
        t.input_start()
        time.sleep(0.002)
        t.input_end()
        time.sleep(0.018)
        t.step_end()
    s = t.summary()
    assert s["steps"] == 3
    assert 0.7 < s["duty_cycle"] <= 1.0
