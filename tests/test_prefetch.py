"""Prefetcher: ordering, exceptions, early-abandonment cleanup."""

import threading
import time

import pytest

from pfann_tpu.data.prefetch import prefetch


def test_order_preserved():
    assert list(prefetch(iter(range(50)))) == list(range(50))


def test_exception_propagates():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_early_break_stops_producer():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    for x in it:
        if x == 3:
            break
    it.close()
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.3)
    assert len(produced) == n  # producer stopped
    assert n < 1000
