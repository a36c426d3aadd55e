"""Prefetcher semantics: order, exceptions, early close (VERDICT r3 #3)."""

import time

import pytest

from conformer_tpu.data.prefetch import Prefetcher


def test_prefetch_preserves_order():
    assert list(Prefetcher(range(100), depth=3)) == list(range(100))


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = Prefetcher(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_close_stops_producer():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = Prefetcher(gen(), depth=2)
    assert next(it) == 0
    it.close()
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n, "producer kept running after close()"
    assert n < 10_000


def test_prefetch_overlaps_producer_and_consumer():
    """With a slow producer and slow consumer, total time must approach
    max(producer, consumer), not their sum."""

    def slow_gen():
        for i in range(10):
            time.sleep(0.02)
            yield i

    t0 = time.perf_counter()
    for _ in Prefetcher(slow_gen(), depth=4):
        time.sleep(0.02)
    dt = time.perf_counter() - t0
    # serial would be ~0.4 s; overlapped ~0.22 s
    assert dt < 0.34, dt
