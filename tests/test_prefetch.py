"""Prefetcher: ordering, re-iteration, error propagation."""

import time

import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.data.prefetch import (
    Prefetcher,
)


def test_prefetcher_preserves_order():
    items = list(range(20))
    assert list(Prefetcher(items, depth=3)) == items


def test_prefetcher_reiterable():
    p = Prefetcher([1, 2, 3])
    assert list(p) == [1, 2, 3]
    assert list(p) == [1, 2, 3]


def test_prefetcher_overlaps_production():
    def slow_gen():
        for i in range(4):
            time.sleep(0.05)
            yield i

    class G:
        def __iter__(self):
            return slow_gen()

    # timing-based: retry under transient host load before failing
    for attempt in range(3):
        t0 = time.perf_counter()
        out = []
        for x in Prefetcher(G(), depth=2):
            time.sleep(0.05)  # consumer work overlaps producer work
            out.append(x)
        elapsed = time.perf_counter() - t0
        assert out == [0, 1, 2, 3]
        if elapsed < 0.37:  # serial would be ~0.4s+
            break
    else:
        raise AssertionError(
            f"no overlap observed in 3 attempts (last {elapsed:.3f}s)"
        )

def test_prefetcher_propagates_errors():
    def bad():
        yield 1
        raise RuntimeError("boom")

    class G:
        def __iter__(self):
            return bad()

    with pytest.raises(RuntimeError, match="boom"):
        list(Prefetcher(G()))
