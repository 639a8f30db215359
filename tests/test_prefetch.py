"""Prefetch iterator: ordering, completion, and error propagation."""

import time

import pytest

from singleshotpose_tpu.data.prefetch import prefetch


def test_order_and_completion():
    assert list(prefetch(range(10), depth=3)) == list(range(10))
    assert list(prefetch([], depth=2)) == []


def test_tuples_pass_through():
    # loader batches are 2-tuples; must not be mistaken for the sentinel
    items = [(i, i * 2) for i in range(5)]
    assert list(prefetch(items)) == items


def test_producer_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    it = prefetch(gen(), depth=1)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_overlap_actually_happens():
    """Producer works ahead while the consumer is slow."""
    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    first = next(it)
    time.sleep(0.05)          # give the producer time to run ahead
    assert first == 0
    assert len(produced) >= 3  # 0 consumed + 2 queued ahead
    assert list(it) == [1, 2, 3]
