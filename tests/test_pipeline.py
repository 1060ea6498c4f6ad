"""Host ingest pipeline (threaded prefetch) unit tests."""

import time

import pytest

from tsxcount_tpu.io.pipeline import merged_iter, prefetch


def test_merged_iter_single_preserves_order():
    assert list(merged_iter([iter(range(100))], depth=3)) == list(range(100))


def test_merged_iter_multi_yields_everything():
    its = [iter(range(i * 100, i * 100 + 10)) for i in range(4)]
    got = sorted(merged_iter(its, depth=2))
    assert got == sorted(sum([list(range(i * 100, i * 100 + 10))
                              for i in range(4)], []))


def test_merged_iter_propagates_producer_error():
    def boom():
        yield 1
        raise RuntimeError("producer failed")

    with pytest.raises(RuntimeError, match="producer failed"):
        list(merged_iter([boom()], depth=2))


def test_merged_iter_consumer_early_exit_joins_producers():
    def slow():
        for i in range(1000):
            yield i

    gen = merged_iter([slow()], depth=1)
    assert next(gen) == 0
    gen.close()  # must not hang


def test_prefetch_applies_transform_in_order():
    out = list(prefetch(range(20), lambda x: x * 2, depth=2))
    assert out == [x * 2 for x in range(20)]


def test_prefetch_overlaps_producer_with_consumer():
    # producer sleeps 10ms/item, consumer sleeps 10ms/item: overlapped
    # total should be well under the 2x serial time
    n = 12

    def make(x):
        time.sleep(0.01)
        return x

    t0 = time.perf_counter()
    for _ in prefetch(range(n), make, depth=2):
        time.sleep(0.01)
    elapsed = time.perf_counter() - t0
    assert elapsed < 1.8 * n * 0.01
