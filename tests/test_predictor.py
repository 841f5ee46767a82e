"""Predictor host-side pipelining machinery.

The prefetch worker (`Predictor._prefetched`) overlaps host batch
production with device compute (reference overlaps via DataLoader
workers, ``reference/src/openpifpaf/predictor.py``). The full
prefetched serving path is exercised end-to-end by the predict CLI
tests (`tests/test_clis.py` — prefetch_depth 2 is the default); this
module pins the generator semantics themselves: ordering, laziness
bound, pass-through at depth 0, and exception propagation.
"""

import threading
import time

import pytest

from openpifpaf_tpu.predictor import Predictor


def _bare_predictor(depth):
    pred = Predictor.__new__(Predictor)  # machinery only, no model build
    pred.prefetch_depth = depth
    return pred


def test_prefetch_preserves_order_and_count():
    pred = _bare_predictor(2)
    out = list(pred._prefetched(iter(range(17))))
    assert out == list(range(17))


def test_prefetch_depth0_is_passthrough():
    pred = _bare_predictor(0)
    source = iter(range(3))
    gen = pred._prefetched(source)
    assert next(gen) == 0
    # no worker thread: the remaining items must still be in the source
    assert next(source) == 1


def test_prefetch_runs_ahead_but_bounded():
    produced = []

    def batches():
        for i in range(10):
            produced.append(i)
            yield i

    pred = _bare_predictor(2)
    gen = pred._prefetched(batches())
    first = next(gen)
    assert first == 0
    # give the worker time to run ahead into the queue
    deadline = time.time() + 2.0
    while len(produced) < 3 and time.time() < deadline:
        time.sleep(0.01)
    # it ran ahead of consumption (overlap) ...
    assert len(produced) >= 3
    time.sleep(0.1)
    # ... but is bounded by the queue depth: 1 yielded + 2 queued + 1
    # blocked in put() at most
    assert len(produced) <= 1 + 2 + 1
    assert list(gen) == list(range(1, 10))


def test_prefetch_propagates_producer_exception():
    def batches():
        yield 1
        raise ValueError('boom in producer')

    pred = _bare_predictor(2)
    gen = pred._prefetched(batches())
    assert next(gen) == 1
    with pytest.raises(ValueError, match='boom in producer'):
        list(gen)


def test_prefetch_worker_is_daemon_and_drains():
    n_before = threading.active_count()
    pred = _bare_predictor(2)
    assert list(pred._prefetched(iter(range(50)))) == list(range(50))
    deadline = time.time() + 2.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= n_before
