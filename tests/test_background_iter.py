"""background_iter: ordering and producer-exception propagation."""

import pytest

from spatiotemporal_variable_separation_tpu.data.loader import background_iter


def test_preserves_order():
    out = list(background_iter(iter(range(100)), size=4))
    assert out == list(range(100))


def test_propagates_producer_exception():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("producer failed")

    it = background_iter(gen(), size=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)


def test_empty_iterable():
    assert list(background_iter(iter([]), size=2)) == []
