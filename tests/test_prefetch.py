"""Tests for background host->device batch prefetching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blp_tpu.data import prefetch


def test_prefetch_yields_all_batches_in_order_on_device():
    batches = [{"x": np.full((4,), i, np.float32)} for i in range(7)]
    out = list(prefetch.prefetch_to_device(iter(batches), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((4,), i))


def test_prefetch_custom_placement():
    seen = []

    def place(b):
        seen.append(b)
        return jnp.asarray(b) * 2

    out = list(prefetch.prefetch_to_device(
        (np.float32(i) for i in range(3)), placement=place))
    assert [float(x) for x in out] == [0.0, 2.0, 4.0]
    assert len(seen) == 3


def test_prefetch_reraises_producer_exception():
    def gen():
        yield np.zeros(2, np.float32)
        raise RuntimeError("boom")

    it = prefetch.prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_empty_iterable():
    assert list(prefetch.prefetch_to_device(iter([]))) == []
