"""Bitonic sorting network == jnp.sort (the chain stage relies on it)."""

import numpy as np
import jax.numpy as jnp
import pytest

from monica_tpu.ops.sortnet import bitonic_sort_rows


@pytest.mark.parametrize("shape", [(1, 1), (4, 8), (7, 64), (33, 512)])
def test_matches_jnp_sort(shape):
    rng = np.random.default_rng(9)
    x = rng.integers(-(2**31), 2**31 - 1, shape).astype(np.int32)
    got = np.asarray(bitonic_sort_rows(jnp.asarray(x)))
    assert np.array_equal(got, np.sort(x, axis=-1))


def test_duplicates_and_sentinels():
    x = np.array([[5, 5, -1, 2**30, 2**30, 5, 0, -7]], np.int32)
    got = np.asarray(bitonic_sort_rows(jnp.asarray(x)))
    assert np.array_equal(got, np.sort(x, axis=-1))


def test_rejects_non_power_of_two():
    with pytest.raises(AssertionError):
        bitonic_sort_rows(jnp.zeros((2, 12), jnp.int32))
