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


@pytest.mark.parametrize("group,desc", [(8, True), (8, False), (16, True)])
def test_groupwise_sort(group, desc):
    """Group-wise network == independent per-group sorts (ops.lookup
    compacts 8-slot hash rows with group=8, descending)."""
    rng = np.random.default_rng(11)
    x = rng.integers(0, 2**32, (6, 128), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(bitonic_sort_rows(jnp.asarray(x), group=group, descending=desc))
    ref = np.sort(x.reshape(6, -1, group), axis=-1)
    if desc:
        ref = ref[..., ::-1]
    assert np.array_equal(got, ref.reshape(6, 128))


def test_full_width_descending():
    rng = np.random.default_rng(12)
    x = rng.integers(-(2**31), 2**31 - 1, (5, 64)).astype(np.int32)
    got = np.asarray(bitonic_sort_rows(jnp.asarray(x), descending=True))
    assert np.array_equal(got, np.sort(x, axis=-1)[..., ::-1])
