# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Unit tests for the packed-word bitstring layer."""

import numpy as np
import pytest

from sqd_tpu.ops import bitpack


@pytest.mark.parametrize("nbits", [1, 7, 8, 31, 32, 33, 63, 64, 65, 100, 128])
def test_pack_unpack_roundtrip(nbits):
    rng = np.random.default_rng(nbits)
    mat = rng.integers(0, 2, size=(17, nbits)).astype(bool)
    packed = bitpack.pack_bool_matrix(mat)
    assert packed.shape == (17, bitpack.num_words(nbits))
    np.testing.assert_array_equal(bitpack.unpack_to_bool_matrix(packed, nbits), mat)


@pytest.mark.parametrize("nbits", [5, 32, 63, 64, 90])
def test_int_roundtrip_matches_binary(nbits):
    rng = np.random.default_rng(nbits)
    mat = rng.integers(0, 2, size=(11, nbits)).astype(bool)
    packed = bitpack.pack_bool_matrix(mat)
    ints = bitpack.unpack_to_ints(packed, nbits)
    expected_dtype_object = nbits >= 64
    assert (ints.dtype == object) == expected_dtype_object
    for row, val in zip(mat, ints):
        expected = int("".join("1" if b else "0" for b in row), 2)
        assert int(val) == expected
    repacked = bitpack.pack_ints(ints, nbits)
    np.testing.assert_array_equal(repacked, packed)


def test_popcount():
    rng = np.random.default_rng(0)
    mat = rng.integers(0, 2, size=(40, 70)).astype(bool)
    packed = bitpack.pack_bool_matrix(mat)
    np.testing.assert_array_equal(bitpack.popcount(packed), mat.sum(axis=1))


def test_sort_unique_searchsorted_multiword():
    rng = np.random.default_rng(1)
    nbits = 70
    mat = rng.integers(0, 2, size=(300, nbits)).astype(bool)
    packed = bitpack.pack_bool_matrix(np.vstack([mat, mat[:50]]))  # force duplicates
    ints = bitpack.unpack_to_ints(packed, nbits)
    uniq, counts = bitpack.unique_packed(packed, return_counts=True)
    uniq_ints = bitpack.unpack_to_ints(uniq, nbits)
    expected_vals, expected_counts = np.unique(np.array([int(v) for v in ints], dtype=object),
                                               return_counts=True)
    assert [int(v) for v in uniq_ints] == [int(v) for v in expected_vals]
    np.testing.assert_array_equal(counts, expected_counts)

    # searchsorted / find
    queries = packed[:40]
    idx = bitpack.find_packed(uniq, queries)
    for qi, q in zip(idx, bitpack.unpack_to_ints(queries, nbits)):
        assert int(uniq_ints[qi]) == int(q)
    # a missing key
    missing = np.zeros((1, uniq.shape[1]), dtype=np.uint32)
    missing[0, 0] = 0xDEADBEEF
    missing[0, 1] = 0x12345678
    if bitpack.find_packed(uniq, missing)[0] != -1:
        # astronomically unlikely collision
        raise AssertionError("expected missing key")


def test_device_kernels_match_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    nbits = 70
    mat = rng.integers(0, 2, size=(200, nbits)).astype(bool)
    packed = bitpack.pack_bool_matrix(mat)
    uniq = bitpack.unique_packed(packed)

    # popcount
    np.testing.assert_array_equal(
        np.asarray(bitpack.jnp_popcount_rows(jnp.asarray(packed))), mat.sum(axis=1)
    )
    # sort
    dev_sorted = np.asarray(bitpack.jnp_sort_packed(jnp.asarray(uniq)))
    np.testing.assert_array_equal(dev_sorted, uniq)  # already sorted input stays sorted
    shuffled = packed[rng.permutation(len(packed))]
    np.testing.assert_array_equal(
        np.asarray(bitpack.jnp_sort_packed(jnp.asarray(shuffled))),
        bitpack.sort_packed(shuffled),
    )
    # searchsorted / find
    queries = packed[:64]
    host_idx = bitpack.find_packed(uniq, queries)
    dev_idx = np.asarray(bitpack.jnp_find_packed(jnp.asarray(uniq), jnp.asarray(queries)))
    np.testing.assert_array_equal(dev_idx, host_idx)


def test_prefix_and_bit_masks():
    nbits = 70
    pm = bitpack.prefix_masks(nbits)
    bm = bitpack.bit_masks(nbits)
    for k in [0, 1, 31, 32, 33, 64, 70]:
        val = 0
        for j in range(pm.shape[1]):
            val |= int(pm[k, j]) << (32 * j)
        assert val == (1 << k) - 1
    for p in [0, 31, 32, 69]:
        val = 0
        for j in range(bm.shape[1]):
            val |= int(bm[p, j]) << (32 * j)
        assert val == 1 << p
