# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Tests for sqd_tpu.counts (mirrors reference test/test_counts.py coverage)."""

import numpy as np
import pytest

from sqd_tpu import counts
from sqd_tpu.primitives import BitArray


def test_counts_to_arrays():
    c = {"0101": 2, "1100": 6}
    bs_mat, freqs = counts.counts_to_arrays(c)
    np.testing.assert_array_equal(
        bs_mat, [[False, True, False, True], [True, True, False, False]]
    )
    np.testing.assert_allclose(freqs, [0.25, 0.75])


def test_counts_to_arrays_empty():
    bs_mat, freqs = counts.counts_to_arrays({})
    assert bs_mat.size == 0
    assert freqs.size == 0


def test_bit_array_to_arrays_dedup_and_probs():
    rows = np.array(
        [[0, 1, 1], [1, 0, 0], [0, 1, 1], [1, 1, 1]], dtype=bool
    )
    ba = BitArray.from_bool_array(rows)
    assert ba.num_shots == 4
    bs, probs = counts.bit_array_to_arrays(ba)
    # unique + ascending integer order: 011=3, 100=4, 111=7
    np.testing.assert_array_equal(
        bs, [[False, True, True], [True, False, False], [True, True, True]]
    )
    np.testing.assert_allclose(probs, [0.5, 0.25, 0.25])


@pytest.mark.parametrize("num_samples,num_bits", [(0, 4), (4, 0)])
def test_generate_counts_uniform_errors(num_samples, num_bits):
    with pytest.raises(ValueError):
        counts.generate_counts_uniform(num_samples, num_bits)


def test_generate_counts_uniform():
    c = counts.generate_counts_uniform(100, 8, rand_seed=7)
    assert sum(c.values()) == 100
    assert all(len(k) == 8 for k in c)
    # deterministic under the same seed
    assert c == counts.generate_counts_uniform(100, 8, rand_seed=7)


def test_generate_bit_array_uniform():
    ba = counts.generate_bit_array_uniform(50, 9, rand_seed=3)
    assert ba.num_shots == 50
    assert ba.num_bits == 9


def test_generate_counts_bipartite_hamming():
    c = counts.generate_counts_bipartite_hamming(
        200, 12, hamming_right=2, hamming_left=3, rand_seed=1
    )
    assert sum(c.values()) == 200
    for bs in c:
        assert sum(b == "1" for b in bs[6:]) == 2
        assert sum(b == "1" for b in bs[:6]) == 3


def test_generate_counts_bipartite_hamming_errors():
    with pytest.raises(ValueError, match="even"):
        counts.generate_counts_bipartite_hamming(10, 7, hamming_right=1, hamming_left=1)
    with pytest.raises(ValueError, match="positive"):
        counts.generate_counts_bipartite_hamming(0, 8, hamming_right=1, hamming_left=1)
    with pytest.raises(ValueError, match="non-negative"):
        counts.generate_counts_bipartite_hamming(10, 8, hamming_right=-1, hamming_left=1)


@pytest.mark.parametrize("nbits", [8, 63, 64, 80])
def test_bitstring_matrix_to_integers(nbits):
    rng = np.random.default_rng(5)
    mat = rng.integers(0, 2, size=(9, nbits)).astype(bool)
    ints = counts.bitstring_matrix_to_integers(mat)
    assert (ints.dtype == object) == (nbits >= 64)
    for row, val in zip(mat, ints):
        assert int(val) == int("".join("1" if b else "0" for b in row), 2)


def test_normalize_counts_dict():
    assert counts.normalize_counts_dict({}) == {}
    out = counts.normalize_counts_dict({"00": 1, "11": 3})
    assert out == {"00": 0.25, "11": 0.75}
