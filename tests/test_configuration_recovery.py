# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Tests for the vectorized configuration-recovery kernel."""

import numpy as np
import pytest

from sqd_tpu import configuration_recovery as cr


def test_exact_hamming_restored():
    """Repaired rows must have the exact target bipartite Hamming weights."""
    rng = np.random.default_rng(0)
    norb = 8
    n_a, n_b = 3, 2
    mat = rng.integers(0, 2, size=(500, 2 * norb)).astype(bool)
    probs = np.ones(len(mat)) / len(mat)
    occ = (rng.random(norb), rng.random(norb))
    out, new_probs = cr.recover_configurations(mat, probs, occ, n_a, n_b, rand_seed=1)
    assert np.isclose(new_probs.sum(), 1.0)
    assert len(out) == len(new_probs)
    np.testing.assert_array_equal(out[:, norb:].sum(axis=1), n_a)
    np.testing.assert_array_equal(out[:, :norb].sum(axis=1), n_b)
    # dedup: all rows unique
    assert len(np.unique(out, axis=0)) == len(out)


def test_all_zeros_to_all_ones():
    """With occupancy 1 everywhere and full target weight, zeros flip to ones."""
    norb = 4
    mat = np.zeros((3, 8), dtype=bool)
    probs = np.ones(3) / 3
    occ = (np.ones(norb), np.ones(norb))
    out, p = cr.recover_configurations(mat, probs, occ, norb, norb, rand_seed=0)
    np.testing.assert_array_equal(out, np.ones((1, 8), dtype=bool))
    np.testing.assert_allclose(p, [1.0])


def test_no_flips_when_all_probs_zero():
    """occ=0 with bits=0 and target>0 gives all-zero flip probs -> row unchanged."""
    norb = 4
    mat = np.zeros((2, 8), dtype=bool)
    probs = np.ones(2) / 2
    occ = (np.zeros(norb), np.zeros(norb))
    out, _ = cr.recover_configurations(mat, probs, occ, 2, 2, rand_seed=0)
    # ratio=0.5, occ=0: p_flip_0_to_1 = 0*eps/0.5 = 0 -> any(p)==False -> unchanged
    np.testing.assert_array_equal(out, np.zeros((1, 8), dtype=bool))


def test_correct_rows_stay_correct():
    """Rows already at the target weight keep it (n_diff == 0 -> no flips)."""
    rng = np.random.default_rng(3)
    norb = 6
    n_a = n_b = 3
    rows = []
    for _ in range(50):
        r = np.zeros(2 * norb, dtype=bool)
        r[rng.choice(norb, n_b, replace=False)] = True
        r[norb + rng.choice(norb, n_a, replace=False)] = True
        rows.append(r)
    mat = np.array(rows)
    probs = np.ones(len(mat)) / len(mat)
    occ = (rng.random(norb), rng.random(norb))
    out, _ = cr.recover_configurations(mat, probs, occ, n_a, n_b, rand_seed=0)
    np.testing.assert_array_equal(out[:, norb:].sum(axis=1), n_a)
    np.testing.assert_array_equal(out[:, :norb].sum(axis=1), n_b)
    # every output row must be one of the input rows (no flips happened)
    in_set = {tuple(r) for r in mat}
    assert all(tuple(r) in in_set for r in out)


def test_seed_reproducibility():
    rng = np.random.default_rng(0)
    norb = 10
    mat = rng.integers(0, 2, size=(200, 2 * norb)).astype(bool)
    probs = np.ones(len(mat)) / len(mat)
    occ = (rng.random(norb), rng.random(norb))
    o1, p1 = cr.recover_configurations(mat, probs, occ, 4, 4, rand_seed=123)
    o2, p2 = cr.recover_configurations(mat, probs, occ, 4, 4, rand_seed=123)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_allclose(p1, p2)
    o3, _ = cr.recover_configurations(mat, probs, occ, 4, 4, rand_seed=124)
    assert o1.shape != o3.shape or not np.array_equal(o1, o3)


def test_negative_elec_raises():
    mat = np.zeros((1, 4), dtype=bool)
    with pytest.raises(ValueError, match="non-negative"):
        cr.recover_configurations(mat, [1.0], (np.zeros(2), np.zeros(2)), -1, 1)


def test_large_bitstrings_over_72_bits():
    """Regression analog of the reference >72-bit case — packed path has no cliff."""
    rng = np.random.default_rng(0)
    norb = 40  # 80 bits total
    mat = rng.integers(0, 2, size=(50, 2 * norb)).astype(bool)
    probs = np.ones(len(mat)) / len(mat)
    occ = (rng.random(norb), rng.random(norb))
    out, p = cr.recover_configurations(mat, probs, occ, 10, 10, rand_seed=7)
    np.testing.assert_array_equal(out[:, norb:].sum(axis=1), 10)
    np.testing.assert_array_equal(out[:, :norb].sum(axis=1), 10)
    assert np.isclose(p.sum(), 1.0)


def test_flip_distribution_matches_reference_semantics():
    """One over-weight bit removed: flip probability proportional to p_1_to_0."""
    # A single distinct row with 3 ones in the left half, target 2 -> one 1->0
    # flip. Replicate it many times in ONE call; each replica flips
    # independently, and the aggregated output probabilities give the
    # empirical flip distribution directly.
    norb = 3
    n_trials = 20000
    mat = np.tile(np.array([[1, 1, 1, 0, 1, 0]], dtype=bool), (n_trials, 1))
    probs = np.ones(n_trials) / n_trials
    # occupancies chosen to give distinct flip probs; target ratio = 2/3
    occ_b = np.array([0.9, 0.5, 0.1])  # orbital order; column i = occ_b[norb-1-i]
    occ_a = np.array([0.5, 0.9, 0.5])
    out, freqs = cr.recover_configurations(mat, probs, (occ_a, occ_b), 1, 2, rand_seed=0)
    np.testing.assert_array_equal(out[:, :norb].sum(axis=1), 2)
    counts = np.zeros(norb)
    for row, f in zip(out, freqs):
        flipped_col = int(np.flatnonzero(~row[:norb])[0])
        counts[flipped_col] += f * n_trials
    # Expected: p_flip_1_to_0(ratio=2/3, occ=occ_b[norb-1-i]) for column i
    def p10(ratio, occ, eps=0.01):
        r, o = 1 - ratio, 1 - occ
        if o < r:
            return o * eps / r
        if r == 1.0:
            return eps
        slope = (1 - eps) / (1 - r)
        return o * slope + (1 - slope)

    expected = np.array([p10(2 / 3, occ_b[norb - 1 - i]) for i in range(norb)])
    expected /= expected.sum()
    observed = counts / n_trials
    np.testing.assert_allclose(observed, expected, atol=0.03)
