# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Tests for sqd_tpu.subsampling (mirrors reference test/test_subsampling.py coverage)."""

import numpy as np
import pytest

from sqd_tpu import subsampling


def _random_bs(rng, n, bits=8):
    return rng.integers(0, 2, size=(n, bits)).astype(bool)


def test_postselect():
    mat = np.array(
        [
            [1, 0, 1, 0],  # left ham 1, right ham 1
            [1, 1, 1, 1],  # 2, 2
            [0, 1, 1, 0],  # 1, 1
            [0, 0, 1, 1],  # 0, 2
        ],
        dtype=bool,
    )
    probs = np.array([0.1, 0.2, 0.3, 0.4])
    bs, p = subsampling.postselect_by_hamming_right_and_left(
        mat, probs, hamming_right=1, hamming_left=1
    )
    np.testing.assert_array_equal(bs, mat[[0, 2]])
    np.testing.assert_allclose(p, [0.25, 0.75])


def test_postselect_errors():
    mat = np.zeros((3, 4), dtype=bool)
    probs = np.ones(3) / 3
    with pytest.raises(ValueError, match="non-negative"):
        subsampling.postselect_by_hamming_right_and_left(
            mat, probs, hamming_right=-1, hamming_left=0
        )
    with pytest.raises(ValueError, match="even"):
        subsampling.postselect_by_hamming_right_and_left(
            np.zeros((3, 5), dtype=bool), probs, hamming_right=1, hamming_left=1
        )
    with pytest.raises(ValueError, match="number of elements"):
        subsampling.postselect_by_hamming_right_and_left(
            mat, np.ones(2), hamming_right=1, hamming_left=1
        )


def test_subsample_shapes_and_membership():
    rng = np.random.default_rng(0)
    mat = np.unique(_random_bs(rng, 100), axis=0)
    probs = np.ones(len(mat)) / len(mat)
    batches = subsampling.subsample(mat, probs, samples_per_batch=10, num_batches=5, rand_seed=1)
    assert len(batches) == 5
    pool = {tuple(r) for r in mat}
    for b in batches:
        assert b.shape == (10, 8)
        # without replacement within a batch
        assert len({tuple(r) for r in b}) == 10
        assert all(tuple(r) in pool for r in b)


def test_subsample_identity_when_batch_geq_pool():
    rng = np.random.default_rng(0)
    mat = np.unique(_random_bs(rng, 10), axis=0)
    probs = np.ones(len(mat)) / len(mat)
    batches = subsampling.subsample(mat, probs, samples_per_batch=50, num_batches=3)
    for b in batches:
        np.testing.assert_array_equal(b, mat)


def test_subsample_empty_input():
    batches = subsampling.subsample(np.empty((0, 8), dtype=bool), np.array([]), 5, 3)
    assert len(batches) == 3
    assert all(b.size == 0 for b in batches)


def test_subsample_errors():
    mat = np.zeros((4, 4), dtype=bool)
    probs = np.ones(4) / 4
    with pytest.raises(ValueError, match="number of elements"):
        subsampling.subsample(mat, np.ones(3), 2, 1)
    with pytest.raises(ValueError, match="Samples per batch"):
        subsampling.subsample(mat, probs, 0, 1)
    with pytest.raises(ValueError, match="number of batches"):
        subsampling.subsample(mat, probs, 2, 0)


def test_subsample_deterministic_with_seed():
    rng = np.random.default_rng(0)
    mat = np.unique(_random_bs(rng, 60), axis=0)
    probs = rng.random(len(mat))
    probs /= probs.sum()
    b1 = subsampling.subsample(mat, probs, 7, 4, rand_seed=42)
    b2 = subsampling.subsample(mat, probs, 7, 4, rand_seed=42)
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)


def test_postselect_and_subsample_deprecated_combo():
    rng = np.random.default_rng(0)
    mat = _random_bs(rng, 200, bits=8)
    probs = np.ones(len(mat)) / len(mat)
    with pytest.warns(DeprecationWarning, match="postselect_and_subsample"):
        batches = subsampling.postselect_and_subsample(
            mat,
            probs,
            hamming_right=2,
            hamming_left=2,
            samples_per_batch=3,
            num_batches=2,
            rand_seed=0,
        )
    assert len(batches) == 2
    for b in batches:
        for row in b:
            assert row[4:].sum() == 2 and row[:4].sum() == 2


def test_post_select_by_hamming_weight_warns():
    """Warning parity with the reference's 0.12 deprecations
    (``subsampling.py:24-31``, ``configuration_recovery.py:26-31``)."""
    rng = np.random.default_rng(0)
    mat = _random_bs(rng, 50, bits=8)
    with pytest.warns(DeprecationWarning, match="post_select_by_hamming_weight"):
        mask = subsampling.post_select_by_hamming_weight(
            mat, hamming_right=2, hamming_left=2
        )
    assert mask.dtype == bool and len(mask) == len(mat)


def test_subsample_device_matches_host_semantics():
    """Device Gumbel-top-k path: same shapes/membership/degenerate cases."""
    import jax

    rng = np.random.default_rng(5)
    mat = np.unique(_random_bs(rng, 80), axis=0)
    probs = rng.random(len(mat))
    probs /= probs.sum()
    key = jax.random.key(7)
    batches = subsampling.subsample_device(mat, probs, 9, 4, key)
    assert len(batches) == 4
    pool = {tuple(r) for r in mat}
    for b in batches:
        assert b.shape == (9, mat.shape[1])
        rows = [tuple(r) for r in b]
        assert len(set(rows)) == 9  # without replacement within a batch
        assert set(rows) <= pool
    # identity-copy degenerate case (reference subsampling.py:193-196)
    ident = subsampling.subsample_device(mat, probs, len(mat) + 1, 2, key)
    for b in ident:
        np.testing.assert_array_equal(b, mat)
    # zero-probability rows are never drawn
    probs2 = probs.copy()
    probs2[:5] = 0.0
    probs2 /= probs2.sum()
    batches2 = subsampling.subsample_device(mat, probs2, 9, 8, key)
    banned = {tuple(r) for r in mat[:5]}
    for b in batches2:
        assert not ({tuple(r) for r in b} & banned)


def test_subsample_device_errors():
    import jax

    rng = np.random.default_rng(6)
    mat = np.unique(_random_bs(rng, 30), axis=0)
    probs = np.ones(len(mat)) / len(mat)
    key = jax.random.key(0)
    with pytest.raises(ValueError, match="number of elements"):
        subsampling.subsample_device(mat, probs[:-1], 2, 2, key)
    with pytest.raises(ValueError, match="Samples per batch"):
        subsampling.subsample_device(mat, probs, 0, 2, key)
    with pytest.raises(ValueError, match="number of batches"):
        subsampling.subsample_device(mat, probs, 2, 0, key)
    # fewer positive-probability rows than samples_per_batch: the host path
    # (rng.choice) raises — the device path must match rather than silently
    # including zero-probability rows (ADVICE r2)
    probs_sparse = np.zeros(len(mat))
    probs_sparse[:3] = 1.0 / 3.0
    with pytest.raises(ValueError, match="Fewer non-zero entries"):
        subsampling.subsample_device(mat, probs_sparse, 5, 2, key)
