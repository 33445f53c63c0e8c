# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Pivoted-Cholesky ERI factorization of the cross-spin contraction.

Large active spaces (reference BASELINE config 5: [4Fe-4S], 36 orbitals)
make the dense (npair, npair) pair matmul the matvec FLOP wall; physical
ERIs factor as V = L^T L with X ~ 6-10x norb.  The factor accelerates the
f32 matvec paths only — f64 evaluation stays exact.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sqd_tpu.ops import bitpack, dense_fci
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian, pivoted_cholesky_pairs


def _lowrank_eri(norb, rank, seed=0):
    rng = np.random.default_rng(seed)
    chol = rng.normal(size=(rank, norb, norb)) * (0.4 / np.sqrt(rank))
    chol = (chol + chol.transpose(0, 2, 1)) / 2
    return np.einsum("xpq,xrs->pqrs", chol, chol)


def test_pivoted_cholesky_recovers_psd_pair_matrix():
    norb, rank = 8, 12
    eri = _lowrank_eri(norb, rank)
    ell = pivoted_cholesky_pairs(eri, norb)
    assert ell is not None
    npair = norb * norb
    v = eri.reshape(npair, npair)
    assert ell.shape[1] == npair
    assert ell.shape[0] <= rank + 4  # numerical rank ~ construction rank
    np.testing.assert_allclose(ell.T @ ell, v, atol=1e-11 * max(1.0, np.abs(v).max()))


def test_pivoted_cholesky_rejects_indefinite():
    rng = np.random.default_rng(3)
    norb = 6
    eri = rng.normal(size=(norb,) * 4)
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)  # symmetric pair matrix, NOT PSD
    assert pivoted_cholesky_pairs(eri, norb) is None


def test_pivoted_cholesky_rejects_asymmetric():
    norb = 4
    eri = _lowrank_eri(norb, 6)
    eri = eri.copy()
    eri[0, 1, 2, 3] += 0.5  # break (pq|rs) = (rs|pq)
    assert pivoted_cholesky_pairs(eri, norb) is None


def _problem(norb, nelec, m, n, seed=1):
    rng = np.random.default_rng(seed)
    h1 = rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2
    eri = _lowrank_eri(norb, 3 * norb, seed=seed + 1)
    sa = np.sort(rng.choice(dense_fci.all_hamming_strings(norb, nelec[0]), m, replace=False))
    sb = np.sort(rng.choice(dense_fci.all_hamming_strings(norb, nelec[1]), n, replace=False))
    return h1, eri, bitpack.pack_ints(sa, norb), bitpack.pack_ints(sb, norb)


def test_f32_matvec_through_factor_matches_exact():
    """Factored f32 matvec == exact f32 matvec to f32 roundoff; the f64
    matvec never uses the factor (bit-identical with and without)."""
    norb, nelec = 10, (5, 5)
    h1, eri, pa, pb = _problem(norb, nelec, 40, 40)
    ell = pivoted_cholesky_pairs(eri, norb)
    assert ell is not None
    ham_exact = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, eri_factor=None)
    ham_fact = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, eri_factor=ell)
    assert ham_fact.eri_chol is not None
    rng = np.random.default_rng(7)
    v64 = jnp.asarray(rng.normal(size=ham_exact.shape))
    np.testing.assert_array_equal(
        np.asarray(ham_fact.matvec(v64)), np.asarray(ham_exact.matvec(v64))
    )
    v32 = v64.astype(jnp.float32)
    s_exact = np.asarray(ham_exact.astype(jnp.float32).matvec(v32), np.float64)
    s_fact = np.asarray(ham_fact.astype(jnp.float32).matvec(v32), np.float64)
    scale = np.abs(s_exact).max()
    assert np.abs(s_fact - s_exact).max() < 2e-5 * scale


def test_f32_matvec_factor_blocked_path():
    """Factor must also serve the column-blocked matvec variants."""
    norb, nelec = 10, (5, 5)
    h1, eri, pa, pb = _problem(norb, nelec, 48, 64, seed=9)
    ell = pivoted_cholesky_pairs(eri, norb)
    ham_exact = build_sci_hamiltonian(
        pa, pb, h1, eri, norb, nelec, eri_factor=None, col_block=16
    )
    ham_fact = build_sci_hamiltonian(
        pa, pb, h1, eri, norb, nelec, eri_factor=ell, col_block=16
    )
    rng = np.random.default_rng(5)
    v32 = jnp.asarray(rng.normal(size=ham_exact.shape).astype(np.float32))
    s_exact = np.asarray(ham_exact.astype(jnp.float32).matvec(v32), np.float64)
    s_fact = np.asarray(ham_fact.astype(jnp.float32).matvec(v32), np.float64)
    assert np.abs(s_fact - s_exact).max() < 2e-5 * max(1.0, np.abs(s_exact).max())


def test_auto_factor_small_norb_stays_exact():
    """npair <= 256 (production CASCI sizes) never auto-factors — the tuned
    exact path and its compile cache stay untouched."""
    norb, nelec = 8, (4, 4)
    h1, eri, pa, pb = _problem(norb, nelec, 20, 20, seed=2)
    ham = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec)  # auto
    assert ham.eri_chol is None


def test_auto_factor_large_norb_accepts_psd():
    norb, nelec = 17, (3, 3)
    h1, eri, pa, pb = _problem(norb, nelec, 12, 12, seed=4)
    ham = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec)  # auto
    assert ham.eri_chol is not None
    assert ham.eri_chol.shape[0] <= norb * norb // 3
    # spot-check energy agreement through a random vector
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=ham.shape).astype(np.float32))
    exact = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, eri_factor=None)
    s_f = np.asarray(ham.astype(jnp.float32).matvec(v), np.float64)
    s_e = np.asarray(exact.astype(jnp.float32).matvec(v), np.float64)
    assert np.abs(s_f - s_e).max() < 2e-5 * max(1.0, np.abs(s_e).max())


def test_bad_eri_factor_arguments():
    norb, nelec = 8, (4, 4)
    h1, eri, pa, pb = _problem(norb, nelec, 10, 10, seed=6)
    with pytest.raises(ValueError, match="eri_factor"):
        build_sci_hamiltonian(
            pa, pb, h1, eri, norb, nelec, eri_factor=np.zeros((3, 7))
        )
    with pytest.raises(ValueError, match="eri_factor"):
        build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, eri_factor="bogus")
