# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Orbital-rotation and orbital-optimization tests (reference L4 parity)."""

import numpy as np
import pytest

from sqd_tpu import fermion
from sqd_tpu.ops import dense_fci


def _random_integrals(norb, seed=0, scale=0.2):
    rng = np.random.default_rng(seed)
    h1 = rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2
    eri = rng.normal(size=(norb,) * 4) * scale
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    return h1, eri / 8


def test_rotate_integrals_identity():
    h1, eri = _random_integrals(4)
    k_flat = np.zeros(6)
    h_rot, eri_rot = fermion.rotate_integrals(h1, eri, k_flat)
    np.testing.assert_allclose(h_rot, h1, atol=1e-12)
    np.testing.assert_allclose(eri_rot, eri, atol=1e-12)


def test_rotate_integrals_wrong_length_raises():
    h1, eri = _random_integrals(4)
    with pytest.raises(ValueError, match="upper triangle"):
        fermion.rotate_integrals(h1, eri, np.zeros(5))


def test_rotate_integrals_preserves_spectrum():
    """A unitary orbital rotation must not change the FCI spectrum."""
    norb = 4
    h1, eri = _random_integrals(norb, seed=3)
    rng = np.random.default_rng(1)
    k_flat = rng.normal(size=(norb * (norb - 1)) // 2) * 0.3
    h_rot, eri_rot = fermion.rotate_integrals(h1, eri, k_flat)
    strs = dense_fci.all_hamming_strings(norb, 2)
    h_orig = dense_fci.build_dense_hamiltonian(strs, strs, h1, eri)
    h_new = dense_fci.build_dense_hamiltonian(strs, strs, h_rot, eri_rot)
    np.testing.assert_allclose(
        np.linalg.eigvalsh(h_orig), np.linalg.eigvalsh(h_new), atol=1e-9
    )


def test_rotate_integrals_orthogonality():
    """h' = U^T h U with U = expm(K) orthogonal."""
    norb = 5
    h1, eri = _random_integrals(norb, seed=4)
    rng = np.random.default_rng(2)
    k_flat = rng.normal(size=(norb * (norb - 1)) // 2) * 0.2
    h_rot, _ = fermion.rotate_integrals(h1, eri, k_flat)
    # eigenvalues of the one-body matrix are preserved under orthogonal transform
    np.testing.assert_allclose(
        np.linalg.eigvalsh(h_rot), np.linalg.eigvalsh(h1), atol=1e-10
    )


def test_optimize_orbitals_lowers_energy_in_truncated_subspace():
    """OO in a truncated subspace recovers energy lost to truncation.

    Mirrors the reference guide scenario
    (docs/guides/use_oo_to_optimize_hamiltonian_basis.ipynb): rotate the basis
    randomly, solve in a small subspace, and check orbital optimization
    improves the energy.
    """
    norb = 4
    nelec = (2, 2)
    h1, eri = _random_integrals(norb, seed=7, scale=0.3)
    # truncated subspace: a few determinants only
    all_strs = dense_fci.all_hamming_strings(norb, 2)
    rng = np.random.default_rng(5)
    sel = np.sort(rng.choice(all_strs, 3, replace=False))

    res0 = fermion.solve_sci((sel, sel), h1, eri, norb=norb, nelec=nelec)
    num_params = (norb**2 - norb) // 2
    e_opt, k_opt, occ = fermion.optimize_orbitals(
        (sel, sel),
        h1,
        eri,
        np.zeros(num_params),
        num_iters=4,
        num_steps_grad=300,
        learning_rate=0.05,
    )
    assert e_opt <= res0.energy + 1e-9
    assert k_opt.shape == (num_params,)
    assert len(occ[0]) == norb and len(occ[1]) == norb
    # improvement should be real for a generic Hamiltonian
    assert e_opt < res0.energy - 1e-6


def test_optimize_orbitals_wrong_kflat_raises():
    h1, eri = _random_integrals(4)
    with pytest.raises(ValueError, match="k_flat"):
        fermion.optimize_orbitals(
            (np.array([3]), np.array([3])), h1, eri, np.zeros(2)
        )
