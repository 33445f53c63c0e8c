# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Open-shell SQD on a real molecule: triplet methylene (CH2) / STO-3G.

BASELINE.md config 4 ("open-shell RDMs + orbital optimization, methylene")
names this system; the reference delegates the open-shell solve to PySCF's
``fci.selected_ci`` with ``nelec=(na, nb)`` (reference ``fermion.py:505-516``)
and optimizes orbitals through ``optimize_orbitals``
(reference ``fermion.py:640-751``).  Here the full path runs on this
framework's own stack: McMurchie-Davidson integrals -> RHF orbitals ->
frozen-core CAS with ``nelecas=(4, 2)`` -> selected-CI solve, RDMs and
orbital optimization — pinned against the independent dense Slater-Condon
oracle (:mod:`sqd_tpu.ops.dense_fci`) in the same basis.
"""

from __future__ import annotations

import numpy as np
import pytest

from sqd_tpu.chem import Molecule, active_space_integrals, rhf
from sqd_tpu.fermion import optimize_orbitals, rotate_integrals, solve_sci
from sqd_tpu.ops.dense_fci import (
    all_hamming_strings,
    build_dense_hamiltonian,
    build_dense_s2,
    dense_rdm1s,
)

# triplet CH2 geometry: r(CH) = 1.0775 A, HCH angle = 134 deg (bent)
_R, _HALF = 1.0775, np.deg2rad(134.0 / 2)
_X, _Z = _R * np.sin(_HALF), _R * np.cos(_HALF)


@pytest.fixture(scope="module")
def ch2_cas():
    mol = Molecule(
        [("C", (0.0, 0.0, 0.0)), ("H", (_X, 0.0, _Z)), ("H", (-_X, 0.0, _Z))],
        basis="sto-3g",
    )
    mf = rhf(mol)
    assert mf.converged
    # 8 electrons: freeze the C 1s core orbital, CAS(6o, (4,2)e) = S_z = 1
    h1, eri, ecore = active_space_integrals(mf, ncas=6, nelecas=(4, 2))
    return h1, eri, ecore


def test_open_shell_solve_matches_dense_oracle(ch2_cas):
    """Full-CAS (4a,2b) solve == dense eigh; lowest S_z=1 state is the triplet."""
    h1, eri, ecore = ch2_cas
    strs_a = all_hamming_strings(6, 4)
    strs_b = all_hamming_strings(6, 2)
    res = solve_sci((strs_a, strs_b), h1, eri, 6, (4, 2))

    hmat = build_dense_hamiltonian(strs_a, strs_b, h1, eri)
    w, v = np.linalg.eigh(hmat)
    assert abs(res.energy - w[0]) < 1e-9, (res.energy, w[0])

    # triplet ground state: S^2 = 2 exactly (S_z = 1 sector, S = 1)
    s2 = res.sci_state.spin_square()
    vec = v[:, 0]
    s2_dense = float(vec @ build_dense_s2(strs_a, strs_b, 6) @ vec)
    assert abs(s2 - 2.0) < 1e-8, s2
    assert abs(s2_dense - 2.0) < 1e-8, s2_dense

    # open-shell spin-resolved 1-RDMs: alpha and beta genuinely differ
    # RDMs are FIRST order in the Davidson residual (the energy is second
    # order), so the pin is 1e-6-grade at the solver's default tol
    dm_a, dm_b = dense_rdm1s(vec, strs_a, strs_b, 6)
    occ_a, occ_b = res.orbital_occupancies
    np.testing.assert_allclose(occ_a, np.diag(dm_a), atol=1e-6)
    np.testing.assert_allclose(occ_b, np.diag(dm_b), atol=1e-6)
    assert abs(occ_a.sum() - 4.0) < 1e-8 and abs(occ_b.sum() - 2.0) < 1e-8
    assert np.max(np.abs(occ_a - occ_b)) > 0.5  # two singly-occupied orbitals
    # spin-summed rdm1 from the result matches the dense oracle
    np.testing.assert_allclose(res.rdm1, dm_a + dm_b, atol=1e-6)


def test_open_shell_orbital_optimization_lowers_energy(ch2_cas):
    """OO on a truncated open-shell subspace recovers most of the gap to CAS.

    Mirrors the reference OO guide's pattern (a subspace too small to reach
    the CAS energy; orbital rotation closes part of the gap) with the
    methylene triplet; every energy is re-checked against a dense build in
    the rotated basis.
    """
    h1, eri, ecore = ch2_cas
    full_a = all_hamming_strings(6, 4)
    full_b = all_hamming_strings(6, 2)
    # truncated subspace: drop the highest-excitation strings
    strs_a = full_a[:9]
    strs_b = full_b[:9]
    base = solve_sci((strs_a, strs_b), h1, eri, 6, (4, 2), spin_sq=2.0)

    k_flat = np.zeros(6 * 5 // 2)
    e_oo, k_opt, (occ_a, occ_b) = optimize_orbitals(
        (strs_a, strs_b),
        h1,
        eri,
        k_flat,
        open_shell=True,
        spin_sq=2.0,
        num_iters=6,
        num_steps_grad=300,
        learning_rate=0.05,
    )
    assert e_oo < base.energy - 1e-4, (e_oo, base.energy)
    assert abs(occ_a.sum() - 4.0) < 1e-6 and abs(occ_b.sum() - 2.0) < 1e-6

    # exactness of the reported OO energy: dense rebuild in the rotated basis
    h1_rot, eri_rot = rotate_integrals(h1, eri, k_opt)
    hmat = build_dense_hamiltonian(strs_a, strs_b, np.asarray(h1_rot), np.asarray(eri_rot))
    w = np.linalg.eigvalsh(hmat)
    # the OO objective solves with a spin penalty; its reported energy is the
    # bare-H expectation of that state, which is >= the bare ground state of
    # the truncated subspace in the rotated basis
    assert e_oo >= w[0] - 1e-8
    # re-solving in the final rotated basis can land slightly BELOW e_oo:
    # the reported energy comes from the last solve, while k_opt includes the
    # SGD steps taken after it (reference semantics, fermion.py:713-739)
    resolve = solve_sci((strs_a, strs_b), np.asarray(h1_rot), np.asarray(eri_rot), 6, (4, 2), spin_sq=2.0)
    assert resolve.energy <= e_oo + 1e-9, (resolve.energy, e_oo)
    assert abs(resolve.energy - e_oo) < 1e-4, (resolve.energy, e_oo)
