# (C) 2026. Licensed under the Apache License, Version 2.0.
"""[2Fe-2S]-model cluster on REAL integrals with an open-shell (ROHF) mean
field — BASELINE config 4's named system ("methylene / [2Fe-2S]").

The reference's open-shell path delegates the mean field to PySCF and the CI
to ``fci.selected_ci`` with ``nelec=(na, nb)`` (reference
``fermion.py:505-516``).  Here the whole chain is in-repo: fitter-generated
Fe + transcribed S STO-3G data -> McMurchie-Davidson integrals over four
heavy centers (two with l=2 shells) -> high-spin ROHF -> frozen-core CAS ->
selected-CI solve, pinned against the independent dense Slater-Condon oracle
(:mod:`sqd_tpu.ops.dense_fci`).  The pins are exact for ANY orthonormal
orbital set, so SCF convergence quality cannot mask an integral bug.

The model is the bare Fe2S2 rhombus (real clusters carry thiolate ligands);
the claim is the chemistry stack at config-4 scale, not ligand-field
accuracy.
"""

from __future__ import annotations

import numpy as np
import pytest

from sqd_tpu.chem import Molecule, active_space_integrals, ao_integrals, rohf
from sqd_tpu.fermion import solve_sci
from sqd_tpu.ops import dense_fci

# planar rhombus: Fe-Fe 2.70 A, Fe-S(bridge) 2.20 A
_FE_X = 2.70 / 2
_S_Y = float(np.sqrt(2.20**2 - _FE_X**2))


@pytest.fixture(scope="module")
def fe2s2_mf():
    basis = __import__("sqd_tpu.chem.basis_data", fromlist=["BASIS_SETS"]).BASIS_SETS
    if "Fe" not in basis["sto-3g"]:
        pytest.skip("Fe entry not embedded")
    mol = Molecule(
        atoms=[
            ("Fe", (_FE_X, 0.0, 0.0)),
            ("Fe", (-_FE_X, 0.0, 0.0)),
            ("S", (0.0, _S_Y, 0.0)),
            ("S", (0.0, -_S_Y, 0.0)),
        ],
        basis="sto-3g",
    )
    ints = ao_integrals(mol)
    # high-spin ferromagnetic model state (S_z = 2); the CAS pins below are
    # exact for any orthonormal orbitals, so a hard-case SCF that stops at
    # max_cycle still yields a valid test basis (CASCI convention,
    # docs/design/chemistry.md)
    mf = rohf(mol, spin=4, max_cycle=80, integrals=ints)
    return mf


def test_fe2s2_shapes_and_orbitals(fe2s2_mf):
    mol = fe2s2_mf.mol
    assert mol.nao == 2 * 18 + 2 * 9  # Fe: 18 AOs each, S: 9 each
    assert mol.nelectron == 2 * 26 + 2 * 16
    assert fe2s2_mf.nelec == (44, 40)
    c, s = fe2s2_mf.mo_coeff, fe2s2_mf.overlap
    # orthonormal MOs regardless of convergence
    np.testing.assert_allclose(c.T @ s @ c, np.eye(mol.nao), atol=1e-8)
    assert float(np.sum(fe2s2_mf.mo_occ)) == mol.nelectron


def test_fe2s2_cas_matches_dense_oracle(fe2s2_mf):
    """CAS(6o,(4,2)) over the Fe-3d/S-3p frontier: solve_sci == dense FCI.

    Open-shell sector (S_z = 1 inside the active window): C(6,4)*C(6,2) =
    225 determinants — full-sector dense build is exact and cheap.
    """
    ncas, nelecas = 6, (4, 2)
    h1, eri, ecore = active_space_integrals(fe2s2_mf, ncas, nelecas)
    npair = eri.reshape(ncas * ncas, ncas * ncas)
    np.testing.assert_allclose(npair, npair.T, atol=1e-10)
    assert np.linalg.eigvalsh(npair).min() > -1e-9  # PSD physical ERIs
    sa = dense_fci.all_hamming_strings(ncas, nelecas[0])
    sb = dense_fci.all_hamming_strings(ncas, nelecas[1])
    res = solve_sci((sa, sb), h1, eri, ncas, nelecas, spin_sq=None)
    h_dense = dense_fci.build_dense_hamiltonian(sa, sb, h1, eri)
    e_exact = float(np.linalg.eigvalsh(h_dense)[0])
    assert abs(res.energy - e_exact) < 1e-8, (res.energy, e_exact)
    # truncated selected subspace sits variationally above the full CAS
    rng = np.random.default_rng(5)
    sub_a = np.sort(rng.choice(sa, size=8, replace=False))
    sub_b = np.sort(rng.choice(sb, size=8, replace=False))
    res_sub = solve_sci((sub_a, sub_b), h1, eri, ncas, nelecas, spin_sq=None)
    assert res_sub.energy >= res.energy - 1e-9
