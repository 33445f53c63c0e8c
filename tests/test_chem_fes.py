# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Real Fe/S chemistry: BASELINE config-4/5-class integrals, oracle-pinned.

BASELINE configs 4-5 are Fe-S systems ([2Fe-2S] / [4Fe-4S]); until this
module the repo ran those shapes on synthetic PSD integrals.  Here the
built-in integral engine produces REAL one-/two-electron integrals for
sulfur (transcribed published STO-3G) and iron (fitter-generated minimal
basis at documented Slater-rule zetas — see ``chem/sto_ng.py``), and the
selected-CI stack is pinned against the independent dense-FCI oracle on an
FeS-diatomic truncated CAS.  The pin validates the whole chain — basis data,
McMurchie-Davidson integrals (incl. l=2 shells on a Z=26 center), RHF, the
active-space fold, and the solver — on the same integrals.
"""

import numpy as np
import pytest

from sqd_tpu.chem import Molecule, active_space_integrals, rhf
from sqd_tpu.fermion import solve_sci
from sqd_tpu.ops import dense_fci


@pytest.fixture(scope="module")
def h2s_mf():
    # H2S experimental-ish geometry: r(SH) = 1.336 A, angle 92.1 deg
    r, half = 1.336, np.deg2rad(92.1) / 2
    mol = Molecule(
        atoms=[
            ("S", (0.0, 0.0, 0.0)),
            ("H", (r * np.sin(half), 0.0, r * np.cos(half))),
            ("H", (-r * np.sin(half), 0.0, r * np.cos(half))),
        ],
        basis="sto-3g",
    )
    return rhf(mol)


def test_h2s_rhf_sanity(h2s_mf):
    """H2S/STO-3G RHF: converged, correct AO count, literature ballpark.

    The published H2S STO-3G RHF total energy is ~-394.31 Ha (e.g. Hehre et
    al.'s second-row STO-3G paper reports RHF totals near the Hartree-Fock
    limit -398.7 with minimal-basis deficits of a few Ha); the loose window
    here guards against gross basis/integral errors (a single wrong exponent
    moves the energy by >0.1 Ha), while the exact pin is the CAS-vs-oracle
    test below.
    """
    assert h2s_mf.mol.nao == 11  # S: 1s 2s 2p 3s 3p (9) + 2 H
    assert h2s_mf.mol.nelectron == 18
    assert h2s_mf.converged
    assert -395.5 < h2s_mf.e_tot < -393.5


def test_h2s_cas_matches_dense_fci(h2s_mf):
    """CAS(6o, 8e) on real H2S integrals: solve_sci == dense-FCI oracle."""
    ncas, nelecas = 6, (4, 4)
    h1, eri, ecore = active_space_integrals(h2s_mf, ncas, nelecas)
    strs = dense_fci.all_hamming_strings(ncas, nelecas[0])
    res = solve_sci((strs, strs), h1, eri, ncas, nelecas, spin_sq=None)
    h_dense = dense_fci.build_dense_hamiltonian(strs, strs, h1, eri)
    e_exact = float(np.linalg.eigvalsh(h_dense)[0])
    assert abs(res.energy - e_exact) < 1e-8
    # CASCI must recover correlation energy vs the RHF determinant
    assert res.energy + ecore < h2s_mf.e_tot - 1e-4


@pytest.fixture(scope="module")
def fes_mf():
    if "Fe" not in __import__("sqd_tpu.chem.basis_data", fromlist=["BASIS_SETS"]).BASIS_SETS["sto-3g"]:
        pytest.skip("Fe entry not yet embedded")
    mol = Molecule(atoms=[("Fe", (0.0, 0.0, 0.0)), ("S", (0.0, 0.0, 2.0))], basis="sto-3g")
    # closed-shell RHF on a TM diatomic may sit on a saddle or oscillate;
    # the CASCI convention (documented in docs/design/chemistry.md) only
    # needs well-defined orthonormal orbitals — the CAS-vs-oracle pin below
    # is exact for ANY orbital set, converged or not.
    return rhf(mol, max_cycle=200)


def test_fes_molecule_shapes(fes_mf):
    mol = fes_mf.mol
    # Fe: 1s 2s 2p 3s 3p 3d 4s 4p = 1+1+3+1+3+5+1+3 = 18 AOs; S: 9
    assert mol.nao == 27
    assert mol.nelectron == 42
    s = fes_mf.overlap
    assert np.allclose(np.diag(s), 1.0, atol=1e-10)  # normalized AOs
    evals = np.linalg.eigvalsh(s)
    assert evals.min() > 1e-6  # basis not linearly dependent at 2.0 A


def test_fes_cas_matches_dense_fci(fes_mf):
    """Truncated CAS on real FeS integrals == dense-FCI oracle.

    CAS(8o, (5,5)) spans the Fe 3d / S 3p frontier window: C(8,5)^2 = 3136
    determinants, small enough for the full-sector dense build.
    """
    ncas, nelecas = 8, (5, 5)
    h1, eri, ecore = active_space_integrals(fes_mf, ncas, nelecas)
    # physical ERIs are PSD as a pair matrix — required by eri_factor paths
    npair_mat = eri.reshape(ncas * ncas, ncas * ncas)
    np.testing.assert_allclose(npair_mat, npair_mat.T, atol=1e-10)
    assert np.linalg.eigvalsh(npair_mat).min() > -1e-9
    strs = dense_fci.all_hamming_strings(ncas, nelecas[0])
    res = solve_sci((strs, strs), h1, eri, ncas, nelecas, spin_sq=None)
    h_dense = dense_fci.build_dense_hamiltonian(strs, strs, h1, eri)
    e_exact = float(np.linalg.eigvalsh(h_dense)[0])
    assert abs(res.energy - e_exact) < 1e-8
    # a selected (truncated) subspace must sit variationally ABOVE full CAS
    rng = np.random.default_rng(3)
    sub = np.sort(rng.choice(strs, size=30, replace=False))
    res_sub = solve_sci((sub, sub), h1, eri, ncas, nelecas, spin_sq=None)
    assert res_sub.energy >= res.energy - 1e-9
