# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Open-shell SCF (ROHF/UHF) pins — closes the "RHF-only chemistry" gap.

The reference obtains open-shell mean fields from PySCF upstream (its
open-shell CASCI path takes ``nelec=(na, nb)``, reference
``fermion.py:505-516``); this framework computes them in
:mod:`sqd_tpu.chem.scf_open`.  No external chemistry package exists in this
image, so every pin is an internal exactness oracle:

- closed-shell reduction: ROHF == UHF == RHF fixed point;
- the ROHF energy equals the single-determinant Slater-Condon expectation
  value (independent ``ops.dense_fci`` machinery, 1x1 subspace);
- full-space FCI energy is invariant to the orbital set (RHF vs ROHF);
- variational ordering  E_FCI <= E_CAS(ROHF orbitals) <= E_ROHF, and
  E_UHF <= E_ROHF;  UHF <S^2> >= Sz(Sz+1).
"""

from __future__ import annotations

import numpy as np
import pytest

from sqd_tpu.chem import Molecule, active_space_integrals, mo_eri, rhf, rohf, uhf
from sqd_tpu.fermion import solve_sci
from sqd_tpu.ops.dense_fci import all_hamming_strings, build_dense_hamiltonian

# triplet CH2 geometry (same as tests/test_methylene_open_shell.py)
_R, _HALF = 1.0775, np.deg2rad(134.0 / 2)
_X, _Z = _R * np.sin(_HALF), _R * np.cos(_HALF)


@pytest.fixture(scope="module")
def ch2():
    return Molecule(
        [("C", (0.0, 0.0, 0.0)), ("H", (_X, 0.0, _Z)), ("H", (-_X, 0.0, _Z))],
        basis="sto-3g",
    )


@pytest.fixture(scope="module")
def water():
    return Molecule(
        [
            ("O", (0.0, 0.0, 0.1173)),
            ("H", (0.0, 0.7572, -0.4692)),
            ("H", (0.0, -0.7572, -0.4692)),
        ],
        basis="sto-3g",
    )


@pytest.fixture(scope="module")
def ch2_rohf(ch2):
    mf = rohf(ch2, spin=2)
    assert mf.converged
    return mf


def test_rohf_closed_shell_matches_rhf(water):
    ref = rhf(water)
    mf = rohf(water, spin=0)
    assert mf.converged
    assert abs(mf.e_tot - ref.e_tot) < 1e-8, (mf.e_tot, ref.e_tot)
    assert np.all(mf.mo_occ[: water.nelectron // 2] == 2.0)


def test_uhf_closed_shell_matches_rhf(water):
    ref = rhf(water)
    mf = uhf(water, spin=0)
    assert mf.converged
    assert abs(mf.e_tot - ref.e_tot) < 1e-8
    assert abs(mf.spin_square) < 1e-8  # no contamination at the RHF point


def test_rohf_triplet_energy_is_single_determinant_expectation(ch2_rohf):
    """E_ROHF == <D|H|D> for the aufbau determinant in the ROHF MO basis,
    through the independent dense Slater-Condon oracle (1x1 subspace)."""
    mf = ch2_rohf
    na, nb = mf.nelec
    h1 = mf.mo_coeff.T @ mf.hcore @ mf.mo_coeff
    eri_mo = mo_eri(mf.eri, mf.mo_coeff)
    sa = np.array([(1 << na) - 1], dtype=np.int64)
    sb = np.array([(1 << nb) - 1], dtype=np.int64)
    h11 = build_dense_hamiltonian(sa, sb, h1, eri_mo)
    e_det = float(h11[0, 0]) + mf.e_nuc
    assert abs(e_det - mf.e_tot) < 1e-9, (e_det, mf.e_tot)


def test_fci_energy_invariant_to_orbital_set(ch2, ch2_rohf):
    """Full-space FCI from ROHF orbitals == from closed-shell RHF orbitals."""
    ref = rhf(ch2)
    energies = []
    for mf in (ref, ch2_rohf):
        h1 = mf.mo_coeff.T @ mf.hcore @ mf.mo_coeff
        eri_mo = mo_eri(mf.eri, mf.mo_coeff)
        norb = h1.shape[0]
        sa = all_hamming_strings(norb, 5)
        sb = all_hamming_strings(norb, 3)
        hmat = build_dense_hamiltonian(sa, sb, h1, eri_mo)
        energies.append(np.linalg.eigvalsh(hmat)[0] + mf.e_nuc)
    assert abs(energies[0] - energies[1]) < 1e-8, energies


def test_rohf_orbitals_feed_casci_with_exact_bounds(ch2, ch2_rohf):
    """CAS(6o,(4,2)) from ROHF orbitals: E_FCI <= E_CAS <= E_ROHF exactly
    (the active window contains the ROHF determinant; CAS is a subspace of
    the FCI space)."""
    mf = ch2_rohf
    h1, eri_act, ecore = active_space_integrals(mf, ncas=6, nelecas=(4, 2))
    sa = all_hamming_strings(6, 4)
    sb = all_hamming_strings(6, 2)
    res = solve_sci((sa, sb), h1, eri_act, 6, (4, 2))
    e_cas = res.energy + ecore

    # full-space FCI lower bound (from the same ROHF orbital set)
    h1f = mf.mo_coeff.T @ mf.hcore @ mf.mo_coeff
    erif = mo_eri(mf.eri, mf.mo_coeff)
    norb = h1f.shape[0]
    hmat = build_dense_hamiltonian(
        all_hamming_strings(norb, 5), all_hamming_strings(norb, 3), h1f, erif
    )
    e_fci = np.linalg.eigvalsh(hmat)[0] + mf.e_nuc
    assert e_fci - 1e-9 <= e_cas <= mf.e_tot + 1e-9, (e_fci, e_cas, mf.e_tot)


def test_uhf_triplet_below_rohf_with_contamination(ch2, ch2_rohf):
    mf = uhf(ch2, spin=2)
    assert mf.converged
    assert mf.e_tot <= ch2_rohf.e_tot + 1e-10, (mf.e_tot, ch2_rohf.e_tot)
    # Sz(Sz+1) = 2 is the floor; real UHF triplets contaminate slightly above
    assert 2.0 - 1e-9 <= mf.spin_square < 2.2, mf.spin_square


def test_uhf_doublet_default_spin():
    """CH3 radical: odd electron count defaults to spin=1 (doublet)."""
    mol = Molecule(
        [
            ("C", (0.0, 0.0, 0.0)),
            ("H", (1.079, 0.0, 0.0)),
            ("H", (-0.5395, 0.9344, 0.0)),
            ("H", (-0.5395, -0.9344, 0.0)),
        ],
        basis="sto-3g",
    )
    mf = uhf(mol)
    assert mf.converged
    assert mf.nelec == (5, 4)
    assert 0.75 - 1e-9 <= mf.spin_square < 0.85, mf.spin_square


def test_impossible_spin_raises(ch2):
    with pytest.raises(ValueError, match="Impossible spin"):
        rohf(ch2, spin=1)  # 8 electrons can't have na-nb odd
    with pytest.raises(ValueError, match="Impossible spin"):
        uhf(ch2, spin=-2)


def test_shared_integrals_path(water):
    """Precomputed-integrals kwarg skips the AO build (API parity with rhf)."""
    from sqd_tpu.chem import ao_integrals

    ints = ao_integrals(water)
    a = rohf(water, spin=0, integrals=ints)
    b = rohf(water, spin=0)
    assert abs(a.e_tot - b.e_tot) < 1e-12
