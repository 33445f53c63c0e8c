# (C) 2026. Licensed under the Apache License, Version 2.0.
"""BASELINE config 3: the full self-consistent SQD loop on N2/cc-pVDZ.

The reference states a ~25-spatial-orbital capability envelope
(``/root/reference/README.md:78``) but publishes no cc-pVDZ energy anywhere
in its repo, so there is no external number to pin against.  Following the
round-3 verdict's prescription, correctness rests on in-repo oracles:

* the RHF total energy is variationally below the 6-31G value at the same
  geometry (pinned to 1e-12 against the reference's published N2/6-31G
  energy in ``tests/test_chem.py``);
* a truncated active space from the SAME cc-pVDZ integrals is pinned against
  the independent dense-FCI oracle (``sqd_tpu/ops/dense_fci.py``) to 1e-8;
* the full 28-orbital loop (multiword CI strings: 56-bit shots) is variational
  against RHF and internally consistent across iterations.
"""

from __future__ import annotations

import numpy as np
import pytest

from sqd_tpu.chem import Molecule, active_space_integrals, rhf
from sqd_tpu.chem.integrals import ao_integrals
from sqd_tpu.fermion import diagonalize_fermionic_hamiltonian, solve_sci
from sqd_tpu.ops.dense_fci import all_hamming_strings, build_dense_hamiltonian
from sqd_tpu.primitives import BitArray

R_NN = 1.0977  # angstrom (NIST CCCBDB equilibrium bond length)


@pytest.fixture(scope="module")
def n2_ccpvdz():
    mol = Molecule([("N", (0, 0, 0)), ("N", (R_NN, 0, 0))], basis="cc-pvdz")
    ints = ao_integrals(mol)
    mf = rhf(mol, integrals=ints)
    return mf


def test_rhf_sanity_and_variational_vs_631g(n2_ccpvdz):
    mf = n2_ccpvdz
    assert mf.converged
    assert mf.mo_coeff.shape == (28, 28)  # 2 x [3s 2p 1d] = 28 spherical AOs
    mol_631g = Molecule([("N", (0, 0, 0)), ("N", (R_NN, 0, 0))], basis="6-31g")
    e_631g = rhf(mol_631g).e_tot
    # the larger correlation-consistent basis must lower the RHF energy
    assert mf.e_tot < e_631g - 0.05
    # sanity window (HF-limit for N2 is ~ -108.993; cc-pVDZ sits above it)
    assert -109.0 < mf.e_tot < -108.90


def test_truncated_cas_vs_dense_oracle(n2_ccpvdz):
    """CAS(6o, 6e) from the cc-pVDZ integrals vs the dense-FCI oracle."""
    mf = n2_ccpvdz
    h1, eri, ecore = active_space_integrals(mf, ncas=6, nelecas=6)
    strs = all_hamming_strings(6, 3)
    res = solve_sci((strs, strs), h1, eri, 6, (3, 3), tol=1e-10)
    h_dense = build_dense_hamiltonian(strs, strs, h1, eri)
    e_exact = np.linalg.eigvalsh(h_dense)[0]
    assert abs(res.energy - e_exact) < 1e-8
    # correlation within the window lowers the energy below RHF
    assert res.energy + ecore < mf.e_tot - 1e-4


def test_o2_open_shell_cas_vs_dense_oracle():
    """Oxygen cc-pVDZ data + open-shell CAS (BASELINE config-4 pattern).

    O2 triplet: closed-shell RHF orbitals as the CAS basis (the CASCI
    convention), ``nelecas=(4, 2)`` in a 6-orbital window, pinned against
    the dense-FCI oracle; exercises the O entry of the cc-pVDZ data.
    """
    mol = Molecule([("O", (0, 0, 0)), ("O", (1.2075, 0, 0))], basis="cc-pvdz")
    assert mol.nao == 28
    mf = rhf(mol)
    assert mf.converged
    h1, eri, ecore = active_space_integrals(mf, ncas=6, nelecas=(4, 2))
    strs_a = all_hamming_strings(6, 4)
    strs_b = all_hamming_strings(6, 2)
    res = solve_sci((strs_a, strs_b), h1, eri, 6, (4, 2), tol=1e-10)
    h_dense = build_dense_hamiltonian(strs_a, strs_b, h1, eri)
    e_exact = np.linalg.eigvalsh(h_dense)[0]
    assert abs(res.energy - e_exact) < 1e-8
    occ_a, occ_b = res.orbital_occupancies
    assert abs(occ_a.sum() - 4.0) < 1e-6 and abs(occ_b.sum() - 2.0) < 1e-6


def test_h2o_ccpvdz_literature_pin():
    """O + H cc-pVDZ data pinned to the published RHF energy.

    RHF/cc-pVDZ for water at the standard geometry (r(OH) = 0.9572 A,
    HOH = 104.52 deg) is -76.026799 Ha — one of the most-reproduced numbers
    in quantum chemistry.  A transcription error in any O or H primitive
    would miss by orders of magnitude more than the tolerance.
    """
    r, th = 0.9572, np.deg2rad(104.52)
    x, z = r * np.sin(th / 2), r * np.cos(th / 2)
    mol = Molecule([("O", (0, 0, 0)), ("H", (x, 0, z)), ("H", (-x, 0, z))], basis="cc-pvdz")
    assert mol.nao == 24
    e = rhf(mol).e_tot
    assert abs(e - (-76.026799)) < 2e-5


def test_co_ccpvdz_rhf_sanity():
    """Carbon cc-pVDZ data: CO RHF at the published basis-set grade.

    RHF/cc-pVDZ for CO near equilibrium is ~-112.749 Ha; plain 6-31G sits
    ~82 mHa above it.  (This window caught a real transcription error in the
    carbon s exponents: 7.495/2.797/0.5215 mistyped as 6.459/2.343/0.514
    cost 73 mHa here and 66 mHa on CH4.)
    """
    atoms = [("C", (0, 0, 0)), ("O", (1.1283, 0, 0))]
    e_dz = rhf(Molecule(atoms, basis="cc-pvdz")).e_tot
    e_631g = rhf(Molecule(atoms, basis="6-31g")).e_tot
    assert e_dz < e_631g - 0.05
    assert abs(e_dz - (-112.74928)) < 1e-3


def test_ch4_ccpvdz_literature_pin():
    """CH4 RHF/cc-pVDZ at r(CH) = 1.086 A: published grade ~-40.1986 Ha."""
    rc = 1.086 / np.sqrt(3.0)
    atoms = [("C", (0, 0, 0)), ("H", (rc, rc, rc)), ("H", (rc, -rc, -rc)),
             ("H", (-rc, rc, -rc)), ("H", (-rc, -rc, rc))]
    e = rhf(Molecule(atoms, basis="cc-pvdz")).e_tot
    assert abs(e - (-40.19865)) < 5e-4


def _strings_to_bool(strings: np.ndarray, norb: int) -> np.ndarray:
    shifts = np.arange(norb - 1, -1, -1)
    return ((np.asarray(strings, dtype=np.int64)[:, None] >> shifts) & 1).astype(bool)


def test_full_loop_28_orbitals(n2_ccpvdz):
    """The config-3 deliverable: self-consistent SQD over all 28 orbitals.

    Shots are synthesized from the exact ground state of a CAS(8o, 10e)
    window of the same cc-pVDZ problem (embedded into the 28-orbital frame
    with the 2 core orbitals occupied), plus SQD-style excitation noise —
    a physical stand-in for quantum-device samples.  56-bit shots exercise
    the multiword packed-string path end to end.
    """
    mf = n2_ccpvdz
    norb, nelec = 28, (7, 7)
    h1, eri, ecore = active_space_integrals(mf, ncas=norb, nelecas=14)
    assert abs(ecore - mf.e_nuc) < 1e-12  # no frozen core at ncas=28

    # window ground state for realistic shot amplitudes
    h1w, eriw, ecw = active_space_integrals(mf, ncas=8, nelecas=10)
    strs_w = all_hamming_strings(8, 5)
    res_w = solve_sci((strs_w, strs_w), h1w, eriw, 8, (5, 5), tol=1e-9)
    amps = np.asarray(res_w.sci_state.amplitudes)
    probs = (amps.reshape(-1) ** 2).astype(np.float64)
    probs /= probs.sum()
    rng = np.random.default_rng(77)
    addresses = rng.choice(probs.size, size=4_000, p=probs)
    ia, ib = np.divmod(addresses, amps.shape[1])
    ncore_w = 2  # window sits above 2 core orbitals
    core_mask = (1 << ncore_w) - 1

    def embed(window_strings):
        return (np.asarray(window_strings, dtype=np.int64) << ncore_w) | core_mask

    sa = embed(strs_w[ia])
    sb = embed(strs_w[ib])
    # excitation noise: scatter a few electrons into the d-dominated virtuals
    def excite(strings, n_moves):
        out = strings.copy()
        for _ in range(n_moves):
            rows = rng.integers(0, len(out), size=len(out) // 8)
            occ = rng.integers(ncore_w, 10, size=len(rows))
            virt = rng.integers(10, norb, size=len(rows))
            mask_ok = ((out[rows] >> occ) & 1).astype(bool) & ~(
                (out[rows] >> virt) & 1
            ).astype(bool)
            sel = rows[mask_ok]
            out[sel] ^= (np.int64(1) << occ[mask_ok]) | (np.int64(1) << virt[mask_ok])
        return out

    sa = excite(sa, 2)
    sb = excite(sb, 2)
    rows_bool = np.hstack(
        [_strings_to_bool(sb, norb), _strings_to_bool(sa, norb)]
    )
    bit_array = BitArray.from_bool_array(rows_bool)
    assert bit_array.num_bits == 56  # multiword regime

    energies = []

    def callback(results):
        energies.append(min(r.energy for r in results))

    result = diagonalize_fermionic_hamiltonian(
        h1,
        eri,
        bit_array,
        samples_per_batch=60,
        norb=norb,
        nelec=nelec,
        max_iterations=4,
        symmetrize_spin=True,
        callback=callback,
        seed=np.random.default_rng(99),
    )
    e_tot = result.energy + ecore
    # variational against RHF (the HF determinant is in every recovered batch)
    assert e_tot < mf.e_tot - 1e-3
    # ... but above any plausible N2 correlation energy at this basis
    assert e_tot > mf.e_tot - 0.45
    # the self-consistent iterations never move above the first batch solve
    assert min(energies) <= energies[0] + 1e-9
    # multiword state round-trip: occupancies sum to the electron counts
    occ_a, occ_b = result.sci_state.orbital_occupancies()
    assert abs(occ_a.sum() - nelec[0]) < 1e-6
    assert abs(occ_b.sum() - nelec[1]) < 1e-6
