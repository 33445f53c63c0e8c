# (C) 2026. Licensed under the Apache License, Version 2.0.
"""End-to-end SQD on a real molecule (N2/STO-3G), mirroring the reference.

Two oracles from the reference repo:

* the quickstart loop — uniform random samples driven to the exact FCI
  energy -107.652521 Ha (``/root/reference/docs/guides/quickstart.ipynb``
  cell 6);
* the integration-test pattern — shots sampled from the exact ground-state
  distribution plus uniform noise, recovered in few iterations
  (``/root/reference/test/test_fermion.py:87-125``), with real molecular
  integrals from :mod:`sqd_tpu.chem` instead of PySCF.
"""

from __future__ import annotations

import numpy as np
import pytest

from sqd_tpu.chem import Molecule, active_space_integrals, rhf
from sqd_tpu.counts import generate_bit_array_uniform
from sqd_tpu.fermion import diagonalize_fermionic_hamiltonian, solve_sci
from sqd_tpu.ops.dense_fci import all_hamming_strings
from sqd_tpu.primitives import BitArray

EXACT_TOTAL = -107.652521  # quickstart.ipynb cell-6 printed FCI energy


@pytest.fixture(scope="module")
def n2_cas():
    mol = Molecule([("N", (0, 0, 0)), ("N", (0, 0, 1.09768))], basis="sto-3g")
    mf = rhf(mol)
    h1, eri, ecore = active_space_integrals(mf, ncas=8, nelecas=10)
    return h1, eri, ecore


def _strings_to_bool(strings: np.ndarray, norb: int) -> np.ndarray:
    """Integer strings -> bool rows [s_{norb-1} ... s_0] (MSB left)."""
    shifts = np.arange(norb - 1, -1, -1)
    return ((np.asarray(strings)[:, None] >> shifts) & 1).astype(bool)


def test_quickstart_reproduction(n2_cas):
    """Uniform samples -> SQD loop -> exact FCI energy (quickstart cell 6)."""
    h1, eri, ecore = n2_cas
    rng = np.random.default_rng(24)
    bit_array = generate_bit_array_uniform(10_000, 16, rand_seed=rng)
    energies = []

    def callback(results):
        energies.append(min(r.energy for r in results) + ecore)

    result = diagonalize_fermionic_hamiltonian(
        h1,
        eri,
        bit_array,
        samples_per_batch=50,
        norb=8,
        nelec=(5, 5),
        occupancies_tol=1e-7,
        max_iterations=30,
        symmetrize_spin=True,
        callback=callback,
        seed=np.random.default_rng(32),
    )
    e_tot = result.energy + ecore
    # the loop converges onto the full CAS space -> exact FCI energy
    assert abs(e_tot - EXACT_TOTAL) < 5e-7, (e_tot, energies)
    # the reference stream reaches it by iteration 6-7 at samples_per_batch=20
    # (quickstart cell 6); at 50 samples/batch any stream covers the CAS space
    # within a few iterations
    assert len(energies) <= 8


def test_integration_oracle_sampled_ground_state(n2_cas):
    """Ground-state shots + uniform noise -> recover the exact energy.

    Port of the reference integration oracle
    (``/root/reference/test/test_fermion.py:87-125``): 10k shots drawn from
    the exact FCI ground-state distribution, 2k uniform-noise shots,
    5 recovery iterations at a small ``samples_per_batch``.
    """
    h1, eri, ecore = n2_cas
    norb, nelec = 8, (5, 5)
    strs = all_hamming_strings(norb, 5)
    exact = solve_sci((strs, strs), h1, eri, norb, nelec, tol=1e-10)
    exact_energy = exact.energy + ecore
    assert abs(exact_energy - EXACT_TOTAL) < 5e-7

    rng = np.random.default_rng(1234)
    amps = exact.sci_state.amplitudes
    probs = (amps.reshape(-1) ** 2).astype(np.float64)
    probs /= probs.sum()
    addresses = rng.choice(probs.size, size=10_000, p=probs)
    ia, ib = np.divmod(addresses, amps.shape[1])
    rows = np.hstack(
        [_strings_to_bool(strs[ib], norb), _strings_to_bool(strs[ia], norb)]
    )
    ground_shots = BitArray.from_bool_array(rows)
    noise_shots = generate_bit_array_uniform(2_000, 2 * norb, rand_seed=rng)
    all_rows = np.vstack(
        [np.asarray(ground_shots.to_bool_array()), np.asarray(noise_shots.to_bool_array())]
    )
    bit_array = BitArray.from_bool_array(all_rows)

    result = diagonalize_fermionic_hamiltonian(
        h1,
        eri,
        bit_array,
        samples_per_batch=15,
        norb=norb,
        nelec=nelec,
        max_iterations=5,
        symmetrize_spin=True,
        seed=rng,
    )
    sci_dim = int(np.prod(result.sci_state.amplitudes.shape))
    assert sci_dim < 0.5 * probs.size  # subspace much smaller than FCI
    # the reference oracle asserts 2 decimal places (assertAlmostEqual)
    assert abs(result.energy + ecore - exact_energy) < 5e-3
    assert abs(result.sci_state.spin_square()) < 0.01
