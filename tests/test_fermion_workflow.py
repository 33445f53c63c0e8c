# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Integration tests for the SQD orchestrator.

Mirrors the reference test strategy (test/test_fermion.py): build an exact
ground state for a small random Hamiltonian (our dense oracle plays PySCF's
role), sample bitstrings from its |amplitude|^2 distribution plus uniform
noise, and assert the self-consistent loop recovers the exact energy.
"""

import numpy as np
import pytest

from sqd_tpu import fermion
from sqd_tpu.ops import dense_fci
from sqd_tpu.primitives import BitArray

NORB = 6
NELEC = (3, 3)


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(42)
    h1 = rng.normal(size=(NORB, NORB))
    h1 = (h1 + h1.T) / 2
    eri = rng.normal(size=(NORB,) * 4) * 0.2
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    eri = eri / 8
    strs = dense_fci.all_hamming_strings(NORB, NELEC[0])
    h_dense = dense_fci.build_dense_hamiltonian(strs, strs, h1, eri)
    evals, evecs = np.linalg.eigh(h_dense)
    return {
        "h1": h1,
        "eri": eri,
        "strs": strs,
        "e_exact": evals[0],
        "gs": evecs[:, 0],
    }


def _det_to_bits(sa: int, sb: int, norb: int) -> np.ndarray:
    """(alpha, beta) CI strings -> bitstring row [b_N..b_0, a_N..a_0]."""
    row = np.zeros(2 * norb, dtype=bool)
    for p in range(norb):
        if (int(sb) >> p) & 1:
            row[norb - 1 - p] = True
        if (int(sa) >> p) & 1:
            row[2 * norb - 1 - p] = True
    return row


@pytest.fixture(scope="module")
def sampled_bit_array(system):
    """10k shots from the exact ground-state distribution + 2k uniform noise."""
    rng = np.random.default_rng(7)
    strs = system["strs"]
    n = len(strs)
    probs = np.abs(system["gs"].reshape(-1)) ** 2
    probs = probs / probs.sum()
    draws = rng.choice(n * n, size=10_000, p=probs)
    rows = [_det_to_bits(strs[d // n], strs[d % n], NORB) for d in draws]
    rows += list(rng.integers(0, 2, size=(2_000, 2 * NORB)).astype(bool))
    return BitArray.from_bool_array(np.array(rows))


def test_sqd_loop_recovers_exact_energy(system, sampled_bit_array):
    history = []
    result = fermion.diagonalize_fermionic_hamiltonian(
        system["h1"],
        system["eri"],
        sampled_bit_array,
        samples_per_batch=60,
        norb=NORB,
        nelec=NELEC,
        num_batches=2,
        max_iterations=5,
        seed=12,
        callback=history.append,
    )
    # variational: projected energy can't go below exact
    assert result.energy >= system["e_exact"] - 1e-9
    assert abs(result.energy - system["e_exact"]) < 1e-2
    assert len(history) >= 1 and all(len(batch) == 2 for batch in history)
    occ_a, occ_b = result.orbital_occupancies
    assert np.isclose(occ_a.sum(), NELEC[0], atol=1e-6)
    assert np.isclose(occ_b.sum(), NELEC[1], atol=1e-6)
    assert result.rdm1.shape == (NORB, NORB)
    assert result.rdm2.shape == (NORB,) * 4


def test_sqd_loop_seed_reproducible(system, sampled_bit_array):
    kwargs = dict(
        samples_per_batch=40,
        norb=NORB,
        nelec=NELEC,
        num_batches=2,
        max_iterations=3,
        seed=99,
    )
    r1 = fermion.diagonalize_fermionic_hamiltonian(
        system["h1"], system["eri"], sampled_bit_array, **kwargs
    )
    r2 = fermion.diagonalize_fermionic_hamiltonian(
        system["h1"], system["eri"], sampled_bit_array, **kwargs
    )
    assert r1.energy == r2.energy
    np.testing.assert_array_equal(r1.sci_state.ci_strs_a, r2.sci_state.ci_strs_a)
    np.testing.assert_array_equal(r1.sci_state.amplitudes, r2.sci_state.amplitudes)


def test_max_dim_truncation(system, sampled_bit_array):
    result = fermion.diagonalize_fermionic_hamiltonian(
        system["h1"],
        system["eri"],
        sampled_bit_array,
        samples_per_batch=60,
        norb=NORB,
        nelec=NELEC,
        max_iterations=2,
        max_dim=5,
        seed=3,
    )
    assert len(result.sci_state.ci_strs_a) <= 5
    assert len(result.sci_state.ci_strs_b) <= 5


def test_no_valid_bitstrings_raises_without_initial_occupancies(system):
    rng = np.random.default_rng(0)
    # all-ones rows: Hamming weight NORB on each half != 3
    rows = np.ones((50, 2 * NORB), dtype=bool)
    ba = BitArray.from_bool_array(rows)
    with pytest.raises(ValueError, match="did not contain any valid bitstrings"):
        fermion.diagonalize_fermionic_hamiltonian(
            system["h1"],
            system["eri"],
            ba,
            samples_per_batch=10,
            norb=NORB,
            nelec=NELEC,
            max_iterations=2,
            seed=0,
        )
    # but succeeds when given initial occupancies (recovery path repairs rows)
    result = fermion.diagonalize_fermionic_hamiltonian(
        system["h1"],
        system["eri"],
        ba,
        samples_per_batch=10,
        norb=NORB,
        nelec=NELEC,
        max_iterations=2,
        seed=0,
        initial_occupancies=(np.full(NORB, 0.5), np.full(NORB, 0.5)),
    )
    assert np.isfinite(result.energy)


def test_symmetrize_spin(system, sampled_bit_array):
    result = fermion.diagonalize_fermionic_hamiltonian(
        system["h1"],
        system["eri"],
        sampled_bit_array,
        samples_per_batch=40,
        norb=NORB,
        nelec=NELEC,
        num_batches=1,
        max_iterations=2,
        symmetrize_spin=True,
        seed=5,
    )
    np.testing.assert_array_equal(result.sci_state.ci_strs_a, result.sci_state.ci_strs_b)
    with pytest.raises(ValueError, match="Spin symmetrization"):
        fermion.diagonalize_fermionic_hamiltonian(
            system["h1"],
            system["eri"],
            sampled_bit_array,
            samples_per_batch=10,
            norb=NORB,
            nelec=(4, 2),
            symmetrize_spin=True,
        )


def test_include_configurations(system, sampled_bit_array):
    wanted = [int(system["strs"][0]), int(system["strs"][1])]
    result = fermion.diagonalize_fermionic_hamiltonian(
        system["h1"],
        system["eri"],
        sampled_bit_array,
        samples_per_batch=10,
        norb=NORB,
        nelec=NELEC,
        max_iterations=1,
        include_configurations=wanted,
        seed=1,
    )
    for w in wanted:
        assert w in result.sci_state.ci_strs_a
        assert w in result.sci_state.ci_strs_b


def test_scistate_save_load(tmp_path, system, sampled_bit_array):
    result = fermion.diagonalize_fermionic_hamiltonian(
        system["h1"],
        system["eri"],
        sampled_bit_array,
        samples_per_batch=20,
        norb=NORB,
        nelec=NELEC,
        max_iterations=1,
        seed=2,
    )
    path = tmp_path / "state.npz"
    result.sci_state.save(path)
    loaded = fermion.SCIState.load(path)
    np.testing.assert_array_equal(loaded.amplitudes, result.sci_state.amplitudes)
    np.testing.assert_array_equal(loaded.ci_strs_a, result.sci_state.ci_strs_a)
    assert loaded.norb == result.sci_state.norb
    assert tuple(loaded.nelec) == tuple(result.sci_state.nelec)


def test_solve_fermion_matches_dense_on_subspace(system):
    rng = np.random.default_rng(1)
    strs = system["strs"]
    sel = np.sort(rng.choice(strs, 8, replace=False))
    res_e, state, occ, ss = fermion.solve_fermion(
        (sel, sel), system["h1"], system["eri"]
    )
    h_proj = dense_fci.build_dense_hamiltonian(sel, sel, system["h1"], system["eri"])
    evals, evecs = np.linalg.eigh(h_proj)
    assert abs(res_e - evals[0]) < 1e-9
    # spin_square vs dense oracle
    s2 = dense_fci.build_dense_s2(sel, sel, NORB)
    gs = evecs[:, 0]
    assert abs(ss - gs @ s2 @ gs) < 1e-6


def test_solve_fermion_spin_penalty(system):
    """With a singlet target, the penalty steers to an S^2 ~ 0 state."""
    strs = system["strs"]
    res_e0, _, _, ss0 = fermion.solve_fermion(
        (strs, strs), system["h1"], system["eri"]
    )
    res_e, _, _, ss = fermion.solve_fermion(
        (strs, strs), system["h1"], system["eri"], spin_sq=0.0, shift=0.5
    )
    # full-space ground state of this random H happens to be spinful; the
    # penalized solve should find a lower-S^2 state
    assert ss <= ss0 + 1e-8


def test_enlarge_batch_from_transitions():
    mat = np.array([[True, False, True, False]])
    ops = np.array([["I", "I", "I", "I"], ["+", "-", "I", "I"], ["-", "I", "I", "I"]])
    out = fermion.enlarge_batch_from_transitions(mat, ops)
    tuples = {tuple(r) for r in out}
    assert (True, False, True, False) in tuples  # identity kept
    # '+' on an occupied mode is illegal -> that operator's row is dropped
    assert len(out) == 2
    # '-' on an occupied mode flips it off
    assert (False, False, True, False) in tuples


def test_orchestrator_beyond_63_orbitals():
    """Full loop at 33 orbitals (66-bit strings): multiword packing end-to-end."""
    from sqd_tpu.models.hubbard import hubbard_integrals

    norb, nelec = 33, (2, 2)
    h1, eri = hubbard_integrals(norb, u=2.0)
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(400):
        row = np.zeros(2 * norb, dtype=bool)
        row[rng.choice(8, 2, replace=False)] = True  # beta in first 8 orbitals
        row[norb + rng.choice(8, 2, replace=False)] = True
        rows.append(row)
    ba = BitArray.from_bool_array(np.array(rows))
    result = fermion.diagonalize_fermionic_hamiltonian(
        h1,
        eri,
        ba,
        samples_per_batch=15,
        norb=norb,
        nelec=nelec,
        max_iterations=2,
        seed=3,
    )
    assert np.isfinite(result.energy)
    assert result.sci_state.amplitudes.shape[0] == len(result.sci_state.ci_strs_a)
    occ_a, occ_b = result.orbital_occupancies
    assert np.isclose(occ_a.sum(), nelec[0], atol=1e-6)
