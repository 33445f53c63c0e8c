# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Reference API-parity details: error paths, container methods, edge cases."""

import numpy as np
import pytest

from sqd_tpu import fermion
from sqd_tpu.models.hubbard import hubbard_integrals
from sqd_tpu.ops import dense_fci
from sqd_tpu.primitives import BitArray


@pytest.fixture(scope="module")
def small_system():
    h1, eri = hubbard_integrals(4, u=3.0)
    strs = dense_fci.all_hamming_strings(4, 2)
    rows = []
    rng = np.random.default_rng(0)
    for _ in range(300):
        row = np.zeros(8, dtype=bool)
        row[rng.choice(4, 2, replace=False)] = True
        row[4 + rng.choice(4, 2, replace=False)] = True
        rows.append(row)
    return h1, eri, BitArray.from_bool_array(np.array(rows)), strs


def test_max_iterations_validation(small_system):
    h1, eri, ba, _ = small_system
    with pytest.raises(ValueError, match="at least 1"):
        fermion.diagonalize_fermionic_hamiltonian(
            h1, eri, ba, samples_per_batch=5, norb=4, nelec=(2, 2), max_iterations=0
        )


def test_symmetrize_max_dim_mismatch(small_system):
    h1, eri, ba, _ = small_system
    with pytest.raises(ValueError, match="maximum dimension"):
        fermion.diagonalize_fermionic_hamiltonian(
            h1,
            eri,
            ba,
            samples_per_batch=5,
            norb=4,
            nelec=(2, 2),
            symmetrize_spin=True,
            max_dim=(3, 5),
        )


def test_include_configurations_tuple_form(small_system):
    h1, eri, ba, strs = small_system
    inc_a = [int(strs[0])]
    inc_b = [int(strs[1])]
    result = fermion.diagonalize_fermionic_hamiltonian(
        h1,
        eri,
        ba,
        samples_per_batch=3,
        norb=4,
        nelec=(2, 2),
        max_iterations=1,
        include_configurations=(inc_a, inc_b),
        seed=0,
    )
    assert int(strs[0]) in result.sci_state.ci_strs_a
    assert int(strs[1]) in result.sci_state.ci_strs_b


def test_scistate_shape_validation():
    with pytest.raises(ValueError, match="amplitudes"):
        fermion.SCIState(
            np.zeros((2, 3)),
            np.array([1, 2, 4]),
            np.array([1, 2]),
            norb=3,
            nelec=(1, 1),
        )


def test_scistate_rdm_rank_error():
    state = fermion.SCIState(np.eye(2), np.array([1, 2]), np.array([1, 2]), norb=2, nelec=(1, 1))
    with pytest.raises(NotImplementedError, match="rank 3"):
        state.rdm(rank=3)


def test_scistate_rdm_methods_consistent(small_system):
    """SCIState.rdm: spin-summed equals the sum of spin-resolved blocks."""
    h1, eri, _, strs = small_system
    res = fermion.solve_sci((strs, strs), h1, eri, norb=4, nelec=(2, 2))
    state = res.sci_state
    dm1s = state.rdm(rank=1, spin_summed=False)
    dm1 = state.rdm(rank=1, spin_summed=True)
    np.testing.assert_allclose(dm1s[0] + dm1s[1], dm1, atol=1e-12)
    dm2aa, dm2ab, dm2bb = state.rdm(rank=2, spin_summed=False)
    dm2 = state.rdm(rank=2, spin_summed=True)
    np.testing.assert_allclose(
        dm2aa + dm2bb + dm2ab + dm2ab.transpose(2, 3, 0, 1), dm2, atol=1e-10
    )
    occ_a, occ_b = state.orbital_occupancies()
    np.testing.assert_allclose(occ_a, np.diagonal(dm1s[0]), atol=1e-12)
    # energy from the state's own RDMs equals the solver energy
    e = np.einsum("pq,pq->", dm1, h1) + 0.5 * np.einsum("pqrs,pqrs->", dm2, eri)
    assert abs(e - res.energy) < 1e-9


def test_check_ci_strs_hamming_mismatch():
    with pytest.raises(ValueError, match="hamming weight"):
        fermion.solve_fermion(
            (np.array([3, 7]), np.array([3, 5])),  # 3 has weight 2, 7 has 3
            np.zeros((4, 4)),
            np.zeros((4,) * 4),
        )


def test_solve_sci_batch_multiple(small_system):
    h1, eri, _, strs = small_system
    rng = np.random.default_rng(1)
    batches = []
    for _ in range(3):
        sel = np.sort(rng.choice(strs, 4, replace=False))
        batches.append((sel, sel))
    results = fermion.solve_sci_batch(batches, h1, eri, 4, (2, 2))
    assert len(results) == 3
    for (sa, sb), r in zip(batches, results):
        h_proj = dense_fci.build_dense_hamiltonian(sa, sb, h1, eri)
        assert abs(r.energy - np.linalg.eigvalsh(h_proj)[0]) < 1e-8


def test_qubit_verbose_smoke(capsys):
    from sqd_tpu import qubit
    from sqd_tpu.models.heisenberg import heisenberg_ring

    rng = np.random.default_rng(0)
    mat = qubit.sort_and_remove_duplicates(rng.integers(0, 2, (10, 4)).astype(bool))
    op = heisenberg_ring(4)
    qubit.project_operator_to_subspace(mat, op, verbose=True)
    captured = capsys.readouterr()
    assert "Projecting term" in captured.out


def test_recover_empty_probabilities_edge():
    from sqd_tpu.configuration_recovery import recover_configurations

    out, probs = recover_configurations(
        np.empty((0, 8), dtype=bool), np.array([]), (np.zeros(4), np.zeros(4)), 2, 2
    )
    assert out.size == 0


def test_check_ci_strs_negative_input_counts_magnitude_bits():
    """Malformed negative CI strings report magnitude popcounts (advisor
    round-4 finding: pack_ints would two's-complement -1 into weight 64)."""
    with pytest.raises(ValueError, match="hamming weight 1, but CI string in index 1 has hamming weight 2"):
        fermion.solve_fermion(
            (np.array([-1, 3]), np.array([3, 3])),
            np.zeros((4, 4)),
            np.zeros((4,) * 4),
        )
