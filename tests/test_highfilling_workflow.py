# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Full SQD orchestrator at the [4Fe-4S]-class SHAPE: 36 orbitals, 27+27 e.

The other workflow tests run at norb <= 16 (single packed word, low
filling).  This one drives ``diagonalize_fermionic_hamiltonian`` end-to-end
at 36 orbitals — multiword (2 uint32) strings, 72-bit shot bitstrings, the
intersection-driven same-spin build, the auto ERI factor, and the
high-filling table-cache gate — on a small synthetic PSD problem so the
loop stays CPU-sized.
"""

import numpy as np
import pytest

from sqd_tpu import fermion
from sqd_tpu.primitives import BitArray

NORB = 36
NELEC = (27, 27)


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(3)
    orb_e = np.linspace(-10.0, 3.0, NORB)
    h1 = np.diag(orb_e) + 0.03 * rng.normal(size=(NORB, NORB))
    h1 = (h1 + h1.T) / 2
    chol = rng.normal(size=(2 * NORB, NORB, NORB)) * (0.3 / np.sqrt(2 * NORB))
    chol = (chol + chol.transpose(0, 2, 1)) / 2
    eri = np.einsum("xpq,xrs->pqrs", chol, chol)
    return h1, eri


def _cluster_strings(count, seed):
    rng = np.random.default_rng(seed)
    hf = (1 << NELEC[0]) - 1
    seen = {hf}
    frontier = [hf]
    while len(seen) < count:
        base = frontier[rng.integers(len(frontier))]
        occ = [p for p in range(NORB) if (base >> p) & 1]
        virt = [p for p in range(NORB) if not (base >> p) & 1]
        new = base ^ (1 << occ[rng.integers(len(occ))]) ^ (1 << virt[rng.integers(len(virt))])
        if new not in seen:
            seen.add(new)
            frontier.append(new)
    return sorted(seen)


def _det_to_bits(sa: int, sb: int) -> np.ndarray:
    row = np.zeros(2 * NORB, dtype=bool)
    for p in range(NORB):
        if (int(sb) >> p) & 1:
            row[NORB - 1 - p] = True
        if (int(sa) >> p) & 1:
            row[2 * NORB - 1 - p] = True
    return row


def test_sqd_loop_36_orbitals(system):
    h1, eri = system
    rng = np.random.default_rng(11)
    pool = _cluster_strings(40, 1)
    rows = [
        _det_to_bits(pool[rng.integers(len(pool))], pool[rng.integers(len(pool))])
        for _ in range(1500)
    ]
    bit_array = BitArray.from_bool_array(np.array(rows))

    history = []
    result = fermion.diagonalize_fermionic_hamiltonian(
        h1,
        eri,
        bit_array,
        samples_per_batch=25,
        norb=NORB,
        nelec=NELEC,
        num_batches=2,
        max_iterations=2,
        seed=5,
        callback=history.append,
    )
    assert np.isfinite(result.energy)
    occ_a, occ_b = result.orbital_occupancies
    assert np.isclose(occ_a.sum(), NELEC[0], atol=1e-5)
    assert np.isclose(occ_b.sum(), NELEC[1], atol=1e-5)
    assert len(history) >= 1
    # strings survived the 72-bit round trip: all have the right filling
    strs_a = result.sci_state.ci_strs_a
    assert all(bin(int(s)).count("1") == NELEC[0] for s in strs_a)
    # variational sanity: adding iteration-2's subspace can't raise energy
    # above the HF-cluster diagonal minimum scale
    assert result.energy < float(np.diag(h1)[:27].sum()) + 50.0
