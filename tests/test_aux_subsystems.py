# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Auxiliary subsystems: loop checkpoint/resume, iteration logging (SURVEY §5)."""

import numpy as np
import pytest

from sqd_tpu import fermion
from sqd_tpu.models.hubbard import hubbard_integrals
from sqd_tpu.ops import dense_fci
from sqd_tpu.primitives import BitArray
from sqd_tpu.utils.tracing import IterationLogger

NORB = 6
NELEC = (3, 3)


@pytest.fixture(scope="module")
def system():
    h1, eri = hubbard_integrals(NORB, u=4.0)
    strs = dense_fci.all_hamming_strings(NORB, NELEC[0])
    h_dense = dense_fci.build_dense_hamiltonian(strs, strs, h1, eri)
    evals, evecs = np.linalg.eigh(h_dense)
    probs = np.abs(evecs[:, 0]) ** 2
    probs /= probs.sum()
    rng = np.random.default_rng(0)
    n = len(strs)
    draws = rng.choice(n * n, size=4000, p=probs)
    rows = []
    for d in draws:
        sa, sb = int(strs[d // n]), int(strs[d % n])
        row = np.zeros(2 * NORB, dtype=bool)
        for p in range(NORB):
            if (sb >> p) & 1:
                row[NORB - 1 - p] = True
            if (sa >> p) & 1:
                row[2 * NORB - 1 - p] = True
        rows.append(row)
    return h1, eri, BitArray.from_bool_array(np.array(rows))


def test_checkpoint_resume_bit_for_bit(tmp_path, system):
    """Interrupted run + resume == uninterrupted run, exactly."""
    h1, eri, ba = system
    common = dict(
        samples_per_batch=30,
        norb=NORB,
        nelec=NELEC,
        num_batches=2,
        seed=11,
        energy_tol=1e-12,
        occupancies_tol=1e-12,  # never converge early
    )
    full = fermion.diagonalize_fermionic_hamiltonian(
        h1, eri, ba, max_iterations=4, **common
    )
    ck = tmp_path / "loop.npz"
    # run only 2 iterations, checkpointing
    fermion.diagonalize_fermionic_hamiltonian(
        h1, eri, ba, max_iterations=2, checkpoint_path=ck, **common
    )
    assert ck.exists()
    # resume to 4 total iterations
    resumed = fermion.diagonalize_fermionic_hamiltonian(
        h1, eri, ba, max_iterations=4, checkpoint_path=ck, resume=True, **common
    )
    assert resumed.energy == full.energy
    np.testing.assert_array_equal(
        resumed.sci_state.ci_strs_a, full.sci_state.ci_strs_a
    )
    np.testing.assert_array_equal(resumed.sci_state.amplitudes, full.sci_state.amplitudes)


def test_iteration_logger(system):
    h1, eri, ba = system
    log = IterationLogger(log_level=None)
    fermion.diagonalize_fermionic_hamiltonian(
        h1,
        eri,
        ba,
        samples_per_batch=25,
        norb=NORB,
        nelec=NELEC,
        num_batches=3,
        max_iterations=3,
        seed=2,
        callback=log,
    )
    assert 1 <= len(log.history) <= 3
    for entry in log.history:
        assert len(entry["energies"]) == 3
        assert entry["best_energy"] == min(entry["energies"])
        assert entry["wall_seconds"] > 0
        assert all(len(d) == 2 for d in entry["subspace_dims"])
    assert log.energies == [h["best_energy"] for h in log.history]


def test_iteration_logger_emits_log_records(system, caplog):
    import logging

    h1, eri, ba = system
    log = IterationLogger(log_level=logging.INFO)
    with caplog.at_level(logging.INFO, logger="sqd_tpu"):
        fermion.diagonalize_fermionic_hamiltonian(
            h1, eri, ba, samples_per_batch=25, norb=NORB, nelec=NELEC,
            num_batches=2, max_iterations=1, seed=3, callback=log,
        )
    assert any("SQD iteration" in r.getMessage() for r in caplog.records)


def test_profile_trace_writes_a_trace(tmp_path):
    import jax.numpy as jnp

    from sqd_tpu.utils.tracing import profile_trace

    with profile_trace(str(tmp_path)):
        _ = float(jnp.sum(jnp.arange(8.0)))
    assert any(tmp_path.rglob("*"))  # trace events were written


def test_checkpoint_roundtrip_multiword(tmp_path):
    """Checkpoint format handles >= 63-orbital (object-int) carryover strings."""
    from sqd_tpu.utils.checkpoint import LoopCheckpoint, load_loop_state, save_loop_state

    norb = 70
    strs = np.array([(1 << 69) | 3, (1 << 64) | (1 << 32) | 1], dtype=object)
    ck = LoopCheckpoint(
        iteration=3,
        rng_state=np.random.default_rng(5).bit_generator.state,
        current_occupancies=(np.ones(norb) * 0.25, np.ones(norb) * 0.5),
        carryover_strings_a=strs,
        carryover_strings_b=strs[:1],
        best_energy=-1.25,
        best_state_blob={"amplitudes": np.eye(2)},
        best_occupancies=(np.zeros(norb), np.zeros(norb)),
        current_energy=-1.2,
        norb=norb,
    )
    path = tmp_path / "ck.npz"
    save_loop_state(path, ck)
    loaded = load_loop_state(path)
    assert loaded.iteration == 3
    assert [int(x) for x in loaded.carryover_strings_a] == [int(x) for x in strs]
    assert loaded.best_energy == -1.25
    assert loaded.current_energy == -1.2
    np.testing.assert_array_equal(loaded.best_state_blob["amplitudes"], np.eye(2))
    # rng state restores and generates identically
    r1 = np.random.default_rng(5)
    r2 = np.random.default_rng(0)
    r2.bit_generator.state = loaded.rng_state
    assert r1.integers(0, 1 << 30) == r2.integers(0, 1 << 30)
