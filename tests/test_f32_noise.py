# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Quantify f32-solver noise against the orchestrator's convergence tolerances.

Above 200k determinants ``solve_sci`` defaults to f32 Davidson iterations;
occupancies are FIRST-order in the residual, so their error can exceed the
orchestrator's default ``occupancies_tol = 1e-5`` and decide convergence by
noise.  These tests pin the noise floor at ~1e5 determinants and verify the
default ``refine_iterations`` policy keeps the production path below it.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sqd_tpu import fermion
from sqd_tpu.ops import dense_fci


@pytest.fixture(scope="module")
def big_system():
    """~8.2e4-determinant problem (norb=13, 286 strings/spin)."""
    norb = 13
    rng = np.random.default_rng(17)
    orb_e = np.linspace(-8.0, 2.0, norb)
    h1 = np.diag(orb_e) + 0.05 * rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2
    chol = rng.normal(size=(2 * norb, norb, norb)) * (0.5 / np.sqrt(2 * norb))
    chol = (chol + chol.transpose(0, 2, 1)) / 2
    eri = np.einsum("xpq,xrs->pqrs", chol, chol)
    strs = dense_fci.all_hamming_strings(norb, 3)
    return h1, eri, norb, (3, 3), strs


@pytest.fixture(scope="module")
def solves(big_system):
    h1, eri, norb, nelec, strs = big_system
    ref = fermion.solve_sci(
        (strs, strs), h1, eri, norb=norb, nelec=nelec, solver_dtype=np.float64
    )
    raw32 = fermion.solve_sci(
        (strs, strs), h1, eri, norb=norb, nelec=nelec,
        solver_dtype=np.float32, refine_iterations=0,
    )
    refined32 = fermion.solve_sci(
        (strs, strs), h1, eri, norb=norb, nelec=nelec, solver_dtype=np.float32
    )  # default refine_iterations policy
    return ref, raw32, refined32


def test_f32_occupancy_noise_floor_documented(solves):
    """An UNREFINED f32 solve's occupancy error at ~1e5 dets.

    This pins the scale of the problem the adaptive refine default exists
    for: if this error were below occupancies_tol = 1e-5 the refinement
    would be unnecessary.  (If the solver improves to that point, fold the
    default back to 0 — this test flags it.)
    """
    ref, raw32, _ = solves
    docc = np.max(
        np.abs(np.ravel(ref.orbital_occupancies) - np.ravel(raw32.orbital_occupancies))
    )
    # raw f32 noise sits above the orchestrator's default occupancies_tol
    assert docc > 1e-7  # sanity: f32 noise is measurable at this scale
    print(f"raw f32 occupancy error: {docc:.2e}")


def test_default_refinement_beats_occupancies_tol(solves):
    """With the DEFAULT refine policy, f32 solves match f64 occupancies to
    below the orchestrator's occupancies_tol (no convergence-by-noise)."""
    ref, _, refined32 = solves
    docc = np.max(
        np.abs(np.ravel(ref.orbital_occupancies) - np.ravel(refined32.orbital_occupancies))
    )
    assert docc < 1e-5, docc


def test_default_refinement_energy_accuracy(solves):
    ref, raw32, refined32 = solves
    assert abs(refined32.energy - ref.energy) < 1e-8
    # the raw f32 energy is already second-order accurate; refinement must
    # never make it worse
    assert abs(refined32.energy - ref.energy) <= abs(raw32.energy - ref.energy) + 1e-12


def test_error_contract_second_scale_point():
    """The residual->observable contract (docs/design/davidson.md) holds a
    decade below the primary fixture: ~1.4e4 determinants (norb=10, 120
    strings/spin).  Pins BOTH halves: energy second-order (< 1e-8 Ha) and
    refined occupancies below the orchestrator's occupancies_tol."""
    norb = 10
    rng = np.random.default_rng(23)
    orb_e = np.linspace(-6.0, 2.0, norb)
    h1 = np.diag(orb_e) + 0.05 * rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2
    chol = rng.normal(size=(2 * norb, norb, norb)) * (0.5 / np.sqrt(2 * norb))
    chol = (chol + chol.transpose(0, 2, 1)) / 2
    eri = np.einsum("xpq,xrs->pqrs", chol, chol)
    strs = dense_fci.all_hamming_strings(norb, 3)

    ref = fermion.solve_sci(
        (strs, strs), h1, eri, norb=norb, nelec=(3, 3), solver_dtype=np.float64
    )
    refined32 = fermion.solve_sci(
        (strs, strs), h1, eri, norb=norb, nelec=(3, 3), solver_dtype=np.float32
    )
    assert abs(refined32.energy - ref.energy) < 1e-8
    docc = np.max(
        np.abs(np.ravel(ref.orbital_occupancies) - np.ravel(refined32.orbital_occupancies))
    )
    assert docc < 1e-5, docc
