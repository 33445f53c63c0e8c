# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Model-family tests: Hubbard, Heisenberg/TFIM, FCIDUMP interchange."""

import numpy as np

from sqd_tpu import fermion
from sqd_tpu.models.fcidump import read_fcidump, write_fcidump
from sqd_tpu.models.heisenberg import heisenberg_ring, transverse_field_ising
from sqd_tpu.models.hubbard import hubbard_2d_integrals, hubbard_integrals
from sqd_tpu.ops import dense_fci


def test_hubbard_dimer_analytic():
    """Hubbard dimer (2 sites, U, half filling): E0 = U/2 - sqrt((U/2)^2 + 4t^2)."""
    u, t = 4.0, 1.0
    h1, eri = hubbard_integrals(2, u=u, t=t, periodic=False)
    strs = dense_fci.all_hamming_strings(2, 1)
    res = fermion.solve_sci((strs, strs), h1, eri, norb=2, nelec=(1, 1))
    expected = u / 2 - np.sqrt((u / 2) ** 2 + 4 * t**2)
    assert abs(res.energy - expected) < 1e-10


def test_hubbard_ring_full_ci():
    """6-site Hubbard ring at half filling vs dense diagonalization."""
    h1, eri = hubbard_integrals(6, u=4.0)
    strs = dense_fci.all_hamming_strings(6, 3)
    res = fermion.solve_sci((strs, strs), h1, eri, norb=6, nelec=(3, 3))
    h_dense = dense_fci.build_dense_hamiltonian(strs, strs, h1, eri)
    e_exact = np.linalg.eigvalsh(h_dense)[0]
    assert abs(res.energy - e_exact) < 1e-8


def test_hubbard_2d_shape():
    h1, eri = hubbard_2d_integrals(3, 2, u=2.0)
    assert h1.shape == (6, 6)
    # each interior site couples to right and down neighbors
    assert h1[0, 1] == -1.0 and h1[0, 3] == -1.0
    assert eri[2, 2, 2, 2] == 2.0


def test_heisenberg_term_count():
    op = heisenberg_ring(5, h_z=0.1)
    # 5 bonds x 3 couplings + 5 fields
    assert op.size == 20
    op_open = heisenberg_ring(5, periodic=False)
    assert op_open.size == 12


def test_tfim_exact_small():
    """TFIM dense matrix sanity: 2 sites, J=1, h=0 -> eigenvalues -1,-1,1,1."""
    op = transverse_field_ising(2, j_zz=1.0, h_x=0.0)
    vals = np.linalg.eigvalsh(op.to_matrix())
    np.testing.assert_allclose(vals, [-1, -1, 1, 1], atol=1e-12)


def test_fcidump_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    norb = 4
    h1 = rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2
    eri = rng.normal(size=(norb,) * 4)
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    eri = eri / 8
    path = tmp_path / "test.fcidump"
    write_fcidump(path, h1, eri, nelec=(2, 1), ecore=-3.25)
    data = read_fcidump(path)
    assert data["norb"] == norb
    assert data["nelec"] == (2, 1)
    assert data["ms2"] == 1
    assert abs(data["ecore"] - (-3.25)) < 1e-12
    np.testing.assert_allclose(data["h1e"], h1, atol=1e-12)
    np.testing.assert_allclose(data["eri"], eri, atol=1e-12)


def test_fcidump_energy_preserved(tmp_path):
    """Ground-state energy identical before/after an FCIDUMP round trip."""
    h1, eri = hubbard_integrals(4, u=3.0)
    path = tmp_path / "hub.fcidump"
    write_fcidump(path, h1, eri, nelec=(2, 2))
    data = read_fcidump(path)
    strs = dense_fci.all_hamming_strings(4, 2)
    r1 = fermion.solve_sci((strs, strs), h1, eri, norb=4, nelec=(2, 2))
    r2 = fermion.solve_sci((strs, strs), data["h1e"], data["eri"], norb=4, nelec=(2, 2))
    assert abs(r1.energy - r2.energy) < 1e-10
