# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Fused Pallas cross-spin matvec: interpret-mode exactness + dispatch wiring.

The kernel replaces PySCF's ``contract_2e`` C hot loop (reference
``fermion.py:513-515``); on CPU it runs in Pallas interpret mode, which
executes the same kernel program without Mosaic compilation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sqd_tpu.models.hubbard import hubbard_integrals
from sqd_tpu.ops import bitpack, dense_fci
from sqd_tpu.ops import pallas_matvec
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian
from sqd_tpu.ops.pallas_matvec import cross_spin_matvec, supports


@pytest.fixture(scope="module")
def ham_and_vec():
    norb, nelec = 8, (3, 3)
    h1, eri = hubbard_integrals(norb, u=4.0)
    # make the integrals generic (break Hubbard sparsity)
    rng = np.random.default_rng(3)
    h1 = h1 + 0.05 * _sym2(rng, norb)
    eri = eri + 0.05 * _sym4(rng, norb)
    allstr = dense_fci.all_hamming_strings(norb, 3)
    sel_a = np.sort(rng.choice(allstr, 48, replace=False))
    sel_b = np.sort(rng.choice(allstr, 40, replace=False))
    pa, pb = bitpack.pack_ints(sel_a, norb), bitpack.pack_ints(sel_b, norb)
    ham = build_sci_hamiltonian(
        pa, pb, h1, eri, norb, nelec, dtype=jnp.float32,
        pad_to=(48, 128), col_block=0,
    )
    m, n = ham.shape
    c = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    return ham, c


def _sym2(rng, norb):
    a = rng.normal(size=(norb, norb))
    return (a + a.T) / 2


def _sym4(rng, norb):
    e = rng.normal(size=(norb,) * 4)
    e = e + e.transpose(1, 0, 2, 3)
    e = e + e.transpose(0, 1, 3, 2)
    e = e + e.transpose(2, 3, 0, 1)
    return e / 8


def test_supports_shape_gates():
    assert supports(48, 128, 64)
    assert not supports(50, 128, 64)  # M not a multiple of 8
    assert not supports(48, 100, 64)  # N not a multiple of 128
    assert not supports(100_000, 128 * 1024, 256)  # way past VMEM


def test_interpret_matches_xla_cross_spin(ham_and_vec):
    ham, c = ham_and_vec
    ref = ham._matvec_full(c) - ham.apply_samespin_alpha(c) - ham.apply_samespin_beta(c)
    ka = -(-(3 * (8 - 3 + 1)) // 8) * 8  # ne*(norb-ne+1) rounded to 8
    out = cross_spin_matvec(
        c, ham.src_a, ham.sign_a, ham.src_b, ham.sign_b, ham.eri_t,
        ka=ka, interpret=True,
    )
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5 * max(scale, 1.0)


def test_dispatch_full_matvec_via_force_interpret(ham_and_vec, monkeypatch):
    """SCIHamiltonian.matvec routes through the kernel and stays exact."""
    ham, c = ham_and_vec
    ref = ham._matvec_full(c)
    monkeypatch.setattr(pallas_matvec, "FORCE_INTERPRET", True)
    assert ham._pallas_ok(c)
    out = ham.matvec(c)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5 * max(scale, 1.0)


def test_dispatch_spin_penalty_fused_in_coefficients(ham_and_vec, monkeypatch):
    """The S^2 penalty rides the kernel via the modified coefficient matrix."""
    import dataclasses

    ham, c = ham_and_vec
    ham_p = dataclasses.replace(ham, spin_shift=0.35, spin_target=2.0)
    ref = ham_p._matvec_full(c)
    monkeypatch.setattr(pallas_matvec, "FORCE_INTERPRET", True)
    out = ham_p.matvec(c)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5 * max(scale, 1.0)


def test_dispatch_off_on_cpu_by_default(ham_and_vec):
    ham, c = ham_and_vec
    assert jax.default_backend() == "cpu"
    assert not ham._pallas_ok(c)  # no FORCE_INTERPRET -> XLA path on CPU


def test_dispatch_requires_f32(ham_and_vec, monkeypatch):
    ham, c = ham_and_vec
    monkeypatch.setattr(pallas_matvec, "FORCE_INTERPRET", True)
    assert not ham._pallas_ok(c.astype(jnp.float64))
