# (C) 2026. Licensed under the Apache License, Version 2.0.
"""d-shell integral-engine validation (the cc-pVDZ prerequisite).

The McMurchie-Davidson engine (``sqd_tpu/chem/integrals.py``) is pinned for
s/p shells by the reference's published N2 energies (``tests/test_chem.py``);
nothing in the reference exercises l = 2.  These tests validate the d path
independently:

* overlap/kinetic blocks against a from-scratch binomial-expansion evaluator
  (Gaussian product theorem + even-moment formula — a different algorithm
  from the engine's Hermite recursion);
* rotational invariance of the full RHF energy (one-electron AND two-electron
  d integrals enter; any component-normalization or recursion-order bug
  breaks it);
* the Cartesian->real-solid-harmonic transform (unit-diagonal overlap, 5 AOs
  per d shell).
"""

from __future__ import annotations

import numpy as np
import pytest

from sqd_tpu.chem import Molecule, rhf
from sqd_tpu.chem.integrals import (
    _CART,
    _ShellPair,
    _overlap_kinetic_block,
    Shell,
    ao_integrals,
)


def _df(n: int) -> float:
    """(n)!! with (-1)!! = 1."""
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


def _overlap_1d(i: int, j: int, a: float, b: float, ax: float, bx: float) -> float:
    """1D primitive overlap by binomial expansion about the product center."""
    p = a + b
    px = (a * ax + b * bx) / p
    k = np.exp(-a * b / p * (ax - bx) ** 2)
    acc = 0.0
    from math import comb

    for m in range(i + 1):
        for n in range(j + 1):
            if (m + n) % 2:
                continue
            acc += (
                comb(i, m)
                * comb(j, n)
                * (px - ax) ** (i - m)
                * (px - bx) ** (j - n)
                * _df(m + n - 1)
                / (2.0 * p) ** ((m + n) // 2)
            )
    return k * acc * np.sqrt(np.pi / p)


def _overlap_cart(la, lb, a, b, ra, rb):
    """Full primitive Cartesian overlap block, independent evaluator."""
    out = np.zeros((len(_CART[la]), len(_CART[lb])))
    for ia, ca in enumerate(_CART[la]):
        for ib, cb in enumerate(_CART[lb]):
            out[ia, ib] = np.prod(
                [_overlap_1d(ca[d], cb[d], a, b, ra[d], rb[d]) for d in range(3)]
            )
    return out


def _kinetic_cart(la, lb, a, b, ra, rb):
    """Kinetic block from overlaps via the standard derivative relation."""
    out = np.zeros((len(_CART[la]), len(_CART[lb])))
    for ia, ca in enumerate(_CART[la]):
        for ib, cb in enumerate(_CART[lb]):
            t = 0.0
            for d in range(3):
                i, j = ca[d], cb[d]
                td = b * (2 * j + 1) * _overlap_1d(i, j, a, b, ra[d], rb[d])
                td -= 2.0 * b**2 * _overlap_1d(i, j + 2, a, b, ra[d], rb[d])
                if j >= 2:
                    td -= 0.5 * j * (j - 1) * _overlap_1d(i, j - 2, a, b, ra[d], rb[d])
                s_other = np.prod(
                    [
                        _overlap_1d(ca[e], cb[e], a, b, ra[e], rb[e])
                        for e in range(3)
                        if e != d
                    ]
                )
                t += td * s_other
            out[ia, ib] = t
    return out


@pytest.mark.parametrize(
    "la,lb",
    [(2, 0), (2, 1), (2, 2)],
)
def test_d_overlap_kinetic_vs_binomial_oracle(la, lb):
    ra = np.array([0.1, -0.3, 0.45])
    rb = np.array([-0.6, 0.2, 0.9])
    a_exp, b_exp = 0.83, 1.27
    sa = Shell(la, ra, np.array([a_exp]), np.array([1.0]))
    sb = Shell(lb, rb, np.array([b_exp]), np.array([1.0]))
    sp = _ShellPair(sa, sb, extra_j=2)
    b_flat = np.array([b_exp])
    s_eng, t_eng = _overlap_kinetic_block(sp, b_flat)
    s_ref = _overlap_cart(la, lb, a_exp, b_exp, ra, rb)
    t_ref = _kinetic_cart(la, lb, a_exp, b_exp, ra, rb)
    np.testing.assert_allclose(s_eng, s_ref, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(t_eng, t_ref, rtol=1e-12, atol=1e-13)


def test_spherical_d_shell_counts_and_normalization():
    mol = Molecule([("N", (0, 0, 0))], basis="cc-pvdz")
    # [3s 2p 1d] -> 3 + 6 + 5 = 14 spherical AOs (15 Cartesian)
    assert mol.nao == 14
    assert mol.nao_cart == 15
    S, T, V, eri = ao_integrals(mol)
    assert S.shape == (14, 14)
    np.testing.assert_allclose(np.diag(S), 1.0, atol=1e-12)
    assert np.linalg.eigvalsh(S)[0] > 0
    # ERI of a real basis is PSD as a (pq),(rs) matrix
    m = eri.reshape(14 * 14, -1)
    np.testing.assert_allclose(m, m.T, atol=1e-12)
    assert np.linalg.eigvalsh(m)[0] > -1e-10


def test_rhf_rotation_invariance_with_d_shells():
    """Full RHF energy (one- AND two-electron d integrals) under rotation."""

    def nh_energy(axis):
        axis = np.asarray(axis, float)
        axis /= np.linalg.norm(axis)
        mol = Molecule(
            [("N", (0, 0, 0)), ("H", tuple(1.04 * axis))], basis="cc-pvdz"
        )
        return rhf(mol).e_tot

    e_z = nh_energy([0.0, 0.0, 1.0])
    e_r = nh_energy([0.36, -0.48, 0.8])
    assert abs(e_z - e_r) < 1e-9, (e_z, e_r)


def test_translation_invariance_with_d_shells():
    mol1 = Molecule([("N", (0, 0, 0))], basis="cc-pvdz")
    mol2 = Molecule([("N", (0.7, -1.1, 0.4))], basis="cc-pvdz")
    S1, T1, _, _ = ao_integrals(mol1)
    S2, T2, _, _ = ao_integrals(mol2)
    np.testing.assert_allclose(S1, S2, atol=1e-13)
    np.testing.assert_allclose(T1, T2, atol=1e-13)
