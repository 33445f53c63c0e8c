# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Native C++ McMurchie-Davidson kernel vs the NumPy reference path.

The NumPy path is itself pinned to the reference's published N2 energies
(``tests/test_chem.py``) and to the independent binomial-expansion oracle
(``tests/test_chem_d.py``); the native kernel must reproduce it to machine
precision on both s/p-only and d-shell bases, plus fall back cleanly.
"""

from __future__ import annotations

import numpy as np
import pytest

from sqd_tpu import native
from sqd_tpu.chem import Molecule
from sqd_tpu.chem.integrals import Shell, ao_integrals

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.mark.parametrize(
    "atoms,basis",
    [
        ([("N", (0, 0, 0)), ("H", (0.9, 0.15, -0.2))], "sto-3g"),
        ([("N", (0, 0, 0)), ("H", (0.3, 0.8, 0.55))], "cc-pvdz"),
    ],
)
def test_native_matches_numpy(atoms, basis):
    mol = Molecule(atoms, basis=basis)
    sn, tn, vn, erin = ao_integrals(mol, backend="native")
    sp_, tp, vp, erip = ao_integrals(mol, backend="numpy")
    np.testing.assert_allclose(sn, sp_, atol=1e-13)
    np.testing.assert_allclose(tn, tp, atol=1e-12)
    np.testing.assert_allclose(vn, vp, atol=5e-13)
    np.testing.assert_allclose(erin, erip, atol=1e-13)


def test_unknown_backend_rejected():
    mol = Molecule([("H", (0, 0, 0)), ("H", (0.74, 0, 0))], basis="sto-3g")
    with pytest.raises(ValueError, match="unknown backend"):
        ao_integrals(mol, backend="cuda")


def test_high_l_falls_back_to_numpy():
    """An l=3 shell is beyond the native kernel's LMAX -> wrapper declines."""
    sh = Shell(3, np.zeros(3), np.array([1.0]), np.array([1.0]))
    assert native.ao_integrals_cart([sh], np.array([1.0]), np.zeros((1, 3))) is None
