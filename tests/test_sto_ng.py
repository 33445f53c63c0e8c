# (C) 2026. Licensed under the Apache License, Version 2.0.
"""The STO-nG fitter re-derives the published expansions from scratch.

The published STO-3G tables are least-squares Gaussian fits to Slater
orbitals (Hehre/Stewart/Pople, JCP 51, 2657 (1969)).  Re-deriving them with
this repo's own fitter and matching the transcribed ``basis_data`` entries
validates BOTH: a transcription error in the data or a defect in the fitter
would each break the match.  The 3d/4sp fits (used to generate the iron
entry, which has no transcribed table here) are validated by the same
machinery plus fit-quality floors.
"""

import numpy as np
import pytest

from sqd_tpu.chem.basis_data import BASIS_SETS
from sqd_tpu.chem.sto_ng import fit_sto_ng, fit_sto_ng_shared, slater_zeta


def _entry(el, shells, which):
    """(exponents, coefficients) of the which-th shell of an element entry."""
    l, prims = BASIS_SETS["sto-3g"][el][which]
    arr = np.array(prims)
    return l, arr[:, 0], arr[:, 1]


def test_fit_reproduces_published_1s():
    alpha, c = fit_sto_ng(1, 0)
    _, exps, coefs = _entry("H", BASIS_SETS["sto-3g"]["H"], 0)
    zeta2 = exps[0] / alpha[0]  # H zeta = 1.24 -> 1.5376
    assert abs(zeta2 - 1.24**2) < 2e-3
    np.testing.assert_allclose(alpha * zeta2, exps, rtol=5e-3)
    np.testing.assert_allclose(c, coefs, atol=2e-3)


def test_fit_reproduces_published_2sp():
    alpha, c_s, c_p = fit_sto_ng_shared(2)
    _, exps_s, coefs_s = _entry("N", BASIS_SETS["sto-3g"]["N"], 1)
    _, exps_p, coefs_p = _entry("N", BASIS_SETS["sto-3g"]["N"], 2)
    np.testing.assert_allclose(exps_s, exps_p)  # shared-exponent invariant
    zeta2 = exps_s[0] / alpha[0]  # N zeta_2sp = 1.95
    assert abs(zeta2 - 1.95**2) < 3e-2
    np.testing.assert_allclose(alpha * zeta2, exps_s, rtol=5e-3)
    np.testing.assert_allclose(c_s, coefs_s, atol=3e-3)
    np.testing.assert_allclose(c_p, coefs_p, atol=3e-3)


def test_fit_reproduces_published_3sp_sulfur():
    """The transcribed sulfur 3sp shell == fitter output at zeta = 2.05."""
    alpha, c_s, c_p = fit_sto_ng_shared(3)
    _, exps_s, coefs_s = _entry("S", BASIS_SETS["sto-3g"]["S"], 3)
    _, exps_p, coefs_p = _entry("S", BASIS_SETS["sto-3g"]["S"], 4)
    np.testing.assert_allclose(exps_s, exps_p)
    zeta2 = exps_s[0] / alpha[0]
    assert abs(zeta2 - 2.05**2) < 5e-2
    np.testing.assert_allclose(alpha * zeta2, exps_s, rtol=7e-3)
    np.testing.assert_allclose(c_s, coefs_s, atol=4e-3)
    np.testing.assert_allclose(c_p, coefs_p, atol=4e-3)


def test_sulfur_inner_shells_match_universal_expansions():
    """S 1s/2sp = the same universal fits at zeta = 15.47 / 5.79."""
    a1, c1 = fit_sto_ng(1, 0)
    _, exps, coefs = _entry("S", BASIS_SETS["sto-3g"]["S"], 0)
    np.testing.assert_allclose(a1 * 15.47**2, exps, rtol=5e-3)
    np.testing.assert_allclose(c1, coefs, atol=2e-3)
    a2, c2s, c2p = fit_sto_ng_shared(2)
    _, exps2, coefs2s = _entry("S", BASIS_SETS["sto-3g"]["S"], 1)
    _, _, coefs2p = _entry("S", BASIS_SETS["sto-3g"]["S"], 2)
    np.testing.assert_allclose(a2 * 5.79**2, exps2, rtol=5e-3)
    np.testing.assert_allclose(c2s, coefs2s, atol=3e-3)
    np.testing.assert_allclose(c2p, coefs2p, atol=3e-3)


def test_3d_and_4sp_fit_quality():
    """Shells with no transcribed table: assert fit-overlap floors."""
    from sqd_tpu.chem.sto_ng import _best_overlap, _radial_grid

    grid = _radial_grid()
    a_d, c_d = fit_sto_ng(3, 2)
    ov_d, _ = _best_overlap(3, 2, a_d, grid)
    assert ov_d > 0.998  # 3 Gaussians fit a nodeless 3d STO very well
    assert np.all(np.diff(a_d) < 0) and a_d[-1] > 0
    a_sp, c_4s, c_4p = fit_sto_ng_shared(4)
    ov_s, _ = _best_overlap(4, 0, a_sp, grid)
    ov_p, _ = _best_overlap(4, 1, a_sp, grid)
    assert ov_s > 0.98 and ov_p > 0.98


def test_slater_zeta_iron():
    """Slater-rule zetas for Fe ([Ar] 3d^6 4s^2) — hand-checked values."""
    z = slater_zeta(26, [(1, "sp", 2), (2, "sp", 8), (3, "sp", 8), (3, "d", 6), (4, "sp", 2)])
    assert abs(z[(1, "sp")] - 25.70) < 1e-10
    assert abs(z[(2, "sp")] - 10.925) < 1e-10
    assert abs(z[(3, "sp")] - 4.91666666667) < 1e-8
    assert abs(z[(3, "d")] - 2.08333333333) < 1e-8
    assert abs(z[(4, "sp")] - 1.01351351351) < 1e-8


def test_iron_entry_regenerates_from_fitter():
    """The embedded Fe literals == sto3g_shells at the documented zetas."""
    if "Fe" not in BASIS_SETS["sto-3g"]:
        pytest.skip("Fe entry not yet embedded")
    from sqd_tpu.chem.sto_ng import sto3g_shells

    zetas = slater_zeta(
        26, [(1, "sp", 2), (2, "sp", 8), (3, "sp", 8), (3, "d", 6), (4, "sp", 2)]
    )
    gen = sto3g_shells([
        (1, "s", zetas[(1, "sp")]),
        (2, "sp", zetas[(2, "sp")]),
        (3, "sp", zetas[(3, "sp")]),
        (3, "d", zetas[(3, "d")]),
        (4, "sp", zetas[(4, "sp")]),
    ])
    embedded = BASIS_SETS["sto-3g"]["Fe"]
    assert len(gen) == len(embedded)
    for (l_g, prims_g), (l_e, prims_e) in zip(gen, embedded):
        assert l_g == l_e
        pg, pe = np.array(prims_g), np.array(prims_e)
        np.testing.assert_allclose(pg[:, 0], pe[:, 0], rtol=2e-3)
        np.testing.assert_allclose(pg[:, 1], pe[:, 1], atol=3e-3)
