# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Built-in Gaussian basis-set data (published values).

Primitive exponents and contraction coefficients for the basis sets the
reference's guides use (STO-3G and 6-31G; see
``/root/reference/docs/guides/quickstart.ipynb`` cell 2 and
``integrate_dice_solver.ipynb`` cell 1).  Values are the standard published
parameters (Hehre/Stewart/Pople STO-3G; Hehre/Ditchfield/Pople 6-31G) as
distributed by the Basis Set Exchange.

The nitrogen and hydrogen entries are pinned end-to-end by tests that
reproduce the reference's published energies:

* N2/6-31G RHF total energy  -108.835236570774 Ha
  (``integrate_dice_solver.ipynb`` cell-1 output, 12 significant digits);
* N2/STO-3G CASCI(8o, 10e)   -107.652521 Ha (``quickstart.ipynb`` cell 6).

Any transcription error in the data (or any bug in the integral engine)
would miss those pins by orders of magnitude more than the test tolerance.

Format: ``BASIS_SETS[name][element] = [(l, [(exponent, coefficient), ...]),
...]`` with ``l`` the angular momentum (0 = s, 1 = p).  SP (Pople) shells are
stored as separate s and p shells sharing exponents.  Coefficients are the
published ones — i.e. they refer to *normalized primitives*; the contracted
function is renormalized at build time (:mod:`sqd_tpu.chem.basis`).
"""

from __future__ import annotations

ELEMENT_Z = {"H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9, "Ne": 10}

_STO3G = {
    "H": [
        (0, [(3.42525091, 0.15432897), (0.62391373, 0.53532814), (0.16885540, 0.44463454)]),
    ],
    "C": [
        (0, [(71.6168370, 0.15432897), (13.0450960, 0.53532814), (3.5305122, 0.44463454)]),
        (0, [(2.9412494, -0.09996723), (0.6834831, 0.39951283), (0.2222899, 0.70011547)]),
        (1, [(2.9412494, 0.15591627), (0.6834831, 0.60768372), (0.2222899, 0.39195739)]),
    ],
    "N": [
        (0, [(99.1061690, 0.15432897), (18.0523120, 0.53532814), (4.8856602, 0.44463454)]),
        (0, [(3.7804559, -0.09996723), (0.8784966, 0.39951283), (0.2857144, 0.70011547)]),
        (1, [(3.7804559, 0.15591627), (0.8784966, 0.60768372), (0.2857144, 0.39195739)]),
    ],
    "O": [
        (0, [(130.7093200, 0.15432897), (23.8088610, 0.53532814), (6.4436083, 0.44463454)]),
        (0, [(5.0331513, -0.09996723), (1.1695961, 0.39951283), (0.3803890, 0.70011547)]),
        (1, [(5.0331513, 0.15591627), (1.1695961, 0.60768372), (0.3803890, 0.39195739)]),
    ],
}

_631G = {
    "H": [
        (0, [(18.7311370, 0.03349460), (2.8253937, 0.23472695), (0.6401217, 0.81375733)]),
        (0, [(0.1612778, 1.0)]),
    ],
    "C": [
        (0, [(3047.5249, 0.0018347), (457.36951, 0.0140373), (103.94869, 0.0688426),
             (29.210155, 0.2321844), (9.2866630, 0.4679413), (3.1639270, 0.3623120)]),
        (0, [(7.8682724, -0.1193324), (1.8812885, -0.1608542), (0.5442493, 1.1434564)]),
        (1, [(7.8682724, 0.0689991), (1.8812885, 0.3164240), (0.5442493, 0.7443083)]),
        (0, [(0.1687144, 1.0)]),
        (1, [(0.1687144, 1.0)]),
    ],
    "N": [
        (0, [(4173.5110, 0.0018348), (627.45790, 0.0139950), (142.90210, 0.0685870),
             (40.234330, 0.2322410), (12.820210, 0.4690700), (4.3904370, 0.3604550)]),
        (0, [(11.626358, -0.1149610), (2.7162800, -0.1691180), (0.7722180, 1.1458520)]),
        (1, [(11.626358, 0.0675800), (2.7162800, 0.3239070), (0.7722180, 0.7408950)]),
        (0, [(0.2120313, 1.0)]),
        (1, [(0.2120313, 1.0)]),
    ],
    "O": [
        (0, [(5484.6717, 0.0018311), (825.23495, 0.0139501), (188.04696, 0.0684451),
             (52.964500, 0.2327143), (16.897570, 0.4701930), (5.7996353, 0.3585209)]),
        (0, [(15.539616, -0.1107775), (3.5999336, -0.1480263), (1.0137618, 1.1307670)]),
        (1, [(15.539616, 0.0708743), (3.5999336, 0.3397528), (1.0137618, 0.7271586)]),
        (0, [(0.2700058, 1.0)]),
        (1, [(0.2700058, 1.0)]),
    ],
}

BASIS_SETS = {
    "sto-3g": _STO3G,
    "6-31g": _631G,
}
