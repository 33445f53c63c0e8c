# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Native (C++) host kernels, built on first use and bound via ctypes.

The device compute path is JAX/XLA/Pallas; this package owns the host-side
bookkeeping the reference delegates to C extensions (SURVEY.md N1/N8).  The
library compiles from :mod:`sqd_tpu/native/sqdcore.cpp` with the system g++
on first import and is cached next to the source; every entry point has a
pure-NumPy fallback, so the framework works (slower) without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = [
    "available",
    "desdes_unique",
    "pauli_diag_elements",
    "popcount_rows",
    "gather_tables",
    "gather_values",
    "samespin_tables",
    "samespin_values",
]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sqdcore.cpp")
_LIB_PATH = os.path.join(_DIR, "libsqdcore.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u32p = np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
        lib.popcount_rows.argtypes = [u32p, ctypes.c_int64, ctypes.c_int, i64p]
        lib.popcount_rows.restype = None
        lib.desdes_unique.argtypes = [
            u32p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            u32p,
            u32p,
        ]
        lib.desdes_unique.restype = ctypes.c_int64
        i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(dtype=np.int8, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
        lib.gather_tables.argtypes = [
            u32p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            i32p,
            i8p,
        ]
        lib.gather_tables.restype = None
        lib.samespin_candidates.argtypes = [
            u32p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            f64p,
            f64p,
            i32p,
            f64p,
            ctypes.c_int64,
        ]
        lib.samespin_candidates.restype = None
        lib.connected_membership64.argtypes = [u32p, ctypes.c_int64, u32p, i64p]
        lib.connected_membership64.restype = None
        lib.gather_values.argtypes = [
            u32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, u32p, i8p,
        ]
        lib.gather_values.restype = None
        lib.samespin_values.argtypes = [
            u32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f64p, f64p, u32p, f64p, ctypes.c_int64,
        ]
        lib.samespin_values.restype = None
        lib.samespin_sparse_count.argtypes = [
            u32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f64p, f64p, i64p,
        ]
        lib.samespin_sparse_count.restype = ctypes.c_int64
        lib.samespin_sparse_fill.argtypes = [
            u32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f64p, f64p, i32p, f64p, ctypes.c_int64,
        ]
        lib.samespin_sparse_fill.restype = None
        ci32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
        lib.ao_integrals_cart.argtypes = [
            ctypes.c_int, ci32p, f64p, ci32p, f64p, f64p,
            ctypes.c_int, f64p, f64p, ctypes.c_int, f64p, f64p, f64p, f64p,
        ]
        lib.ao_integrals_cart.restype = ctypes.c_int
        u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
        lib.pauli_diag_from_bool.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, u8p,
            ctypes.c_double, ctypes.c_double, f64p, i64p, i64p,
        ]
        lib.pauli_diag_from_bool.restype = None
        lib.pauli_diag_from_packed.argtypes = [
            u32p, ctypes.c_int64, ctypes.c_int, u32p,
            ctypes.c_double, ctypes.c_double, f64p, i64p, i64p,
        ]
        lib.pauli_diag_from_packed.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library is built and loadable."""
    return _load() is not None


def popcount_rows(packed: np.ndarray) -> np.ndarray:
    """Per-row popcount (native, with NumPy fallback)."""
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    lib = _load()
    if lib is None:
        return np.bitwise_count(packed).sum(axis=-1).astype(np.int64)
    out = np.empty(packed.shape[0], dtype=np.int64)
    lib.popcount_rows(packed, packed.shape[0], packed.shape[1], out)
    return out


def pauli_diag_elements(mat: np.ndarray, zmask: np.ndarray, phase: complex):
    """Fused diagonal-Pauli matrix elements; ``None`` without the library.

    Streams the subspace ONCE and writes ``(amplitudes, rows, cols)`` in the
    same pass (``amp_i = phase * (-1)^popcount(row_i AND z)``, rows = cols =
    arange) — the NumPy formulation costs 4-5 separate multi-GB passes at the
    reference benchmark's d = 5e7 on this single-core host.

    Args:
        mat: ``(n, nq)`` bool matrix with ``zmask`` the per-COLUMN 0/1 byte
            mask (column order, i.e. qubit order reversed), or ``(n, W)``
            packed uint32 with ``zmask`` the packed z words (length >= W;
            extra words must be zero — caller-validated).
    """
    lib = _load()
    if lib is None:
        return None
    n = int(mat.shape[0])
    amps = np.empty(2 * n, dtype=np.float64)
    rows = np.empty(n, dtype=np.int64)
    cols = np.empty(n, dtype=np.int64)
    ph_re, ph_im = float(np.real(phase)), float(np.imag(phase))
    if mat.dtype == np.uint32:
        packed = np.ascontiguousarray(mat)
        w = packed.shape[1]
        zw = np.zeros(w, dtype=np.uint32)
        zm = np.asarray(zmask, dtype=np.uint32)
        zw[: min(w, len(zm))] = zm[:w]
        lib.pauli_diag_from_packed(packed, n, w, zw, ph_re, ph_im, amps, rows, cols)
    elif mat.dtype == np.bool_:
        bm = np.ascontiguousarray(mat).view(np.uint8)
        zsel = np.ascontiguousarray(np.asarray(zmask, dtype=np.uint8))
        if len(zsel) != mat.shape[1]:
            return None
        lib.pauli_diag_from_bool(bm, n, mat.shape[1], zsel, ph_re, ph_im, amps, rows, cols)
    else:
        return None
    return amps.view(np.complex128), rows, cols


def desdes_unique(strs_packed: np.ndarray, nelec: int) -> np.ndarray:
    """Sorted unique two-hole intermediates ``{I - u - v}`` of a string set.

    Native fused enumerate+sort+unique; NumPy/Python fallback mirrors
    the original implementation in :mod:`sqd_tpu.ops.linktab`.
    """
    strs_packed = np.ascontiguousarray(strs_packed, dtype=np.uint32)
    n, w = strs_packed.shape
    if n == 0 or nelec < 2:
        return np.zeros((0, w), dtype=np.uint32)
    lib = _load()
    if lib is None:
        from ..ops import bitpack

        bits = bitpack.bit_masks(w * 32)[: w * 32]
        cands = []
        counts = popcount_rows(strs_packed)
        for row, cnt in zip(strs_packed, counts):
            occ_idx = [
                p for p in range(w * 32) if (row[p // 32] >> (p % 32)) & 1
            ]
            for a in range(len(occ_idx)):
                for b in range(a + 1, len(occ_idx)):
                    cands.append(row ^ bits[occ_idx[a]] ^ bits[occ_idx[b]])
        return bitpack.unique_packed(np.array(cands, dtype=np.uint32))
    pairs = nelec * (nelec - 1) // 2
    scratch = np.empty((n * pairs, w), dtype=np.uint32)
    out = np.empty((n * pairs, w), dtype=np.uint32)
    n_out = lib.desdes_unique(strs_packed, n, w, nelec, scratch, out)
    return out[:n_out].copy()


def connected_membership(sorted_packed: np.ndarray, x_words: np.ndarray):
    """Index of ``row XOR x`` within the sorted set (or -1), radix-merge based.

    Supports packed widths w <= 2 (<= 64 qubits); returns None when the native
    library is unavailable or the width is larger (callers fall back).
    """
    lib = _load()
    sorted_packed = np.ascontiguousarray(sorted_packed, dtype=np.uint32)
    n, w = sorted_packed.shape
    if lib is None or w > 2:
        return None
    if w == 1:
        sorted_packed = np.concatenate(
            [sorted_packed, np.zeros((n, 1), np.uint32)], axis=1
        )
        x_words = np.concatenate([np.asarray(x_words, np.uint32), [np.uint32(0)]])
    x_arr = np.ascontiguousarray(np.asarray(x_words, np.uint32)[:2])
    out = np.empty(n, dtype=np.int64)
    lib.connected_membership64(np.ascontiguousarray(sorted_packed), n, x_arr, out)
    return out


def gather_tables(strs_packed: np.ndarray, norb: int):
    """(src, sign) single-excitation gather tables (native; None if unavailable)."""
    lib = _load()
    if lib is None:
        return None
    strs_packed = np.ascontiguousarray(strs_packed, dtype=np.uint32)
    n, w = strs_packed.shape
    src = np.empty((norb * norb, n), dtype=np.int32)
    sign = np.empty((norb * norb, n), dtype=np.int8)
    lib.gather_tables(strs_packed, n, w, norb, src, sign)
    return src, sign


def gather_values(strs_packed: np.ndarray, norb: int):
    """SET-INDEPENDENT single-excitation candidates per string.

    Returns ``(vals, sign)`` with ``vals`` of shape ``(norb^2, n, W)`` uint32
    — the source string ``I = J - p + q`` for every pair and target — and
    ``sign (norb^2, n)`` int8 (0 where the excitation is invalid on ``J``).
    Membership against a string set is NOT resolved here; that is the cheap,
    per-set half done by :mod:`sqd_tpu.ops.table_cache`.  ``None`` when the
    native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    strs_packed = np.ascontiguousarray(strs_packed, dtype=np.uint32)
    n, w = strs_packed.shape
    vals = np.empty((norb * norb, n, w), dtype=np.uint32)
    sign = np.empty((norb * norb, n), dtype=np.int8)
    lib.gather_values(strs_packed, n, w, norb, vals, sign)
    return vals, sign


def samespin_values(strs_packed, h1e, eri, norb: int, nelec: int):
    """SET-INDEPENDENT Slater-Condon neighbor candidates per string.

    Returns ``(nbr, val)`` with ``nbr (n, width, W)`` uint32 neighbor strings
    (row layout [diagonal, singles, doubles]) and ``val (n, width)`` f64
    signed matrix elements — no membership filtering.  ``None`` when the
    native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    strs_packed = np.ascontiguousarray(strs_packed, dtype=np.uint32)
    n, w = strs_packed.shape
    nv = norb - nelec
    n_singles = nelec * nv
    n_doubles = (nelec * (nelec - 1) // 2) * (nv * (nv - 1) // 2)
    width_full = 1 + n_singles + n_doubles
    nbr = np.empty((n, width_full, w), dtype=np.uint32)
    val = np.empty((n, width_full), dtype=np.float64)
    lib.samespin_values(
        strs_packed, n, w, norb, nelec,
        np.ascontiguousarray(h1e, np.float64),
        np.ascontiguousarray(eri, np.float64),
        nbr, val, width_full,
    )
    return nbr, val


def samespin_tables(
    strs_packed, h1e, eri, norb: int, nelec: int, *, bucket: int = 8, algo: str = "auto"
):
    """Compacted Slater-Condon neighbor lists (native; None if unavailable).

    Returns (idx, val) with the same layout/semantics as
    :func:`sqd_tpu.ops.hamiltonian.build_samespin_tables`.

    Two algorithms produce bit-identical output:

    - ``"enum"``: per string, enumerate all ``1 + ne*nv + C(ne,2)*C(nv,2)``
      candidate excitations and binary-search each against the set.  Near-
      optimal when most candidates hit (full CAS sectors), pathological on
      sparse sets at high filling (27e/36o: 12,880 probes/string, ~99.6%
      misses on selected sets — measured 8 s + 12 s NumPy compaction at
      3,163 strings, where "sparse" takes ~0.2 s).
    - ``"sparse"``: intersection-driven — two strings are single/double
      connected iff they share a one-/two-hole intermediate, so sorting the
      ``M*ne`` one-hole and ``M*C(ne,2)`` two-hole cores groups exactly the
      connected pairs with no searches; work scales with output size.
      Transient memory is ~28 bytes per two-hole key (~1 GB at 1e5 strings
      of 27 electrons).

    ``"auto"`` picks "sparse" once the enumeration probe count gets large.
    """
    lib = _load()
    if lib is None:
        return None
    strs_packed = np.ascontiguousarray(strs_packed, dtype=np.uint32)
    n, w = strs_packed.shape
    nv = norb - nelec
    n_singles = nelec * nv
    n_doubles = (nelec * (nelec - 1) // 2) * (nv * (nv - 1) // 2)
    width_full = 1 + n_singles + n_doubles
    h1c = np.ascontiguousarray(h1e, np.float64)
    eric = np.ascontiguousarray(eri, np.float64)
    if algo not in ("auto", "enum", "sparse"):
        raise ValueError(f"unknown samespin algo {algo!r}")
    use_sparse = algo == "sparse" or (
        algo == "auto" and n * width_full > 4_000_000 and hasattr(lib, "samespin_sparse_count")
    )
    if use_sparse:
        counts = np.empty(n, dtype=np.int64)
        mx = int(
            lib.samespin_sparse_count(strs_packed, n, w, norb, nelec, h1c, eric, counts)
        )
        width = min(width_full, max(bucket, -(-mx // bucket) * bucket))
        idx = np.zeros((n, width), dtype=np.int32)
        val = np.zeros((n, width), dtype=np.float64)
        lib.samespin_sparse_fill(
            strs_packed, n, w, norb, nelec, h1c, eric, idx, val, width
        )
        return idx, val
    idx = np.empty((n, width_full), dtype=np.int32)
    val = np.empty((n, width_full), dtype=np.float64)
    lib.samespin_candidates(
        strs_packed,
        n,
        w,
        norb,
        nelec,
        h1c,
        eric,
        idx,
        val,
        width_full,
    )
    # compact: entries with val == 0 contribute nothing -> push to the back
    valid = val != 0.0
    order = np.argsort(~valid, axis=1, kind="stable")
    idx = np.take_along_axis(idx, order, axis=1)
    val = np.take_along_axis(val, order, axis=1)
    max_count = int(valid.sum(axis=1).max()) if n else 0
    width = min(width_full, max(bucket, -(-max_count // bucket) * bucket))
    idx = idx[:, :width].copy()
    val = val[:, :width].copy()
    # zero out anything past each row's valid prefix (stale values)
    keep = np.take_along_axis(valid, order, axis=1)[:, :width]
    idx[~keep] = 0
    val[~keep] = 0.0
    return idx, val


def ao_integrals_cart(shells, charges, coords):
    """Cartesian AO integrals ``(S, T, V, eri)`` via the native MD kernel.

    ``shells`` is the :class:`sqd_tpu.chem.integrals.Shell` list of a built
    Molecule (normalized coefficients).  Returns ``None`` when the native
    library is unavailable or a shell has l > 2 — the caller falls back to
    the NumPy path (:func:`sqd_tpu.chem.integrals.ao_integrals`), which is
    the algorithmic reference this kernel is pinned against.
    """
    lib = _load()
    if lib is None or any(sh.l > 2 for sh in shells):
        return None
    ls = np.ascontiguousarray([sh.l for sh in shells], dtype=np.int32)
    centers = np.ascontiguousarray(
        np.concatenate([np.asarray(sh.center, np.float64) for sh in shells])
    )
    prim_offs = np.zeros(len(shells) + 1, dtype=np.int32)
    for i, sh in enumerate(shells):
        prim_offs[i + 1] = prim_offs[i] + len(sh.exps)
    exps = np.ascontiguousarray(
        np.concatenate([np.asarray(sh.exps, np.float64) for sh in shells])
    )
    coefs = np.ascontiguousarray(
        np.concatenate([np.asarray(sh.coefs, np.float64) for sh in shells])
    )
    charges = np.ascontiguousarray(charges, dtype=np.float64)
    coords = np.ascontiguousarray(coords, dtype=np.float64).reshape(-1)
    nao = int(sum((sh.l + 1) * (sh.l + 2) // 2 for sh in shells))
    s = np.zeros((nao, nao), dtype=np.float64)
    t = np.zeros((nao, nao), dtype=np.float64)
    v = np.zeros((nao, nao), dtype=np.float64)
    eri = np.zeros((nao, nao, nao, nao), dtype=np.float64)
    rc = lib.ao_integrals_cart(
        len(shells), ls, centers, prim_offs, exps, coefs,
        len(charges), charges, coords, nao, s, t, v, eri,
    )
    if rc != 0:  # pragma: no cover - guarded by the l<=2 check above
        return None
    return s, t, v, eri
