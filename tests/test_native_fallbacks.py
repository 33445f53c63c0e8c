# (C) 2026. Licensed under the Apache License, Version 2.0.
"""The native wrapper's fallback-vs-native branch selection.

Every entry point in :mod:`sqd_tpu.native` has a pure-NumPy fallback (or a
``None`` contract that callers interpret as "use the device path").  Silent
divergence between the two branches is the one place a wrong answer could
hide without any test noticing — so this file pins, for each entry point,
either fallback == native output or the documented ``None`` contract, plus
the build/load failure paths.
"""

import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from sqd_tpu import native
from sqd_tpu.ops import bitpack, dense_fci
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian

needs_native = pytest.mark.skipif(not native.available(), reason="libsqdcore not built")


@pytest.fixture()
def no_lib(monkeypatch):
    """Force every wrapper down its lib-unavailable branch."""
    monkeypatch.setattr(native, "_load", lambda: None)


def _packed_set(norb, nelec, count, seed=0):
    rng = np.random.default_rng(seed)
    all_s = dense_fci.all_hamming_strings(norb, nelec)
    sel = np.sort(rng.choice(all_s, min(count, len(all_s)), replace=False))
    return bitpack.pack_ints(sel, norb)


@needs_native
@pytest.mark.parametrize("norb,nelec", [(6, 3), (40, 5)])
def test_popcount_fallback_matches_native(no_lib, norb, nelec, monkeypatch):
    packed = _packed_set(norb, nelec, 12, seed=norb)
    fb = native.popcount_rows(packed)
    monkeypatch.undo()  # restore the real _load
    nat = native.popcount_rows(packed)
    np.testing.assert_array_equal(fb, nat)
    assert fb.dtype == nat.dtype == np.int64


@needs_native
@pytest.mark.parametrize("norb,nelec", [(6, 3), (34, 4)])
def test_desdes_unique_fallback_matches_native(no_lib, norb, nelec, monkeypatch):
    packed = _packed_set(norb, nelec, 10, seed=norb + 1)
    fb = native.desdes_unique(packed, nelec)
    monkeypatch.undo()
    nat = native.desdes_unique(packed, nelec)
    np.testing.assert_array_equal(fb, nat)


def test_desdes_unique_degenerate_cases():
    # empty set and nelec < 2 return an empty (0, w) array in BOTH branches
    empty = np.zeros((0, 1), dtype=np.uint32)
    assert native.desdes_unique(empty, 3).shape == (0, 1)
    one_elec = _packed_set(6, 1, 3)
    assert native.desdes_unique(one_elec, 1).shape == (0, 1)


def test_none_contract_when_lib_unavailable(no_lib):
    packed = _packed_set(6, 3, 8)
    h1 = np.eye(6)
    eri = np.zeros((6,) * 4)
    assert native.gather_tables(packed, 6) is None
    assert native.gather_values(packed, 6) is None
    assert native.samespin_tables(packed, h1, eri, 6, 3) is None
    assert native.samespin_values(packed, h1, eri, 6, 3) is None
    assert native.connected_membership(packed, np.array([1], np.uint32)) is None
    assert native.available() is False


@needs_native
def test_connected_membership_width_paths():
    """w=1 (zero-extended) and w=2 agree with a NumPy searchsorted oracle;
    w>2 returns None (caller falls back)."""
    rng = np.random.default_rng(3)
    ints = np.unique(rng.integers(0, 1 << 20, size=64, dtype=np.int64))
    x = 0b1011

    def oracle(ints, x):
        targets = ints ^ x
        pos = np.searchsorted(ints, targets)
        pos_c = np.clip(pos, 0, len(ints) - 1)
        return np.where(ints[pos_c] == targets, pos_c, -1)

    for w in (1, 2):
        packed = np.zeros((len(ints), w), dtype=np.uint32)
        packed[:, 0] = ints & 0xFFFFFFFF
        xw = np.full((w,), 0, np.uint32)
        xw[0] = x
        got = native.connected_membership(packed, xw)
        np.testing.assert_array_equal(got, oracle(ints, x))
    wide = np.zeros((4, 3), dtype=np.uint32)
    assert native.connected_membership(wide, np.zeros(3, np.uint32)) is None


@needs_native
def test_samespin_tables_rejects_unknown_algo():
    packed = _packed_set(6, 3, 8)
    with pytest.raises(ValueError, match="unknown samespin algo"):
        native.samespin_tables(packed, np.eye(6), np.zeros((6,) * 4), 6, 3, algo="bogus")


def test_hamiltonian_auto_backend_survives_missing_lib(no_lib):
    """tables_backend="auto" must fall through to the device builder and
    produce the same matvec when the native library is unavailable."""
    norb, nelec = 6, (3, 2)
    rng = np.random.default_rng(5)
    h1 = rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2
    eri = rng.normal(size=(norb,) * 4) * 0.1
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    pa = _packed_set(norb, nelec[0], 10, seed=7)
    pb = _packed_set(norb, nelec[1], 9, seed=8)
    h_fb = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, tables_backend="auto")
    h_dev = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, tables_backend="device")
    v = rng.normal(size=h_fb.shape)
    np.testing.assert_allclose(
        np.asarray(h_fb.matvec(jnp.asarray(v))),
        np.asarray(h_dev.matvec(jnp.asarray(v))),
        atol=1e-11,
    )


def test_build_failure_paths(monkeypatch, tmp_path):
    """A toolchain failure must degrade to lib=None, never raise."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_LIB_PATH", str(tmp_path / "libmissing.so"))

    def boom(*a, **k):
        raise subprocess.CalledProcessError(1, "g++")

    monkeypatch.setattr(native.subprocess, "run", boom)
    assert native._build() is False
    assert native._load() is None
    # _tried latches: the second call short-circuits without re-building
    assert native._load() is None


def test_load_handles_unloadable_library(monkeypatch, tmp_path):
    """A present-but-corrupt .so (CDLL OSError) must degrade to lib=None."""
    bad = tmp_path / "libbad.so"
    bad.write_bytes(b"not an ELF")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_LIB_PATH", str(bad))
    monkeypatch.setattr(native, "_SRC", str(bad))  # mtime compare: no rebuild
    assert native._load() is None
