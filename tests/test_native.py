# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Native C++ host kernels vs the device/Python reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from sqd_tpu import native
from sqd_tpu.ops import bitpack, dense_fci, linktab
from sqd_tpu.ops.hamiltonian import build_samespin_tables, build_sci_hamiltonian

pytestmark = pytest.mark.skipif(not native.available(), reason="libsqdcore not built")


def _integrals(norb, seed=0):
    rng = np.random.default_rng(seed)
    h1 = rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2
    eri = rng.normal(size=(norb,) * 4) * 0.3
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    return h1, eri / 8


@pytest.mark.parametrize("norb,nelec,count", [(6, 3, 15), (34, 3, 12)])
def test_gather_tables_match_device(norb, nelec, count):
    rng = np.random.default_rng(norb)
    all_s = dense_fci.all_hamming_strings(norb, nelec)
    sel = np.sort(rng.choice(all_s, count, replace=False))
    packed = bitpack.pack_ints(sel, norb)
    src_n, sign_n = native.gather_tables(packed, norb)
    src_d, sign_d = linktab.build_gather_tables(jnp.asarray(packed), norb)
    src_d, sign_d = np.asarray(src_d), np.asarray(sign_d)
    # invalid entries have sign 0; src values there are arbitrary-but-clamped
    np.testing.assert_array_equal(sign_n, sign_d)
    mask = sign_d != 0
    np.testing.assert_array_equal(src_n[mask], src_d[mask])


@pytest.mark.parametrize("norb,nelec,count", [(6, 3, 15), (34, 3, 10)])
def test_samespin_tables_match_device(norb, nelec, count):
    rng = np.random.default_rng(norb + 1)
    all_s = dense_fci.all_hamming_strings(norb, nelec)
    sel = np.sort(rng.choice(all_s, count, replace=False))
    packed = bitpack.pack_ints(sel, norb)
    h1, eri = _integrals(norb, seed=2)
    idx_n, val_n = native.samespin_tables(packed, h1, eri, norb, nelec)
    idx_d, val_d = build_samespin_tables(
        jnp.asarray(packed), jnp.asarray(h1), jnp.asarray(eri), norb, nelec
    )
    idx_d, val_d = np.asarray(idx_d), np.asarray(val_d)

    # compare as sparse matrices (layouts may order candidates differently)
    def to_dense(idx, val):
        n = len(packed)
        h = np.zeros((n, n))
        for j in range(n):
            for k in range(idx.shape[1]):
                h[j, idx[j, k]] += val[j, k]
        return h

    np.testing.assert_allclose(to_dense(idx_n, val_n), to_dense(idx_d, val_d), atol=1e-12)


@pytest.mark.parametrize(
    "norb,nelec,count",
    [
        (6, 3, 15),        # small random subset
        (6, 3, 20),        # FULL sector: dense buckets, every candidate hits
        (34, 3, 10),       # multiword strings
        (12, 9, 60),       # high filling (nv = 3)
        (8, 1, 8),         # no doubles possible (ne = 1)
        (8, 7, 8),         # no doubles possible (nv = 1)
    ],
)
def test_samespin_sparse_matches_enum(norb, nelec, count):
    """Intersection-driven kernel is bit-identical to enumeration."""
    rng = np.random.default_rng(norb * 7 + nelec)
    all_s = dense_fci.all_hamming_strings(norb, nelec)
    sel = np.sort(rng.choice(all_s, min(count, len(all_s)), replace=False))
    packed = bitpack.pack_ints(sel, norb)
    h1, eri = _integrals(norb, seed=3)
    idx_e, val_e = native.samespin_tables(packed, h1, eri, norb, nelec, algo="enum")
    idx_s, val_s = native.samespin_tables(packed, h1, eri, norb, nelec, algo="sparse")
    np.testing.assert_array_equal(idx_s, idx_e)
    np.testing.assert_array_equal(val_s, val_e)


def test_samespin_sparse_drops_zero_elements_like_enum():
    """Structured integrals (Hubbard: zero off-diagonal eri) must compact
    identically — zero matrix elements are dropped by both algorithms."""
    norb, nelec = 8, 4
    h1 = np.zeros((norb, norb))
    for i in range(norb - 1):
        h1[i, i + 1] = h1[i + 1, i] = -1.0
    eri = np.zeros((norb,) * 4)
    for i in range(norb):
        eri[i, i, i, i] = 4.0
    rng = np.random.default_rng(11)
    all_s = dense_fci.all_hamming_strings(norb, nelec)
    sel = np.sort(rng.choice(all_s, 30, replace=False))
    packed = bitpack.pack_ints(sel, norb)
    idx_e, val_e = native.samespin_tables(packed, h1, eri, norb, nelec, algo="enum")
    idx_s, val_s = native.samespin_tables(packed, h1, eri, norb, nelec, algo="sparse")
    np.testing.assert_array_equal(idx_s, idx_e)
    np.testing.assert_array_equal(val_s, val_e)
    # doubles are all zero here -> widths stay singles-sized
    assert idx_e.shape[1] <= 1 + nelec * (norb - nelec) + 7


def test_full_hamiltonian_native_vs_device_backend():
    norb, nelec = 6, (3, 2)
    rng = np.random.default_rng(5)
    h1, eri = _integrals(norb, seed=5)
    all_a = dense_fci.all_hamming_strings(norb, 3)
    all_b = dense_fci.all_hamming_strings(norb, 2)
    sa = np.sort(rng.choice(all_a, 12, replace=False))
    sb = np.sort(rng.choice(all_b, 10, replace=False))
    pa, pb = bitpack.pack_ints(sa, norb), bitpack.pack_ints(sb, norb)
    h_nat = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, tables_backend="native")
    h_dev = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, tables_backend="device")
    v = rng.normal(size=h_nat.shape)
    np.testing.assert_allclose(
        np.asarray(h_nat.matvec(jnp.asarray(v))),
        np.asarray(h_dev.matvec(jnp.asarray(v))),
        atol=1e-11,
    )
