# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Incremental table cache: exactness vs direct native build + reuse accounting."""

import numpy as np
import pytest

from sqd_tpu import native
from sqd_tpu.ops import bitpack, dense_fci
from sqd_tpu.ops.table_cache import TableCache

pytestmark = pytest.mark.skipif(not native.available(), reason="native library unavailable")


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(7)
    norb, ne = 8, 3
    h1 = rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2
    L = rng.normal(size=(16, norb, norb)) * 0.3
    L = (L + L.transpose(0, 2, 1)) / 2
    eri = np.einsum("xpq,xrs->pqrs", L, L)
    all_strs = dense_fci.all_hamming_strings(norb, ne)
    return norb, ne, h1, eri, all_strs


def _pick(all_strs, rng, n, norb):
    sel = np.sort(rng.choice(all_strs, n, replace=False))
    return bitpack.pack_ints(sel, norb)


def test_cached_tables_match_direct(system):
    norb, ne, h1, eri, all_strs = system
    rng = np.random.default_rng(1)
    packed = _pick(all_strs, rng, 30, norb)
    cache = TableCache()
    src_c, sign_c = cache.gather_tables(packed, norb)
    src_d, sign_d = native.gather_tables(packed, norb)
    np.testing.assert_array_equal(src_c, src_d)
    np.testing.assert_array_equal(sign_c, sign_d)
    idx_c, val_c = cache.samespin_tables(packed, h1, eri, norb, ne)
    idx_d, val_d = native.samespin_tables(packed, h1, eri, norb, ne)
    np.testing.assert_array_equal(idx_c, idx_d)
    np.testing.assert_allclose(val_c, val_d)


def test_cache_reuses_overlapping_sets(system):
    norb, ne, h1, eri, all_strs = system
    rng = np.random.default_rng(2)
    packed1 = _pick(all_strs, rng, 40, norb)
    cache = TableCache()
    cache.gather_tables(packed1, norb)
    cache.samespin_tables(packed1, h1, eri, norb, ne)
    cold_rows = cache.native_rows_computed
    assert cold_rows == 2 * 40  # one gather + one samespin row per string

    # identical set again: ZERO new native work
    cache.gather_tables(packed1, norb)
    cache.samespin_tables(packed1, h1, eri, norb, ne)
    assert cache.native_rows_computed == cold_rows

    # 75%-overlapping set: native work only for the new quarter, and the
    # produced tables still match a from-scratch build exactly
    keep = packed1[:30]
    have = set(map(int, bitpack.unpack_to_ints(packed1, norb)))
    extra = np.array(sorted(set(map(int, all_strs)) - have))
    add = bitpack.pack_ints(
        np.sort(np.random.default_rng(3).choice(extra, 10, replace=False)), norb
    )
    packed2 = bitpack.unique_packed(np.concatenate([keep, add]))
    src_c, sign_c = cache.gather_tables(packed2, norb)
    idx_c, val_c = cache.samespin_tables(packed2, h1, eri, norb, ne)
    assert cache.native_rows_computed - cold_rows <= 2 * 10
    src_d, sign_d = native.gather_tables(packed2, norb)
    idx_d, val_d = native.samespin_tables(packed2, h1, eri, norb, ne)
    np.testing.assert_array_equal(src_c, src_d)
    np.testing.assert_array_equal(sign_c, sign_d)
    np.testing.assert_array_equal(idx_c, idx_d)
    np.testing.assert_allclose(val_c, val_d)


def test_cache_rejects_different_integrals(system):
    norb, ne, h1, eri, all_strs = system
    rng = np.random.default_rng(4)
    packed = _pick(all_strs, rng, 10, norb)
    cache = TableCache()
    cache.samespin_tables(packed, h1, eri, norb, ne)
    with pytest.raises(ValueError, match="different integrals"):
        cache.samespin_tables(packed, h1 * 1.5, eri, norb, ne)


def test_solve_sci_with_cache_matches_without(system):
    import jax

    from sqd_tpu.fermion import solve_sci
    from sqd_tpu.ops.table_cache import TableCache

    norb, ne, h1, eri, all_strs = system
    rng = np.random.default_rng(5)
    sel = np.sort(rng.choice(all_strs, 20, replace=False))
    cache = TableCache()
    r1 = solve_sci((sel, sel), h1, eri, norb, (ne, ne), table_cache=cache)
    r2 = solve_sci((sel, sel), h1, eri, norb, (ne, ne))
    assert abs(r1.energy - r2.energy) < 1e-12
    np.testing.assert_allclose(r1.sci_state.amplitudes, r2.sci_state.amplitudes, atol=1e-12)
