# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Selected-CI Hamiltonian application: exact tensor-product decomposition.

TPU-native replacement for PySCF's ``SelectedCI.contract_2e`` C kernel
(reference hot path, ``fermion.py:513-515``; SURVEY.md N1/N4).  Because the
subspace is a *Cartesian product* strs_a x strs_b (``fermion.py:49-52``), the
projected Hamiltonian splits exactly into three channels:

    P H P = H_aa (x) I   +   I (x) H_bb   +   H_ab

* ``H_ab = sum_pqrs (pq|rs) E^a_pq E^b_rs`` — all opposite-spin physics.  Its
  intermediate states ``(Ja, Ib)`` stay inside the product basis, so it is
  computed **exactly** as per-pair gathers + one big MXU matmul over the
  ``norb^2`` pair axis (the FLOP-dominant stage) + gathers back.
* ``H_aa`` / ``H_bb`` — single-spin one-body + same-spin two-body terms
  (``sum h a+a + 1/2 sum (pq|rs) a+_p a+_r a_s a_q`` within one spin).  Their
  double excitations pass through intermediate strings *outside* a selected
  set, so a factorized contraction would be wrong; instead they are small
  sparse matrices over one spin sector, stored as padded **neighbor lists**
  (Slater-Condon values for all singles/doubles present in the set) and
  applied as row/column gathers weighted on the VPU.  In selected-CI sets the
  neighbor count per string is tiny, so this channel is bandwidth-light.

The optional spin penalty (PySCF ``fix_spin_``; SURVEY.md N4) is fused:
``H' = H + shift * (S^2 - ss)`` with
``S^2 v = (sz^2 + sz + n_b) v - sum_pq E^a_pq E^b_qp v`` — also exact in the
product basis — reusing the alpha-gathered intermediates of ``H_ab``.

All stages are static-shape and jit/vmap/shard_map-friendly.  Subspace-size
padding is handled by sentinel gather entries: padded determinants have zero
couplings everywhere and a huge diagonal, so they stay exactly zero through
the whole Krylov iteration (SURVEY.md §7 hard part #2).
"""

from __future__ import annotations

from dataclasses import dataclass, replace as _dc_replace
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import bitpack, linktab

__all__ = [
    "SCIBasis",
    "SCIHamiltonian",
    "build_sci_basis",
    "build_sci_hamiltonian",
    "build_samespin_tables",
    "expectation_value",
]

# MXU precision of the fused Pallas cross-spin matmul (the f32 Davidson
# stage).  Mosaic lowers only DEFAULT (1-pass bf16) and HIGHEST; measured on
# chip, HIGHEST here costs bf16x3-grade error (~1.4e-6 relative), i.e. it is
# already the 3-pass scheme — keep it.
PALLAS_MATMUL_PRECISION = "highest"

# Unroll factor of the beta-first blocked matvec's column-block loop (the
# 1e7-scale path).  >1 lets XLA overlap independent blocks' gathers/GEMMs at
# the cost of proportionally larger live transients; tuned on hardware.
BETA_FIRST_UNROLL = 1

# Problem size (padded M*N) above which the native build assembles the exact
# f64 diagonal ON DEVICE from rank-structured pieces instead of moving the
# materialized (M, N) array over the host->device link (tunnel: ~47 MB/s).
DEVICE_DIAG_MIN_ELEMS = 4_000_000


# ---------------------------------------------------------------------------
# same-spin sparse neighbor tables (Slater-Condon within one spin sector)
# ---------------------------------------------------------------------------


def _candidate_index_arrays(n_occ: int, n_virt: int):
    """Static candidate enumeration: singles (i, k) and doubles (i<j, k<l)."""
    si, sk = np.meshgrid(np.arange(n_occ), np.arange(n_virt), indexing="ij")
    si, sk = si.ravel(), sk.ravel()
    if n_occ >= 2 and n_virt >= 2:
        oi, oj = np.triu_indices(n_occ, k=1)
        vk, vl = np.triu_indices(n_virt, k=1)
        di = np.repeat(oi, len(vk))
        dj = np.repeat(oj, len(vk))
        dk = np.tile(vk, len(oi))
        dl = np.tile(vl, len(oi))
    else:
        di = dj = dk = dl = np.zeros(0, dtype=np.int64)
    return (si, sk), (di, dj, dk, dl)


@partial(jax.jit, static_argnames=("norb", "nelec_spin"))
def _samespin_candidates(strs, h1e, eri, norb: int, nelec_spin: int):
    """All candidate (neighbor index, Slater-Condon value, valid) per string.

    Returns (idx, val, valid) each of shape ``(n, C)`` with
    ``C = 1 + singles + doubles`` candidates per row.
    """
    n = strs.shape[0]
    nv = norb - nelec_spin
    occ = linktab.occupancy_matrix(strs, norb)  # (n, norb) 0/1
    # occupied positions ascending, then virtual positions ascending
    sort_key = (1 - occ) * norb + jnp.arange(norb)[None, :]
    pos = jnp.argsort(sort_key, axis=1)
    occ_pos = pos[:, :nelec_spin]  # (n, na)
    virt_pos = pos[:, nelec_spin:]  # (n, nv)

    bits = jnp.asarray(bitpack.bit_masks(norb))  # (norb, W)
    prefix = jnp.asarray(bitpack.prefix_masks(norb))  # (norb+1, W)
    eri_flat = eri.reshape(-1)
    dt = eri.dtype

    # mean-field weights for singles: Wx[pq, k] = (pq|kk) - (pk|kq)
    # NOTE: table VALUES must be full precision — an unpinned matmul here
    # runs at bf16-grade default on TPU and poisons every downstream energy
    # by ~1e-4 (observed vs host-f64 ground truth at the 1e6-det scale).
    with jax.default_matmul_precision("highest"):
        wx = (jnp.einsum("pqkk->pqk", eri) - jnp.einsum("pkkq->pqk", eri)).reshape(
            norb * norb, norb
        )
        mf = occ.astype(dt) @ wx.T  # (n, npair)

        # one-spin diagonal: occ.h_diag + 1/2 occ (J - K) occ
        hd = jnp.diagonal(h1e)
        jm = jnp.einsum("ppqq->pq", eri)
        km = jnp.einsum("pqqp->pq", eri)
        od = occ.astype(dt)
        diag = od @ hd + 0.5 * jnp.einsum("ip,pq,iq->i", od, jm - km, od)

    (si, sk), (di, dj, dk, dl) = _candidate_index_arrays(nelec_spin, nv)
    si, sk = jnp.asarray(si), jnp.asarray(sk)
    di, dj, dk, dl = map(jnp.asarray, (di, dj, dk, dl))

    def parity_bits(x, t):
        # popcount(x & bits_below(t)); t is a traced orbital index
        return bitpack.jnp_popcount_rows(x & prefix[t])

    def per_row(j_str, opos, vpos, mf_row, diag_val, row_i):
        # --- diagonal ------------------------------------------------------
        idx0 = row_i[None]
        val0 = diag_val[None]
        ok0 = jnp.ones((1,), bool)

        # --- singles: I = J - p + q, p occupied in J, q virtual in J --------
        p = opos[si]  # (ns,)
        q = vpos[sk]
        i_str = j_str[None, :] ^ bits[p] ^ bits[q]  # (ns, W)
        # sign of <J|a+_p a_q|I>, evaluated on I: remove q, then add p
        s_par = parity_bits(i_str, q) + parity_bits(i_str, p) - (q < p).astype(jnp.int32)
        sgn = jnp.where(s_par % 2 == 0, 1.0, -1.0).astype(dt)
        pq = p * norb + q
        val1 = sgn * (h1e[p, q] + mf_row[pq] - wx[pq, p])
        idx1 = bitpack.jnp_find_packed(strs, i_str)
        ok1 = idx1 >= 0

        # --- doubles: I = J - p - r + q + s ---------------------------------
        if di.shape[0] > 0:
            dp = opos[di]
            dr = opos[dj]
            dq = vpos[dk]
            ds = vpos[dl]
            i2 = j_str[None, :] ^ bits[dp] ^ bits[dr] ^ bits[dq] ^ bits[ds]
            # g = sign of a+_p a+_r a_s a_q applied to I (sequential parities)
            x0 = i2
            t1 = parity_bits(x0, dq)
            x1 = x0 ^ bits[dq]
            t2 = parity_bits(x1, ds)
            x2 = x1 ^ bits[ds]
            t3 = parity_bits(x2, dr)
            x3 = x2 ^ bits[dr]
            t4 = parity_bits(x3, dp)
            g = jnp.where((t1 + t2 + t3 + t4) % 2 == 0, 1.0, -1.0).astype(dt)

            def e4(a, b, c, d):
                return eri_flat[((a * norb + b) * norb + c) * norb + d]

            val2 = (
                0.5
                * g
                * (e4(dp, dq, dr, ds) + e4(dr, ds, dp, dq) - e4(dp, ds, dr, dq) - e4(dr, dq, dp, ds))
            )
            idx2 = bitpack.jnp_find_packed(strs, i2)
            ok2 = idx2 >= 0
            idx_all = jnp.concatenate([idx0, idx1, idx2])
            val_all = jnp.concatenate([val0, val1, val2])
            ok_all = jnp.concatenate([ok0, ok1, ok2])
        else:
            idx_all = jnp.concatenate([idx0, idx1])
            val_all = jnp.concatenate([val0, val1])
            ok_all = jnp.concatenate([ok0, ok1])
        idx_all = jnp.where(ok_all, idx_all, 0).astype(jnp.int32)  # clamped (val 0)
        val_all = jnp.where(ok_all, val_all, 0.0)
        return idx_all, val_all, ok_all

    rows = jnp.arange(n, dtype=jnp.int32)
    return jax.vmap(per_row)(strs, occ_pos, virt_pos, mf, diag, rows)


@partial(jax.jit, static_argnames=("width",))
def _compact_candidates(idx, val, valid, width: int):
    """Stable-sort valid candidates to the front of each row; trim to width."""
    order = jnp.argsort(~valid, axis=1, stable=True)
    idx_c = jnp.take_along_axis(idx, order, axis=1)[:, :width]
    val_c = jnp.take_along_axis(val, order, axis=1)[:, :width]
    return idx_c, val_c


def build_samespin_tables(
    strs_packed, h1e, eri, norb: int, nelec_spin: int, *, bucket: int = 8
):
    """Padded neighbor lists for one spin sector's H_ss (diag+singles+doubles).

    Returns (idx, val): ``(n, L) int32 / dtype`` with sentinel index ``n``
    and value 0 in unused slots.  ``L`` is the max per-row neighbor count
    rounded up to ``bucket`` (host sync once at build time).
    """
    strs = jnp.asarray(strs_packed)
    idx, val, valid = _samespin_candidates(
        strs, jnp.asarray(h1e), jnp.asarray(eri), norb, int(nelec_spin)
    )
    max_count = int(jnp.max(jnp.sum(valid, axis=1)))
    width = min(idx.shape[1], max(bucket, -(-max_count // bucket) * bucket))
    return _compact_candidates(idx, val, valid, width)


# ---------------------------------------------------------------------------
# the assembled operator
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SCIBasis:
    """Single-excitation gather tables over a (strs_a x strs_b) product basis.

    Integral-free: enough machinery for RDMs, occupancies and ``S^2`` (the
    queries :class:`sqd_tpu.fermion.SCIState` serves).  The full
    :class:`SCIHamiltonian` extends it with the energy/matvec payload.
    """

    # single-excitation gather tables (exact cross-spin + RDM machinery)
    src_a: jax.Array  # (npair, M) int32
    sign_a: jax.Array  # (npair, M) int8
    src_b: jax.Array  # (npair, N) int32
    sign_b: jax.Array  # (npair, N) int8
    norb: int
    nelec: tuple[int, int]

    # -- pytree plumbing ----------------------------------------------------
    def tree_flatten(self):
        children = (self.src_a, self.sign_a, self.src_b, self.sign_b)
        return children, (self.norb, self.nelec)

    @classmethod
    def tree_unflatten(cls, aux, children):
        norb, nelec = aux
        src_a, sign_a, src_b, sign_b = children
        return cls(
            src_a=src_a, sign_a=sign_a, src_b=src_b, sign_b=sign_b,
            norb=norb, nelec=nelec,
        )

    # -- shapes --------------------------------------------------------------
    @property
    def shape(self) -> tuple[int, int]:
        return self.src_a.shape[1], self.src_b.shape[1]

    @property
    def dim(self) -> int:
        m, n = self.shape
        return m * n

    # -- building blocks -------------------------------------------------------
    # NOTE: all index tables are CLAMPED at build time — invalid entries point
    # at a valid slot with sign/value 0, so no pad rows/columns (and no
    # per-matvec concatenations) are ever needed.

    def gather_alpha(self, c: jax.Array) -> jax.Array:
        """``D_a[pq] = E^a_pq c`` for all pairs: (npair, M, N) via row gathers."""
        dt = c.dtype
        return self.sign_a.astype(dt)[:, :, None] * c[self.src_a]

    def gather_beta(self, c: jax.Array) -> jax.Array:
        """``D_b[pq] = E^b_pq c``: (npair, M, N) via column gathers."""
        dt = c.dtype
        g = jnp.take(c, self.src_b, axis=1)  # (M, npair, N)
        return jnp.swapaxes(g, 0, 1) * self.sign_b.astype(dt)[:, None, :]

    def scatter_alpha(self, g: jax.Array) -> jax.Array:
        """``sum_pq E^a_pq g[pq]`` — same tables, gather form (no scatters)."""
        dt = g.dtype
        picked = jnp.take_along_axis(g, self.src_a[:, :, None].astype(jnp.int32), axis=1)
        return jnp.sum(self.sign_a.astype(dt)[:, :, None] * picked, axis=0)

    def scatter_beta(self, g: jax.Array) -> jax.Array:
        dt = g.dtype
        picked = jnp.take_along_axis(g, self.src_b[:, None, :].astype(jnp.int32), axis=2)
        return jnp.sum(self.sign_b.astype(dt)[:, None, :] * picked, axis=0)

    def _qp_perm(self) -> np.ndarray:
        npair = self.norb * self.norb
        p, q = np.divmod(np.arange(npair), self.norb)
        return q * self.norb + p

    def s2_apply_from_alpha(self, d_a: jax.Array, c: jax.Array) -> jax.Array:
        """``S^2 c`` given ``d_a = gather_alpha(c)`` (exact in product basis)."""
        n_a, n_b = self.nelec
        sz = 0.5 * (n_a - n_b)
        const = sz * sz + sz + n_b
        perm = jnp.asarray(self._qp_perm())
        dt = c.dtype
        src_qp = self.src_b[perm]  # (npair, N)
        sign_qp = self.sign_b[perm]
        picked = jnp.take_along_axis(d_a, src_qp[:, None, :].astype(jnp.int32), axis=2)
        mixed = jnp.sum(sign_qp.astype(dt)[:, None, :] * picked, axis=0)
        return const * c - mixed

    def spin_square(self, c: jax.Array) -> jax.Array:
        """``<c|S^2|c> / <c|c>``."""
        d_a = self.gather_alpha(c)
        s2c = self.s2_apply_from_alpha(d_a, c)
        return jnp.vdot(c, s2c) / jnp.vdot(c, c)


def build_sci_basis(
    strs_a_packed: np.ndarray,
    strs_b_packed: np.ndarray,
    norb: int,
    nelec: tuple[int, int],
    *,
    tables_backend: str = "auto",
) -> SCIBasis:
    """Assemble the gather-table-only basis view (for RDM/S^2 queries)."""
    use_native = False
    if tables_backend in ("auto", "native"):
        from .. import native

        use_native = native.available()
        if tables_backend == "native" and not use_native:
            raise RuntimeError("native tables requested but libsqdcore is unavailable")
    if use_native:
        from .. import native

        src_a_h, sign_a_h = native.gather_tables(np.asarray(strs_a_packed), norb)
        src_b_h, sign_b_h = native.gather_tables(np.asarray(strs_b_packed), norb)
        src_a, sign_a = jnp.asarray(src_a_h), jnp.asarray(sign_a_h)
        src_b, sign_b = jnp.asarray(src_b_h), jnp.asarray(sign_b_h)
    else:
        src_a, sign_a = linktab.build_gather_tables(jnp.asarray(strs_a_packed), norb)
        src_b, sign_b = linktab.build_gather_tables(jnp.asarray(strs_b_packed), norb)
    return SCIBasis(
        src_a=src_a,
        sign_a=sign_a,
        src_b=src_b,
        sign_b=sign_b,
        norb=int(norb),
        nelec=tuple(int(x) for x in nelec),
    )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SCIHamiltonian(SCIBasis):
    """Device-resident projected Hamiltonian over a (strs_a x strs_b) basis.

    The amplitude layout is an ``(M, N)`` matrix over (alpha strings x beta
    strings), mirroring ``SCIState.amplitudes`` in the reference
    (``fermion.py:49-52``).
    """

    # same-spin sparse neighbor lists (Slater-Condon values).  Declared with
    # None placeholders only to satisfy dataclass ordering under inheritance;
    # build_sci_hamiltonian always fills them.
    nbr_idx_a: jax.Array = None  # (M, La) int32, sentinel M
    nbr_val_a: jax.Array = None  # (M, La)
    nbr_idx_b: jax.Array = None  # (N, Lb) int32, sentinel N
    nbr_val_b: jax.Array = None  # (N, Lb)
    # cross-spin contraction coefficients: eri^T as (npair, npair)
    eri_t: jax.Array = None
    hdiag: jax.Array = None  # (M, N)
    # optional pivoted-Cholesky factor L (X, npair) of the PSD pair matrix
    # V[pq, rs] = (pq|rs): V = L^T L to ~1e-13 relative.  When present, the
    # f32 matvec paths contract through the factor — 2*2*X*npair*dim FLOPs
    # instead of 2*npair^2*dim, a norb^2/(2X) saving that grows with norb
    # (large active spaces: X ~ 6-10x norb while npair = norb^2).  f64 paths
    # (energy evaluation, residual refinement) always use the exact eri_t.
    eri_chol: jax.Array | None = None
    # spin penalty: H + shift * (S^2 - spin_sq); shift == 0 disables.
    spin_shift: float = 0.0
    spin_target: float = 0.0
    # beta-column block size for the two-pass cross-spin channel (0 = one pass).
    col_block: int = 0

    # -- pytree plumbing ----------------------------------------------------
    def tree_flatten(self):
        children = (
            self.src_a,
            self.sign_a,
            self.src_b,
            self.sign_b,
            self.nbr_idx_a,
            self.nbr_val_a,
            self.nbr_idx_b,
            self.nbr_val_b,
            self.eri_t,
            self.hdiag,
            self.eri_chol,
        )
        aux = (self.norb, self.nelec, self.spin_shift, self.spin_target, self.col_block)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        norb, nelec, shift, target, col_block = aux
        (src_a, sign_a, src_b, sign_b, nbr_idx_a, nbr_val_a,
         nbr_idx_b, nbr_val_b, eri_t, hdiag, eri_chol) = children
        return cls(
            src_a=src_a,
            sign_a=sign_a,
            src_b=src_b,
            sign_b=sign_b,
            nbr_idx_a=nbr_idx_a,
            nbr_val_a=nbr_val_a,
            nbr_idx_b=nbr_idx_b,
            nbr_val_b=nbr_val_b,
            eri_t=eri_t,
            hdiag=hdiag,
            eri_chol=eri_chol,
            norb=norb,
            nelec=nelec,
            spin_shift=shift,
            spin_target=target,
            col_block=col_block,
        )

    def astype(self, dtype) -> "SCIHamiltonian":
        """Cast the floating-point payload once (so matvecs avoid per-call casts)."""
        import dataclasses

        return dataclasses.replace(
            self,
            eri_t=self.eri_t.astype(dtype),
            nbr_val_a=self.nbr_val_a.astype(dtype),
            nbr_val_b=self.nbr_val_b.astype(dtype),
            hdiag=self.hdiag.astype(dtype),
            eri_chol=None if self.eri_chol is None else self.eri_chol.astype(dtype),
        )

    def _use_chol(self, dt) -> bool:
        """Factorized contraction is an f32-matvec-only optimization."""
        return self.eri_chol is not None and dt == jnp.float32

    def _chol_left(self, flat: jax.Array, dt) -> jax.Array:
        """``V @ flat`` through the factor ((npair, K) layout).

        The factor is only attached when the pair matrix was verified
        symmetric PSD, so ``V == V.T`` and this serves both the ``eri_t @ .``
        (full path) and ``eri_t.T @ .`` (blocked paths) orientations.
        """
        lf = self.eri_chol.astype(dt)
        t = jnp.matmul(lf, flat, preferred_element_type=dt)
        return jnp.matmul(lf.T, t, preferred_element_type=dt)

    def _chol_right(self, flat: jax.Array, dt) -> jax.Array:
        """``flat @ V`` through the factor ((K, npair) layout)."""
        lf = self.eri_chol.astype(dt)
        t = jnp.matmul(flat, lf.T, preferred_element_type=dt)
        return jnp.matmul(t, lf, preferred_element_type=dt)

    def apply_samespin_alpha(self, c: jax.Array) -> jax.Array:
        """``(H_aa (x) I) c`` via the neighbor list (row gathers)."""
        dt = c.dtype
        picked = c[self.nbr_idx_a]  # (M, La, N)
        with jax.default_matmul_precision("highest"):
            return jnp.einsum("jl,jln->jn", self.nbr_val_a.astype(dt), picked)

    def apply_samespin_beta(self, c: jax.Array) -> jax.Array:
        """``(I (x) H_bb) c`` via the neighbor list (column gathers)."""
        dt = c.dtype
        picked = jnp.take(c, self.nbr_idx_b, axis=1)  # (M, N, Lb)
        with jax.default_matmul_precision("highest"):
            return jnp.einsum("kl,mkl->mk", self.nbr_val_b.astype(dt), picked)

    # -- the operator -----------------------------------------------------------
    def matvec(self, c: jax.Array) -> jax.Array:
        """``sigma = (P H P) c`` (+ fused spin penalty if configured)."""
        if self._pallas_ok(c):
            return self._matvec_pallas(c)
        if self.col_block and c.shape[1] > self.col_block:
            return self._matvec_blocked(c)
        return self._matvec_full(c)

    def _pallas_ok(self, c: jax.Array) -> bool:
        """Dispatch the fused VMEM-resident kernel when it fits (f32, TPU)."""
        from . import pallas_matvec

        if c.dtype != jnp.float32:
            return False
        m, n = c.shape
        if not pallas_matvec.supports(m, n, self.norb * self.norb):
            return False
        backend = jax.default_backend()
        return backend in pallas_matvec.TPU_BACKENDS or pallas_matvec.FORCE_INTERPRET

    def _matvec_pallas(self, c: jax.Array) -> jax.Array:
        """Cross-spin channel via the fused Pallas kernel (+ XLA same-spin).

        Fusing the same-spin channels INTO the kernel was tried and measured
        SLOWER on chip (21.4 ms vs 16.0 ms composed at 1e6 dets): the
        scalar-driven neighbor-row loop and a second lane-pick cost more on
        the VPU than the XLA einsum-gathers cost in HBM traffic.

        The spin penalty's mixed term ``-shift * sum_pq E^a_pq E^b_qp`` has
        the same (coefficient x alpha-gather x beta-scatter) shape as the
        cross-spin contraction, so it rides the same kernel: subtract
        ``shift`` from ``eri_t[qp, pq]`` and add the remaining elementwise
        ``shift * (const - target) * c`` outside.
        """
        from . import pallas_matvec

        eri_eff = self.eri_t.astype(jnp.float32)
        if self.spin_shift != 0.0:
            npair = self.norb * self.norb
            perm = jnp.asarray(self._qp_perm())
            eri_eff = eri_eff.at[perm, jnp.arange(npair)].add(
                jnp.float32(-self.spin_shift)
            )
        interpret = (
            pallas_matvec.FORCE_INTERPRET
            and jax.default_backend() not in pallas_matvec.TPU_BACKENDS
        )
        n_a = int(self.nelec[0])
        ka = min(
            self.norb * self.norb, -(-(n_a * (self.norb - n_a + 1)) // 8) * 8
        )
        sigma = pallas_matvec.cross_spin_matvec(
            c, self.src_a, self.sign_a, self.src_b, self.sign_b, eri_eff,
            ka=ka,
            interpret=interpret,
            precision=PALLAS_MATMUL_PRECISION,
        )
        with jax.default_matmul_precision("highest"):
            sigma = sigma + self.apply_samespin_alpha(c) + self.apply_samespin_beta(c)
        if self.spin_shift != 0.0:
            n_a, n_b = self.nelec
            sz = 0.5 * (n_a - n_b)
            const = sz * sz + sz + n_b
            sigma = sigma + self.spin_shift * (const - self.spin_target) * c
        return sigma

    def _matvec_full(self, c: jax.Array) -> jax.Array:
        with jax.default_matmul_precision("highest"):
            return self.__matvec_full(c)

    def __matvec_full(self, c: jax.Array) -> jax.Array:
        dt = c.dtype
        m, n = c.shape
        npair = self.norb * self.norb
        d_a = self.gather_alpha(c)  # (npair, M, N)
        # cross-spin: sigma_ab = sum_rs E^b_rs [ sum_pq (pq|rs) E^a_pq c ]
        if self._use_chol(dt):
            g = self._chol_left(d_a.reshape(npair, m * n), dt).reshape(npair, m, n)
        else:
            g = jnp.matmul(
                self.eri_t.astype(dt), d_a.reshape(npair, m * n),
                preferred_element_type=dt,
            ).reshape(npair, m, n)
        sigma = self.scatter_beta(g)
        sigma = sigma + self.apply_samespin_alpha(c) + self.apply_samespin_beta(c)
        if self.spin_shift != 0.0:
            s2c = self.s2_apply_from_alpha(d_a, c)
            sigma = sigma + self.spin_shift * (s2c - self.spin_target * c)
        return sigma

    def _matvec_blocked(self, c: jax.Array) -> jax.Array:
        """Column-blocked application; strategy chosen by the G-buffer size.

        The alpha-first two-pass variant keeps a full ``(M, N, npair)`` G
        buffer in HBM but all its gathers move contiguous rows — measured
        ~46 ms/matvec at 1e6 determinants.  The beta-first single-pass
        variant needs no full-size intermediate (unlocking 1e7 determinants
        on one chip); measured 580 ms/matvec at 1e7.  (A row-tiled
        alpha-first single pass — the Pallas schedule in XLA — was measured
        6x SLOWER at 1e7: XLA lowers the per-(pair, column) beta picks at
        ~1 element/cycle, 2.6e9 picks/matvec; the beta-first form's column
        gathers move contiguous runs instead.)
        """
        m, n = c.shape
        g_bytes = self.norb * self.norb * m * n * c.dtype.itemsize
        with jax.default_matmul_precision("highest"):
            if g_bytes <= 4 * 1024**3:
                return self.__matvec_blocked(c)
            return self.__matvec_blocked_beta_first_rowmajor(c)

    def __matvec_blocked_beta_first_rowmajor(self, c: jax.Array) -> jax.Array:
        """Beta-first single pass tuned to XLA's measured gather behavior.

        Measured on a v5e at the 1.9e7-determinant CASCI shape (cb = 128):
        XLA gathers run at full bandwidth for large slices (the 17 KB beta
        row gathers: 1.5 ms/573 MB) but are SLICE-COUNT-bound at ~17 ns per
        slice for small ones — the naive alpha pick issues ``npair * M``
        512-byte slices and took 19 ms of the ~25 ms block.  Two fixes:

        * beta gathers read ROWS of the once-per-matvec transposed ``c``
          (contiguous ``m*4``-byte runs), with one bulk (full-bandwidth)
          transpose per block restoring the alpha-pick layout;
        * the alpha pick is COMPACTED to the ~``ne*(norb-ne+1)`` valid pairs
          per alpha row (same observation as the Pallas kernel): 4x fewer
          slices and none of the 77% zero-sign traffic.
        """
        dt = c.dtype
        m, n = c.shape
        npair = self.norb * self.norb
        cb = self.col_block
        nblk = n // cb
        if n % cb:
            raise ValueError(f"N = {n} must be a multiple of col_block = {cb}")
        ct = c.T  # (n, m): beta gathers become contiguous row reads
        sign_a_f = self.sign_a.astype(dt)
        sign_b_f = self.sign_b.astype(dt)
        # compact per-row valid-pair flat indices into g2t.reshape(npair*m, cb)
        n_a = int(self.nelec[0])
        ka = min(npair, n_a * (self.norb - n_a + 1))
        valid_a = self.sign_a != 0  # (npair, M)
        order_a = jnp.argsort(~valid_a, axis=0, stable=True)[:ka]  # (ka, M)
        ok_a = jnp.take_along_axis(valid_a, order_a, axis=0)
        src_sel = jnp.take_along_axis(self.src_a.astype(jnp.int32), order_a, axis=0)
        flat_rows = (order_a.astype(jnp.int32) * m + src_sel).T  # (M, ka)
        sign_sel = jnp.where(
            ok_a, jnp.take_along_axis(sign_a_f, order_a, axis=0), 0
        ).T  # (M, ka)
        nbr_val_a_f = self.nbr_val_a.astype(dt)
        nbr_val_b_f = self.nbr_val_b.astype(dt)
        eri_m = self.eri_t.astype(dt).T  # [pq, rs] = (pq|rs)
        with_penalty = self.spin_shift != 0.0
        if with_penalty:
            perm = jnp.asarray(self._qp_perm())
            src_qp = self.src_b[perm]
            sign_qp = self.sign_b[perm].astype(dt)
            n_a, n_b = self.nelec
            sz = 0.5 * (n_a - n_b)
            s2_const = sz * sz + sz + n_b

        def block(i, sigma):
            src_b_blk = jax.lax.dynamic_slice(self.src_b, (0, i * cb), (npair, cb))
            sgn_b_blk = jax.lax.dynamic_slice(sign_b_f, (0, i * cb), (npair, cb))
            # D_b in (npair, cb, m): row gathers of ct (contiguous m-runs)
            db = ct[src_b_blk] * sgn_b_blk[:, :, None]
            if self._use_chol(dt):
                g2 = self._chol_left(db.reshape(npair, cb * m), dt).reshape(
                    npair, cb, m
                )
            else:
                g2 = jnp.matmul(
                    eri_m, db.reshape(npair, cb * m), preferred_element_type=dt
                ).reshape(npair, cb, m)
            # bulk layout change -> (npair, m, cb) so the alpha picks below
            # read contiguous cb-runs
            g2 = jnp.transpose(g2, (0, 2, 1))
            picked = jnp.take(g2.reshape(npair * m, cb), flat_rows.reshape(-1), axis=0)
            sig_blk = jnp.einsum(
                "mk,mkc->mc", sign_sel, picked.reshape(m, ka, cb)
            )
            # same-spin alpha on this column block (row gathers of c_blk)
            c_blk = jax.lax.dynamic_slice(c, (0, i * cb), (m, cb))
            sig_blk = sig_blk + jnp.einsum(
                "jl,jlc->jc", nbr_val_a_f, c_blk[self.nbr_idx_a]
            )
            # same-spin beta for these output columns: row gathers of ct
            idx_b_blk = jax.lax.dynamic_slice(
                self.nbr_idx_b, (i * cb, 0), (cb, self.nbr_idx_b.shape[1])
            )
            val_b_blk = jax.lax.dynamic_slice(
                nbr_val_b_f, (i * cb, 0), (cb, nbr_val_b_f.shape[1])
            )
            picked_b = ct[idx_b_blk]  # (cb, Lb, m)
            sig_blk = sig_blk + jnp.einsum("kl,klm->mk", val_b_blk, picked_b)
            if with_penalty:
                srcq_blk = jax.lax.dynamic_slice(src_qp, (0, i * cb), (npair, cb))
                sgnq_blk = jax.lax.dynamic_slice(sign_qp, (0, i * cb), (npair, cb))
                # mixed term: d_a picked at the qp-permuted beta columns;
                # gather rows of ct then columns via take_along_axis on m-axis
                picked_m = ct[srcq_blk]  # (npair, cb, m)
                picked_m = jnp.take_along_axis(
                    jnp.transpose(picked_m, (0, 2, 1)),
                    self.src_a[:, :, None].astype(jnp.int32),
                    axis=1,
                )  # (npair, m, cb)
                mixed = jnp.einsum("pj,pc,pjc->jc", sign_a_f, sgnq_blk, picked_m)
                sig_blk = sig_blk + self.spin_shift * (
                    (s2_const - self.spin_target) * c_blk - mixed
                )
            return jax.lax.dynamic_update_slice(sigma, sig_blk, (0, i * cb))

        return jax.lax.fori_loop(0, nblk, block, jnp.zeros((m, n), dt))

    def __matvec_blocked_beta_first(self, c: jax.Array) -> jax.Array:
        dt = c.dtype
        m, n = c.shape
        npair = self.norb * self.norb
        cb = self.col_block
        nblk = n // cb
        if n % cb:
            raise ValueError(f"N = {n} must be a multiple of col_block = {cb}")
        sign_a_f = self.sign_a.astype(dt)
        sign_b_f = self.sign_b.astype(dt)
        nbr_val_a_f = self.nbr_val_a.astype(dt)
        nbr_val_b_f = self.nbr_val_b.astype(dt)
        eri_m = self.eri_t.astype(dt).T  # [pq, rs] = (pq|rs)
        with_penalty = self.spin_shift != 0.0
        if with_penalty:
            perm = jnp.asarray(self._qp_perm())
            src_qp = self.src_b[perm]
            sign_qp = self.sign_b[perm].astype(dt)
            n_a, n_b = self.nelec
            sz = 0.5 * (n_a - n_b)
            s2_const = sz * sz + sz + n_b

        def block(i, sigma):
            src_b_blk = jax.lax.dynamic_slice(self.src_b, (0, i * cb), (npair, cb))
            sgn_b_blk = jax.lax.dynamic_slice(sign_b_f, (0, i * cb), (npair, cb))
            # D_b for this output block: (m, npair, cb) column gathers of c
            db = jnp.take(c, src_b_blk, axis=1) * sgn_b_blk[None, :, :]
            db_t = jnp.transpose(db, (1, 0, 2)).reshape(npair, m * cb)
            if self._use_chol(dt):
                g2 = self._chol_left(db_t, dt).reshape(npair, m, cb)
            else:
                g2 = jnp.matmul(eri_m, db_t, preferred_element_type=dt).reshape(
                    npair, m, cb
                )
            # alpha application: row gathers within the block
            picked = jnp.take_along_axis(
                g2, self.src_a[:, :, None].astype(jnp.int32), axis=1
            )
            sig_blk = jnp.sum(sign_a_f[:, :, None] * picked, axis=0)
            # same-spin alpha on this column block
            c_blk = jax.lax.dynamic_slice(c, (0, i * cb), (m, cb))
            sig_blk = sig_blk + jnp.einsum(
                "jl,jlc->jc", nbr_val_a_f, c_blk[self.nbr_idx_a]
            )
            # same-spin beta for these output columns (sources = full c)
            idx_b_blk = jax.lax.dynamic_slice(
                self.nbr_idx_b, (i * cb, 0), (cb, self.nbr_idx_b.shape[1])
            )
            val_b_blk = jax.lax.dynamic_slice(
                nbr_val_b_f, (i * cb, 0), (cb, nbr_val_b_f.shape[1])
            )
            picked_b = jnp.take(c, idx_b_blk, axis=1)
            sig_blk = sig_blk + jnp.einsum("kl,mkl->mk", val_b_blk, picked_b)
            if with_penalty:
                srcq_blk = jax.lax.dynamic_slice(src_qp, (0, i * cb), (npair, cb))
                sgnq_blk = jax.lax.dynamic_slice(sign_qp, (0, i * cb), (npair, cb))
                # mixed term by direct double gather: c[src_a[pq,J], src_qp[pq,col]]
                picked_m = c[
                    self.src_a[:, :, None].astype(jnp.int32),
                    srcq_blk[:, None, :].astype(jnp.int32),
                ]  # (npair, m, cb)
                mixed = jnp.einsum("pj,pc,pjc->jc", sign_a_f, sgnq_blk, picked_m)
                sig_blk = sig_blk + self.spin_shift * (
                    (s2_const - self.spin_target) * c_blk - mixed
                )
            return jax.lax.dynamic_update_slice(sigma, sig_blk, (0, i * cb))

        return jax.lax.fori_loop(
            0, nblk, block, jnp.zeros((m, n), dt), unroll=BETA_FIRST_UNROLL
        )

    def __matvec_blocked(self, c: jax.Array) -> jax.Array:
        dt = c.dtype
        m, n = c.shape
        npair = self.norb * self.norb
        cb = self.col_block
        nblk = n // cb
        if n % cb:
            raise ValueError(f"N = {n} must be a multiple of col_block = {cb}")
        sign_a_f = self.sign_a.astype(dt)
        eri_m = self.eri_t.astype(dt).T  # [pq, rs] = (pq|rs)
        with_penalty = self.spin_shift != 0.0

        def pass1(i, bufs):
            gt, dat = bufs
            blk = jax.lax.dynamic_slice(c, (0, i * cb), (m, cb))
            d = sign_a_f[:, :, None] * blk[self.src_a]  # (npair, m, cb)
            d_t = jnp.transpose(d, (1, 2, 0)).reshape(m * cb, npair)
            if self._use_chol(dt):
                g_blk = self._chol_right(d_t, dt)
            else:
                g_blk = jnp.matmul(d_t, eri_m, preferred_element_type=dt)
            gt = jax.lax.dynamic_update_slice(
                gt, g_blk.reshape(m, cb, npair), (0, i * cb, 0)
            )
            if with_penalty:
                dat = jax.lax.dynamic_update_slice(
                    dat, jnp.transpose(d, (1, 2, 0)), (0, i * cb, 0)
                )
            return gt, dat

        gt0 = jnp.zeros((m, n, npair), dt)
        dat0 = jnp.zeros((m, n, npair), dt) if with_penalty else jnp.zeros((1, 1, 1), dt)
        gt, dat = jax.lax.fori_loop(0, nblk, pass1, (gt0, dat0))

        perm = jnp.asarray(self._qp_perm())
        src_qp = self.src_b[perm]
        sign_qp = self.sign_b[perm].astype(dt)
        sign_b_f = self.sign_b.astype(dt)
        nbr_val_b_f = self.nbr_val_b.astype(dt)
        n_a, n_b = self.nelec
        sz = 0.5 * (n_a - n_b)
        s2_const = sz * sz + sz + n_b

        def pass2(i, sigma):
            cols = slice(None)  # noqa: F841  (clarity)
            src_blk = jax.lax.dynamic_slice(self.src_b, (0, i * cb), (npair, cb))
            sgn_blk = jax.lax.dynamic_slice(sign_b_f, (0, i * cb), (npair, cb))
            # cross-spin: sum_rs sign_b[rs, col] * G'[j, src_b[rs, col], rs]
            picked = gt[:, src_blk.T, jnp.arange(npair)[None, :]]  # (m, cb, npair)
            sig_blk = jnp.einsum("jcr,rc->jc", picked, sgn_blk)
            # same-spin alpha on this block (row gathers of the column block)
            blk = jax.lax.dynamic_slice(c, (0, i * cb), (m, cb))
            sig_blk = sig_blk + jnp.einsum(
                "jl,jlc->jc", self.nbr_val_a.astype(dt), blk[self.nbr_idx_a]
            )
            # same-spin beta for these output columns (gathers across blocks)
            idx_b_blk = jax.lax.dynamic_slice(
                self.nbr_idx_b, (i * cb, 0), (cb, self.nbr_idx_b.shape[1])
            )
            val_b_blk = jax.lax.dynamic_slice(
                nbr_val_b_f, (i * cb, 0), (cb, nbr_val_b_f.shape[1])
            )
            picked_b = jnp.take(c, idx_b_blk, axis=1)  # (m, cb, Lb)
            sig_blk = sig_blk + jnp.einsum("kl,mkl->mk", val_b_blk, picked_b)
            if with_penalty:
                srcq_blk = jax.lax.dynamic_slice(src_qp, (0, i * cb), (npair, cb))
                sgnq_blk = jax.lax.dynamic_slice(sign_qp, (0, i * cb), (npair, cb))
                picked_s2 = dat[:, srcq_blk.T, jnp.arange(npair)[None, :]]
                mixed = jnp.einsum("jcr,rc->jc", picked_s2, sgnq_blk)
                sig_blk = sig_blk + self.spin_shift * (
                    s2_const * blk - mixed - self.spin_target * blk
                )
            return jax.lax.dynamic_update_slice(sigma, sig_blk, (0, i * cb))

        return jax.lax.fori_loop(0, nblk, pass2, jnp.zeros((m, n), dt))


@partial(jax.jit, static_argnames=("row_block", "spin_penalty", "force_chunked"))
def expectation_value(
    ham: SCIHamiltonian,
    c: jax.Array,
    *,
    row_block: int = 32,
    spin_penalty: bool = True,
    force_chunked: bool = False,
):
    """``<c|H|c> / <c|c>`` to ~1e-9 relative accuracy ON TPU hardware.

    TPU has no f64 MXU: XLA lowers "f64" dot_generals to passes whose
    accumulation is f32-grade, so a plain f64 matvec + vdot carries ~1e-5
    relative noise at K = 10^6 (measured against host-f64 ground truth).
    This evaluator restores full accuracy from exact-f32 data:

    * cross-spin: ``pab[pq, rs] = <E^a_pq c, E^b_rs c>`` accumulated over
      alpha-row blocks — each block is one f32-HIGHEST matmul with short K
      (``row_block * N``, negligible accumulation walk), summed across
      blocks in true f64 (elementwise f64 adds are software-exact).  The
      f64 integrals enter only in the final elementwise contraction.
    * same-spin: per-neighbor row dots in f32-HIGHEST (K = N or M), scaled
      by the exact f64 neighbor values.
    * f64 input vectors are split ``c = c32 + c_lo``; the cross term
      ``2 <c_lo, H c32>`` only needs ~1e-2 relative accuracy (|c_lo| <=
      6e-8 |c|), so one plain f32 matvec covers it.

    The fused spin penalty (``ham.spin_shift``) is included, reusing pab's
    qp-diagonal for the mixed term.  Memory: O(npair * row_block * N), so
    this also runs at 10^7 determinants where the f64 matvec cannot.
    """
    m, n = ham.shape
    npair = ham.norb * ham.norb
    f64 = jnp.float64

    if jax.default_backend() == "cpu" and not force_chunked:
        # CPU f64 matmuls are true f64 — the plain Rayleigh quotient is
        # exact there (and the <1e-8 Ha guarantees rest on it).
        ham_e = ham.astype(f64)
        if not spin_penalty and ham.spin_shift != 0.0:
            ham_e = _dc_replace(ham_e, spin_shift=0.0)
        c64 = c.astype(f64).reshape(m, n)
        hv = ham_e.matvec(c64).reshape(-1)
        cf = c64.reshape(-1)
        return jnp.vdot(cf, hv) / jnp.vdot(cf, cf)

    c32 = c.astype(jnp.float32).reshape(m, n)
    HI = jax.lax.Precision.HIGHEST

    # H's ENTIRE diagonal is evaluated exactly instead: hdiag is f64-exact
    # from the build, and sum(hdiag * c^2) is elementwise f64 (software-exact
    # on TPU).  The diagonal carries the large non-cancelling magnitudes
    # (|diag| ~ |E|), so leaving it in the f32-chunked channels costs
    # ~eps_f32 * |E| (measured 4e-6 abs at |E| ~ 100 on the bench problem);
    # excluding it leaves the off-diagonal channels, whose contributions are
    # small and sign-mixed, for the f32 matmuls.  Exclusions: the same-spin
    # self-neighbors (candidate 0) and the cross-spin (pp, qq) pair block.
    e_dd = jnp.sum(ham.hdiag.astype(f64) * c32.astype(f64) ** 2)
    nbr_val_a_od = jnp.where(
        ham.nbr_idx_a == jnp.arange(m, dtype=ham.nbr_idx_a.dtype)[:, None],
        0.0,
        ham.nbr_val_a.astype(f64),
    )
    nbr_val_b_od = jnp.where(
        ham.nbr_idx_b == jnp.arange(n, dtype=ham.nbr_idx_b.dtype)[:, None],
        0.0,
        ham.nbr_val_b.astype(f64),
    )

    m_pad = -(-m // row_block) * row_block
    pad = ((0, 0), (0, m_pad - m))
    src_a = jnp.pad(ham.src_a, pad)
    sign_a = jnp.pad(ham.sign_a, pad).astype(jnp.float32)
    sign_b32 = ham.sign_b.astype(jnp.float32)
    c_p = jnp.pad(c32, ((0, m_pad - m), (0, 0)))
    nbr_idx_a = jnp.pad(ham.nbr_idx_a, ((0, m_pad - m), (0, 0)))
    nbr_val_a = jnp.pad(nbr_val_a_od, ((0, m_pad - m), (0, 0)))
    la = nbr_idx_a.shape[1]

    def body(b, carry):
        pab, e_ss = carry
        i0 = b * row_block
        sa = jax.lax.dynamic_slice(src_a, (0, i0), (npair, row_block))
        ga = jax.lax.dynamic_slice(sign_a, (0, i0), (npair, row_block))
        d_a = ga[:, :, None] * c_p[sa]
        c_blk = jax.lax.dynamic_slice(c_p, (i0, 0), (row_block, n))
        d_b = jnp.swapaxes(jnp.take(c_blk, ham.src_b, axis=1), 0, 1) * sign_b32[:, None, :]
        blk = jnp.matmul(
            d_a.reshape(npair, -1),
            d_b.reshape(npair, -1).T,
            preferred_element_type=jnp.float32,
            precision=HI,
        )
        # same-spin alpha rows in this block: r[j, l] = <c[nbr[j, l]], c[j]>
        ia = jax.lax.dynamic_slice(nbr_idx_a, (i0, 0), (row_block, la))
        va = jax.lax.dynamic_slice(nbr_val_a, (i0, 0), (row_block, la))
        r_a = jnp.einsum(
            "jln,jn->jl", c_p[ia], c_blk,
            preferred_element_type=jnp.float32, precision=HI,
        )
        e_ss = e_ss + jnp.sum(va * r_a.astype(f64))
        return pab + blk.astype(f64), e_ss

    pab, e_ss_a = jax.lax.fori_loop(
        0, m_pad // row_block, body,
        (jnp.zeros((npair, npair), f64), jnp.zeros((), f64)),
    )
    eri64 = ham.eri_t.astype(f64)
    e = jnp.sum(eri64 * pab.T) + e_ss_a + e_dd
    # subtract the cross-spin (pp, qq) pair block AS COMPUTED in f32 — its
    # exact value is hdiag's cross part, already inside e_dd
    pp = jnp.arange(ham.norb) * (ham.norb + 1)
    diag_block = pab[jnp.ix_(pp, pp)]  # [p, q] = <E^a_pp c, E^b_qq c>
    e2 = eri64[jnp.ix_(pp, pp)]  # [q, p] = (pp|qq)
    e = e - jnp.sum(e2.T * diag_block)

    # same-spin beta: column-blocked row dots on the transposed amplitudes
    ct = c32.T  # (n, m)
    lb = ham.nbr_idx_b.shape[1]
    n_pad = -(-n // row_block) * row_block
    ct_p = jnp.pad(ct, ((0, n_pad - n), (0, 0)))
    nbr_idx_b = jnp.pad(ham.nbr_idx_b, ((0, n_pad - n), (0, 0)))
    nbr_val_b = jnp.pad(nbr_val_b_od, ((0, n_pad - n), (0, 0)))

    def body_b(b, e_acc):
        k0 = b * row_block
        ib = jax.lax.dynamic_slice(nbr_idx_b, (k0, 0), (row_block, lb))
        vb = jax.lax.dynamic_slice(nbr_val_b, (k0, 0), (row_block, lb))
        ct_blk = jax.lax.dynamic_slice(ct_p, (k0, 0), (row_block, m))
        r_b = jnp.einsum(
            "kln,kn->kl", ct_p[ib], ct_blk,
            preferred_element_type=jnp.float32, precision=HI,
        )
        return e_acc + jnp.sum(vb * r_b.astype(f64))

    e = e + jax.lax.fori_loop(0, n_pad // row_block, body_b, jnp.zeros((), f64))

    if spin_penalty and ham.spin_shift != 0.0:
        # <c, sum_pq E^a_pq E^b_qp c> = sum_pq <E^a_qp c, E^b_qp c> = tr(pab)
        n_a, n_b = ham.nelec
        sz = 0.5 * (n_a - n_b)
        const = sz * sz + sz + n_b
        nrm32 = jnp.sum(c32.astype(f64) * c32.astype(f64))
        s2_expect = const * nrm32 - jnp.trace(pab)
        e = e + ham.spin_shift * (s2_expect - ham.spin_target * nrm32)

    c64 = c.astype(f64).reshape(m, n)
    nrm = jnp.sum(c64 * c64)
    if c.dtype == f64:
        # low part correction: 2 <c_lo, H c32> at f32 accuracy is plenty
        c_lo = (c64 - c32.astype(f64)).astype(jnp.float32).reshape(-1)
        ham32 = ham.astype(jnp.float32)
        if not spin_penalty and ham.spin_shift != 0.0:
            ham32 = _dc_replace(ham32, spin_shift=0.0)
        hv32 = ham32.matvec(c32).reshape(-1)
        e = e + 2.0 * jnp.vdot(c_lo.astype(f64), hv32.astype(f64))
    return e / nrm


def _qp_perm_np(norb: int) -> np.ndarray:
    p, q = np.divmod(np.arange(norb * norb), norb)
    return q * norb + p


def sci_matvec_flat(ham: SCIHamiltonian, x: jax.Array) -> jax.Array:
    """Flat-vector matvec adapter for the Davidson driver.

    Module-level (stable identity) so jit caches one compiled program per
    shape bucket; the Hamiltonian travels as a pytree operand.
    """
    m, n = ham.shape
    return ham.matvec(x.reshape(m, n)).reshape(-1)


def _occupancy_np(packed: np.ndarray, norb: int) -> np.ndarray:
    """Host (N, norb) 0/1 occupation matrix from packed uint32 strings."""
    packed = np.asarray(packed, np.uint32)
    out = np.empty((packed.shape[0], norb), np.float64)
    for p in range(norb):
        out[:, p] = (packed[:, p // 32] >> (p % 32)) & 1
    return out


def _hdiag_np(occ_a, occ_b, h1e, eri) -> np.ndarray:
    """Diagonal ``<Ia Ib|H|Ia Ib>`` on the HOST in true f64.

    The diagonal must be EXACT: :func:`expectation_value` evaluates the full
    diagonal contribution through it (elementwise f64), and on TPU a device
    "f64" matmul accumulates at f32 grade — 1e-5-scale noise on entries of
    magnitude |E|.  NumPy work is O((M+N) * norb^2) + an (M, N) outer sum.
    """
    a_part, b_part, w = _hdiag_parts_np(occ_a, occ_b, h1e, eri)
    return a_part[:, None] + b_part[None, :] + occ_a @ w.T


def _hdiag_parts_np(occ_a, occ_b, h1e, eri):
    """Host-exact rank-structured pieces of the diagonal.

    ``hd = a_part[:, None] + b_part[None, :] + occ_a @ w.T`` with
    ``w = occ_b @ J^T`` — O((M+N) * norb^2) host work; the (M, N) assembly
    can then run on device (:func:`_hdiag_device`) so only O((M+N)*norb)
    operands ever cross the host->device link.
    """
    h1e = np.asarray(h1e, np.float64)
    eri = np.asarray(eri, np.float64)
    hd = np.diagonal(h1e)
    jm = np.einsum("ppqq->pq", eri)
    km = np.einsum("pqqp->pq", eri)
    jk = jm - km
    a_part = occ_a @ hd + 0.5 * np.einsum("ip,pq,iq->i", occ_a, jk, occ_a)
    b_part = occ_b @ hd + 0.5 * np.einsum("ip,pq,iq->i", occ_b, jk, occ_b)
    w = occ_b @ jm.T
    return a_part, b_part, w


@partial(jax.jit, static_argnames=("out_dtype",))
def _hdiag_device(a_part, b_part, occ_a, w, *, out_dtype):
    """Assemble the exact diagonal ON DEVICE from O((M+N)*norb) operands.

    ``hd[i, j] = a_part[i] + b_part[j] + sum_p occ_a[i, p] * w[j, p]`` with
    ``w = occ_b @ J^T`` precomputed exactly on the host.  Every device op is
    ELEMENTWISE f64 (software-exact on TPU — the forbidden thing is f64
    dot_generals, which accumulate at f32 grade): ``occ_a`` entries are 0/1
    so each product is an exact selection, and the ``norb`` sequential f64
    adds are rounding-correct.  Measured 5.4e-13 max abs error vs the host
    f64 oracle at 1e6 dets (probes/table_build_split.py) — the win is never
    moving the (M, N) f64 diagonal over the tunnel (156 MB at 1.9e7 dets,
    ~3.3 s at the measured ~47 MB/s).
    """
    norb = occ_a.shape[1]
    # UNROLLED accumulation (norb is small and static): a fori_loop here
    # carries the full (M, N) f64 accumulator through every iteration — 16
    # read+write round trips of the 152 MB buffer in emulated f64 (measured
    # ~10 s at 1.9e7 dets).  Unrolled, XLA fuses the whole expression into
    # one elementwise pass that writes the diagonal once; the sequential
    # per-element adds keep the f64 rounding-correct order.
    acc = a_part[:, None] + b_part[None, :]
    for p in range(norb):
        acc = acc + occ_a[:, p : p + 1] * w[None, :, p]
    return acc.astype(out_dtype)


def pivoted_cholesky_pairs(
    eri: np.ndarray, norb: int, *, tol: float = 1e-13, max_rank: int | None = None
) -> np.ndarray | None:
    """Pivoted Cholesky factor ``L (X, npair)`` of ``V[pq, rs] = (pq|rs)``.

    Physical ERIs are symmetric PSD over the pair index with numerical rank
    X ~ 6-10x norb (the density-fitting/Cholesky-decomposition observation),
    far below npair = norb^2 for large active spaces.  Factoring turns the
    cross-spin pair contraction from one (npair, npair) matmul into two thin
    ones — 4*X*npair*dim FLOPs instead of 2*npair^2*dim.

    Returns None when V is not symmetric PSD to ``tol`` (e.g. the random
    test integrals), when the rank budget is exhausted before convergence,
    or when the residual check fails — callers then keep the exact path.
    Host cost is O(npair^2 * X) (f64 NumPy), well under a second at 36
    orbitals.
    """
    npair = norb * norb
    v = np.asarray(eri, np.float64).reshape(npair, npair)
    if not np.array_equal(v, v.T) and not np.allclose(v, v.T, atol=1e-12, rtol=0.0):
        return None
    d = np.diagonal(v).copy()
    d0 = float(d.max(initial=0.0))
    if d0 <= 0.0:
        return None
    cap = npair if max_rank is None else int(max_rank)
    ell = np.zeros((cap, npair))
    k = 0
    converged = False
    while k < cap:
        p = int(np.argmax(d))
        piv = float(d[p])
        if piv <= tol * d0:
            converged = True
            break
        row = v[p] - ell[:k, p] @ ell[:k]
        ell[k] = row / np.sqrt(piv)
        d -= ell[k] * ell[k]
        d[p] = 0.0
        k += 1
    if not converged and float(d.max(initial=0.0)) > tol * d0:
        return None
    ell = ell[:k].copy()
    if k == 0:
        return None
    # the pivot recursion assumes PSD; verify the reconstruction on an
    # indefinite or ill-conditioned V before anything trusts the factor
    err = float(np.abs(ell.T @ ell - v).max())
    if err > 100.0 * tol * d0:
        return None
    return ell


def _auto_col_block(npair: int, m_pad: int, n_pad: int) -> int:
    """Beta-column block size for the cross-spin channel (0 = unblocked).

    Unblocked full path up to ~320M G-elements (1.25 GB f32): measured 0.52s
    vs 0.62s for the cb=128 blocked loop at 1e6 dets.  Beyond the budget,
    column-block with ~48M-element tiles, floored at 128 lanes — the floor is
    right for the production norb=16 shapes (572 MB (npair, cb, m) buffers at
    1.9e7 dets run fine).  But in the large-norb regime (npair = norb^2 >=
    ~1000) a 128-lane block is GBs: at 36 orbitals x 1e7 dets one blocked
    step allocated 3 x 2.1 GB temporaries and CRASHED the TPU worker.  Past
    a hard per-buffer cap, memory beats lane alignment: shrink cb below 128
    (multiple of 8; the beta row gathers stay m-contiguous, only the alpha
    pick pays smaller slices)."""
    budget_elems = 320 * 1024 * 1024
    if npair * m_pad * n_pad <= budget_elems:
        return 0
    blk_elems = 48 * 1024 * 1024
    cb = max(128, min(n_pad, blk_elems // (npair * m_pad)))
    cb = max(128, (cb // 128) * 128)
    hard_cap_elems = 144 * 1024 * 1024  # ~576 MB f32 per buffer
    if npair * m_pad * cb > hard_cap_elems:
        cb = max(8, (hard_cap_elems // (npair * m_pad) // 8) * 8)
    return cb if cb < n_pad else 0


def build_sci_hamiltonian(
    strs_a_packed: np.ndarray,
    strs_b_packed: np.ndarray,
    h1e: np.ndarray,
    eri: np.ndarray,
    norb: int,
    nelec: tuple[int, int],
    *,
    spin_shift: float = 0.0,
    spin_target: float = 0.0,
    dtype=jnp.float64,
    pad_to: tuple[int, int] | None = None,
    col_block: int | str = "auto",
    tables_backend: str = "auto",
    table_cache=None,
    eri_factor: np.ndarray | str | None = "auto",
) -> SCIHamiltonian:
    """Assemble the device-resident projected Hamiltonian.

    Args:
        strs_a_packed / strs_b_packed: sorted unique packed CI strings.
        h1e, eri: integrals (chemist convention) — host numpy, moved to HBM.
        norb: number of spatial orbitals.
        nelec: (n_alpha, n_beta).
        spin_shift / spin_target: fused penalty ``shift * (S^2 - target)``.
        dtype: working dtype of coefficient arrays / hdiag.
        pad_to: optional (M_pad, N_pad) — padded determinants are inert
            (sentinel gather entries, huge hdiag) so bucketing subspace sizes
            avoids XLA recompilation storms (SURVEY.md §7 hard part #2).
        tables_backend: ``"auto"`` (default) uses the native C++ host table
            kernels when available and falls back to ``"device"``;
            ``"native"`` requires them; ``"device"`` builds every table with
            the jitted on-device kernels from the packed strings — no host
            table compute, and only O((M+N)*norb) diagonal pieces cross the
            host->device link above ``DEVICE_DIAG_MIN_ELEMS``
            (``probes/device_tables.py`` stages the on-chip timing).
        table_cache: optional :class:`sqd_tpu.ops.table_cache.TableCache` —
            reuses the set-independent per-string halves of the table build
            across calls whose string sets overlap (the orchestrator's
            carryover regime); membership is re-resolved per set.
        eri_factor: pivoted-Cholesky acceleration of the cross-spin pair
            contraction in the f32 matvec paths (f64 paths always use the
            exact integrals).  ``"auto"`` (default) attempts the host
            factorization for npair > 256 and accepts it when the pair
            matrix is symmetric PSD with rank <= npair // 3 — physical ERIs
            factor at X ~ 6-10x norb, turning the 2*npair^2*dim matmul into
            4*X*npair*dim.  ``None`` disables; an explicit ``(X, npair)``
            array is used as given (trusted).
    """
    m, n = np.asarray(strs_a_packed).shape[0], np.asarray(strs_b_packed).shape[0]
    n_a, n_b = (int(x) for x in nelec)
    # Validate Hamming weight against nelec BEFORE any table build: the native
    # same-spin kernel sizes its occupied/virtual scratch from nelec, so a
    # mismatched string set must fail loudly here, never downstream.
    for name, packed, want in (("alpha", strs_a_packed, n_a), ("beta", strs_b_packed, n_b)):
        counts = np.bitwise_count(np.asarray(packed, np.uint32)).sum(axis=-1)
        if counts.size and not np.all(counts == want):
            bad = int(counts[counts != want][0])
            raise ValueError(
                f"{name} CI strings have Hamming weight {bad}, expected nelec = {want}"
            )
    # --- choose the beta-column block size for the cross-spin channel -------
    # (pure host logic — resolved BEFORE any transfer so the native path can
    # pad on the host and ship final arrays in one batched device_put)
    npair = norb * norb
    m_pad, n_pad = pad_to if pad_to is not None else (m, n)
    if m_pad < m or n_pad < n:
        raise ValueError(f"pad_to {pad_to} smaller than subspace ({m}, {n})")
    if col_block == "auto":
        col_block = _auto_col_block(npair, m_pad, n_pad)
        if npair * m_pad * n_pad > 32 * 1024 * 1024:
            # lane/sublane alignment for the unblocked, row-tiled and Pallas
            # paths (padded determinants are inert)
            m_pad = -(-m_pad // 8) * 8
            n_pad = -(-n_pad // 128) * 128
    col_block = int(col_block)
    if col_block:
        n_pad = -(-n_pad // col_block) * col_block  # blocked pass needs N % cb == 0
    pad_m, pad_n = m_pad - m, n_pad - n

    # Table build: the native C++ host path avoids a per-shape XLA compile
    # (minutes on a tunneled TPU) and is faster in absolute terms; the device
    # path remains as reference/fallback and is exercised by tests directly.
    if tables_backend not in ("auto", "native", "device"):
        raise ValueError(
            f"unknown tables_backend {tables_backend!r} "
            "(expected 'auto', 'native' or 'device')"
        )
    use_native = False
    if tables_backend == "auto":
        from .. import native

        use_native = native.available()
    elif tables_backend == "native":
        from .. import native

        if not native.available():
            raise RuntimeError("native tables requested but libsqdcore is unavailable")
        use_native = True
    occ_a_h = _occupancy_np(np.asarray(strs_a_packed, np.uint32), norb)
    occ_b_h = _occupancy_np(np.asarray(strs_b_packed, np.uint32), norb)
    np_dtype = np.dtype(dtype)
    eri_t_h = np.ascontiguousarray(
        np.asarray(eri, np.float64).reshape(npair, npair).T
    ).astype(np_dtype, copy=False)
    eri_chol_h = None
    if isinstance(eri_factor, np.ndarray):
        eri_chol_h = np.ascontiguousarray(eri_factor, np.float64)
        if eri_chol_h.ndim != 2 or eri_chol_h.shape[1] != npair:
            raise ValueError(
                f"eri_factor must be (X, {npair}), got {eri_chol_h.shape}"
            )
    elif eri_factor == "auto" and npair > 256:
        eri_chol_h = pivoted_cholesky_pairs(eri, norb, max_rank=npair // 3)
    elif eri_factor not in (None, "auto"):
        raise ValueError(f"unknown eri_factor {eri_factor!r}")
    if use_native:
        from .. import native

        h1_np = np.asarray(h1e, np.float64)
        eri_np = np.asarray(eri, np.float64)

        def _cacheable(ne: int) -> bool:
            # The cache stores SET-INDEPENDENT per-string rows at the FULL
            # candidate width.  At high filling that width explodes (27e/36o:
            # 12,880 slots = ~130 KB/string) while the intersection-driven
            # fresh build is sub-second — caching would cost more memory
            # than it saves time.
            nv = norb - ne
            return 1 + ne * nv + (ne * (ne - 1) // 2) * (nv * (nv - 1) // 2) <= 4096

        if (
            table_cache is not None
            and table_cache.usable(np.asarray(strs_a_packed, np.uint32))
            and _cacheable(n_a)
            and _cacheable(n_b)
        ):
            src_a_h, sign_a_h = table_cache.gather_tables(strs_a_packed, norb)
            src_b_h, sign_b_h = table_cache.gather_tables(strs_b_packed, norb)
            ia, va = table_cache.samespin_tables(strs_a_packed, h1_np, eri_np, norb, n_a)
            ib, vb = table_cache.samespin_tables(strs_b_packed, h1_np, eri_np, norb, n_b)
        else:
            src_a_h, sign_a_h = native.gather_tables(strs_a_packed, norb)
            src_b_h, sign_b_h = native.gather_tables(strs_b_packed, norb)
            ia, va = native.samespin_tables(strs_a_packed, h1_np, eri_np, norb, n_a)
            ib, vb = native.samespin_tables(strs_b_packed, h1_np, eri_np, norb, n_b)
        # Above ~4M determinants the (M, N) f64 diagonal dominates transfer
        # volume (156 MB at 1.9e7 dets, ~3.3 s at the tunnel's ~47 MB/s):
        # ship only its O((M+N)*norb) rank-structured pieces and assemble on
        # device (:func:`_hdiag_device`, exact to ~5e-13).  Below that the
        # host-materialized diagonal transfers in O(100 ms) and avoids the
        # extra per-shape compile.
        device_diag = m_pad * n_pad >= DEVICE_DIAG_MIN_ELEMS
        if device_diag:
            a_part_h, b_part_h, w_h = _hdiag_parts_np(occ_a_h, occ_b_h, h1e, eri)
            occ_ad_h = occ_a_h
        else:
            hd_h = _hdiag_np(occ_a_h, occ_b_h, h1e, eri)
        if pad_m or pad_n:
            # all tables are clamped (invalid -> index 0 with zero weight), so
            # padding just extends them with zero-weight entries; padded
            # diagonal entries are pushed to 1e30 so padded determinants stay
            # inert under the Davidson preconditioner.
            src_a_h = np.pad(src_a_h, ((0, 0), (0, pad_m)))
            sign_a_h = np.pad(sign_a_h, ((0, 0), (0, pad_m)))
            src_b_h = np.pad(src_b_h, ((0, 0), (0, pad_n)))
            sign_b_h = np.pad(sign_b_h, ((0, 0), (0, pad_n)))
            ia = np.pad(ia, ((0, pad_m), (0, 0)))
            va = np.pad(va, ((0, pad_m), (0, 0)))
            ib = np.pad(ib, ((0, pad_n), (0, 0)))
            vb = np.pad(vb, ((0, pad_n), (0, 0)))
            if device_diag:
                a_part_h = np.pad(a_part_h, (0, pad_m), constant_values=1e30)
                b_part_h = np.pad(b_part_h, (0, pad_n), constant_values=1e30)
                occ_ad_h = np.pad(occ_ad_h, ((0, pad_m), (0, 0)))
                w_h = np.pad(w_h, ((0, pad_n), (0, 0)))
            else:
                hd_h = np.pad(hd_h, ((0, pad_m), (0, pad_n)), constant_values=1e30)
        # ONE batched device_put of final, host-padded, host-cast arrays.
        # The tunnel charges ~30-60 ms per individual transfer call PLUS a
        # per-process XLA compile for every device-side pad/convert op (none
        # of which persist — they compile in <1 s): measured 7.0 s of
        # "build" against 0.75 s of actual transfer at 1e6 dets.  A single
        # pytree put is bandwidth-bound (~47 MB/s on this tunnel) instead
        # (probes/table_build_split.py).
        payload = {
            "src_a": src_a_h,
            "sign_a": sign_a_h,
            "src_b": src_b_h,
            "sign_b": sign_b_h,
            "nbr_idx_a": ia,
            "nbr_val_a": va.astype(np_dtype, copy=False),
            "nbr_idx_b": ib,
            "nbr_val_b": vb.astype(np_dtype, copy=False),
            "eri_t": eri_t_h,
        }
        if eri_chol_h is not None:
            payload["eri_chol"] = eri_chol_h
        if device_diag:
            payload["a_part"] = a_part_h
            payload["b_part"] = b_part_h
            payload["occ_a"] = occ_ad_h
            payload["w"] = w_h
        else:
            payload["hdiag"] = hd_h.astype(np_dtype, copy=False)
        dev = jax.device_put(payload)
        src_a, sign_a = dev["src_a"], dev["sign_a"]
        src_b, sign_b = dev["src_b"], dev["sign_b"]
        nbr_idx_a, nbr_val_a = dev["nbr_idx_a"], dev["nbr_val_a"]
        nbr_idx_b, nbr_val_b = dev["nbr_idx_b"], dev["nbr_val_b"]
        eri_t = dev["eri_t"]
        eri_chol = dev.get("eri_chol")
        if device_diag:
            hd = _hdiag_device(
                dev["a_part"], dev["b_part"], dev["occ_a"], dev["w"],
                out_dtype=np_dtype,
            )
        else:
            hd = dev["hdiag"]
    else:  # tables_backend="device": jitted builds from the packed strings
        strs_a = jnp.asarray(strs_a_packed)
        strs_b = jnp.asarray(strs_b_packed)
        h1e_d = jnp.asarray(h1e, dtype)
        eri_d = jnp.asarray(eri, dtype)
        src_a, sign_a = linktab.build_gather_tables(strs_a, norb)
        src_b, sign_b = linktab.build_gather_tables(strs_b, norb)
        nbr_idx_a, nbr_val_a = build_samespin_tables(strs_a, h1e_d, eri_d, norb, n_a)
        nbr_idx_b, nbr_val_b = build_samespin_tables(strs_b, h1e_d, eri_d, norb, n_b)
        # same transfer policy as the native branch: above the threshold,
        # ship only the O((M+N)*norb) rank-structured diagonal pieces and
        # assemble the exact (M, N) f64 diagonal on device
        if m_pad * n_pad >= DEVICE_DIAG_MIN_ELEMS:
            a_part_h, b_part_h, w_h = _hdiag_parts_np(occ_a_h, occ_b_h, h1e, eri)
            if pad_m or pad_n:
                a_part_h = np.pad(a_part_h, (0, pad_m), constant_values=1e30)
                b_part_h = np.pad(b_part_h, (0, pad_n), constant_values=1e30)
                w_h = np.pad(w_h, ((0, pad_n), (0, 0)))
            occ_ad_h = np.pad(occ_a_h, ((0, pad_m), (0, 0))) if pad_m else occ_a_h
            hd = _hdiag_device(
                jnp.asarray(a_part_h), jnp.asarray(b_part_h),
                jnp.asarray(occ_ad_h), jnp.asarray(w_h), out_dtype=np_dtype,
            )
        else:
            hd_h = _hdiag_np(occ_a_h, occ_b_h, h1e, eri)
            if pad_m or pad_n:
                hd_h = np.pad(
                    hd_h, ((0, pad_m), (0, pad_n)), constant_values=1e30
                )
            hd = jnp.asarray(hd_h, dtype)
        if pad_m or pad_n:
            src_a = jnp.pad(src_a, ((0, 0), (0, pad_m)))
            sign_a = jnp.pad(sign_a, ((0, 0), (0, pad_m)))
            src_b = jnp.pad(src_b, ((0, 0), (0, pad_n)))
            sign_b = jnp.pad(sign_b, ((0, 0), (0, pad_n)))
            nbr_idx_a = jnp.pad(nbr_idx_a, ((0, pad_m), (0, 0)))
            nbr_val_a = jnp.pad(nbr_val_a, ((0, pad_m), (0, 0)))
            nbr_idx_b = jnp.pad(nbr_idx_b, ((0, pad_n), (0, 0)))
            nbr_val_b = jnp.pad(nbr_val_b, ((0, pad_n), (0, 0)))
        eri_t = jnp.asarray(eri_t_h)
        eri_chol = None if eri_chol_h is None else jnp.asarray(eri_chol_h)
    return SCIHamiltonian(
        src_a=src_a,
        sign_a=sign_a,
        src_b=src_b,
        sign_b=sign_b,
        nbr_idx_a=nbr_idx_a,
        nbr_val_a=nbr_val_a,
        nbr_idx_b=nbr_idx_b,
        nbr_val_b=nbr_val_b,
        eri_t=eri_t,
        hdiag=hd,
        eri_chol=eri_chol,
        norb=norb,
        nelec=(n_a, n_b),
        spin_shift=float(spin_shift),
        spin_target=float(spin_target),
        col_block=col_block,
    )
