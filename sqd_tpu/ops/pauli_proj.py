# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Pauli-operator projection onto a computational-basis subspace (device kernels).

TPU-native replacement for the reference's per-term JAX kernels + explicit
``scipy.sparse.coo_matrix`` accumulation (``qubit.py:78-144, 167-300``;
SURVEY.md C14/C15/N5).  Differences by design:

* Bitstrings are packed uint32 words — the reference's 63-qubit ceiling
  (``qubit.py:62``) does not exist here.
* For each Pauli term ``P = (z, x)`` the connected configuration of a basis
  state is ``conn = bits XOR x`` and the amplitude is
  ``i^{#Y} * (-1)^{popcount(bits AND z)}`` (the same qubit-wise algebra as
  reference ``qubit.py:213-268``, vectorized over packed words).
* Membership of connected strings resolves by branchless binary search over
  the sorted packed set, producing a **permutation table** per term.  The
  projected operator is then *matrix-free*: ``(H v)[i] = sum_t c_t a_t[i] *
  v[perm_t[i]]`` — pure gathers, no sparse matrix is ever materialized
  (BASELINE.json north star).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import bitpack

__all__ = [
    "pauli_masks_to_packed",
    "connected_table",
    "connected_table_pair",
    "diagonal_sign_table",
    "pauli_term_table",
    "ProjectedPauliOperator",
    "build_projected_operator",
]


def pauli_masks_to_packed(z: np.ndarray, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(z, x) boolean qubit masks -> packed uint32 words (bit q = qubit q)."""
    # qubit q == bit q: reverse into the bool-matrix column convention
    zrow = np.asarray(z, dtype=bool)[::-1][None, :]
    xrow = np.asarray(x, dtype=bool)[::-1][None, :]
    return bitpack.pack_bool_matrix(zrow)[0], bitpack.pack_bool_matrix(xrow)[0]


@jax.jit
def connected_table(sorted_packed, z_words, x_words):
    """Per-row (column index, sign) of one Pauli term over the sorted subspace.

    Returns ``(col, sign)``: ``col[i]`` is the subspace index of
    ``bits_i XOR x`` (or ``d`` if absent), ``sign[i] = (-1)^{popcount(b & z)}``.
    The constant ``i^{#Y}`` phase is NOT included (multiply per term).
    """
    d = sorted_packed.shape[0]
    conn = sorted_packed ^ x_words[None, :]
    col = bitpack.jnp_find_packed(sorted_packed, conn)
    sign = 1 - 2 * (bitpack.jnp_popcount_rows(sorted_packed & z_words[None, :]) % 2)
    ok = col >= 0
    return jnp.where(ok, col, d).astype(jnp.int32), jnp.where(ok, sign, 0).astype(jnp.int8)


@jax.jit
def diagonal_sign_table(sorted_packed, z_words):
    """Per-row sign of a DIAGONAL (X-free) Pauli term, fully on device.

    For a term with no X/Y component every basis state connects to itself,
    so the whole projection is the sign vector
    ``(-1)^{popcount(bits AND z)}`` — one streaming popcount over the packed
    words, no membership search (the reference runs its full sorted ``isin``
    even here; this is its benchmark's Z^40 case,
    ``docs/guides/benchmark_pauli_projection.ipynb`` cell 7).
    """
    return (
        1 - 2 * (bitpack.jnp_popcount_rows(sorted_packed & z_words[None, :]) % 2)
    ).astype(jnp.int8)


def pauli_term_table(sorted_packed, pauli):
    """Matrix-free (col, sign, phase) table of ONE Pauli term, on device.

    The device-resident production form of reference
    ``matrix_elements_from_pauli`` (``qubit.py:167-240``): ``col[i]`` is the
    subspace index of the state connected to row ``i`` (sentinel ``d`` when
    the connected string is outside the subspace), ``sign[i]`` the real sign,
    and ``phase = i^{#Y}`` the constant per-term factor.  Input and outputs
    live on device; nothing is transferred to the host.

    Args:
        sorted_packed: (d, W) uint32 device array, rows sorted ascending.
        pauli: object with boolean ``z``/``x`` arrays in qubit order.
    """
    z = np.asarray(pauli.z)
    x = np.asarray(pauli.x)
    zw, xw = pauli_masks_to_packed(z, x)
    w = sorted_packed.shape[1]
    phase = 1j ** int(np.sum(z & x))
    d = sorted_packed.shape[0]
    if not np.asarray(xw[:w]).any():
        sign = diagonal_sign_table(sorted_packed, jnp.asarray(zw[:w]))
        col = jnp.arange(d, dtype=jnp.int32)
        return col, sign, phase
    table_fn = connected_table_pair if d >= 1_000_000 else connected_table
    col, sign = table_fn(sorted_packed, jnp.asarray(zw[:w]), jnp.asarray(xw[:w]))
    return col, sign, phase


@jax.jit
def connected_table_rank(sorted_packed, z_words, x_words):
    """Sort-rank variant of :func:`connected_table` for very large subspaces.

    Binary search costs ~log2(d) rounds of random 8-byte HBM gathers — hostile
    to the TPU memory system at d ~ 5e7.  Instead: sort the concatenation of
    (table, queries) with a tie-break flag placing table entries first, take a
    cumulative count of table entries, and verify each query against its
    immediate table predecessor — one device sort + one gather total.
    """
    n, w = sorted_packed.shape
    conn = sorted_packed ^ x_words[None, :]
    combined = jnp.concatenate([sorted_packed, conn], axis=0)
    flags = jnp.concatenate(
        [jnp.zeros(n, jnp.uint32), jnp.ones(n, jnp.uint32)]
    )
    payload = jnp.tile(jnp.arange(n, dtype=jnp.int32), 2)
    keys = [combined[:, j] for j in range(w - 1, -1, -1)] + [flags]
    out = jax.lax.sort(keys + [payload], num_keys=w + 1)
    flags_s = out[w]
    payload_s = out[w + 1]
    cum_table = jnp.cumsum(1 - flags_s) - 1  # index of last table entry <= here
    cum_table = jnp.maximum(cum_table, 0).astype(jnp.int32)
    sorted_words = jnp.stack([out[w - 1 - j] for j in range(w)], axis=1)
    pred = sorted_packed[cum_table]  # (2n, W) gather of the candidate match
    match = jnp.all(pred == sorted_words, axis=1) & (flags_s == 1)
    col_sorted = jnp.where(match, cum_table, n).astype(jnp.int32)
    # scatter back to query order; table rows aim out-of-bounds and drop
    col = jnp.full(n, n, jnp.int32).at[
        jnp.where(flags_s == 1, payload_s, n)
    ].set(col_sorted, mode="drop")
    sign = 1 - 2 * (bitpack.jnp_popcount_rows(sorted_packed & z_words[None, :]) % 2)
    sign = jnp.where(col < n, sign, 0).astype(jnp.int8)
    return col, sign


def _pair_col(sorted_packed, x_words):
    """Connected-index column of ONE non-diagonal x-mask, involution pairing.

    Requires ``x != 0`` (diagonal terms connect every row to itself — with
    ``x == 0`` the pairing below would report every row absent).

    For a non-diagonal term the connected map ``a -> a ^ x`` is an
    INVOLUTION: ``a`` and ``b`` are partners iff ``b = a ^ x``, i.e. iff they
    share the key ``k = min(a, a ^ x)`` (and each key is shared by at most 2
    distinct rows, since rows are unique).  Sorting the n rows by
    ``(k, a > a^x)`` therefore lands every partner pair ADJACENT, with the
    smaller element first — membership resolves by comparing neighbours.

    vs :func:`connected_table_rank` this sorts n elements instead of 2n and
    replaces its (2n,)-row random predecessor gather (slice-count-bound,
    ~0.85 s per 5e7 slices on this chip) with shifted-by-one comparisons,
    which XLA lowers to contiguous streams.

    Depends on ``x`` ONLY (not ``z``): terms sharing an x-mask share this
    table, which is what :func:`build_projected_operator` exploits.
    """
    n, w = sorted_packed.shape
    conn = sorted_packed ^ x_words[None, :]
    # lexicographic a > a^x, most-significant word last (bitpack convention)
    gt = jnp.zeros(n, bool)
    eq = jnp.ones(n, bool)
    for j in range(w - 1, -1, -1):
        aj, cj = sorted_packed[:, j], conn[:, j]
        gt = gt | (eq & (aj > cj))
        eq = eq & (aj == cj)
    k = jnp.where(gt[:, None], conn, sorted_packed)  # min(a, a^x) per row
    flag = gt.astype(jnp.uint32)
    payload = jnp.arange(n, dtype=jnp.int32)
    keys = [k[:, j] for j in range(w - 1, -1, -1)] + [flag]
    out = jax.lax.sort(keys + [payload], num_keys=w + 1)
    flag_s = out[w]
    payload_s = out[w + 1]
    kw = out[:w]  # sorted key words, msb-first
    same_prev = jnp.ones(n, bool).at[0].set(False)
    for col_w in kw:
        same_prev = same_prev & (col_w == jnp.roll(col_w, 1))
    # pair = (flag 0 at i, flag 1 at i+1) with equal k: each side reads its
    # immediate neighbour — shifted loads, no random gather
    prev_is_partner = same_prev & (flag_s == 1) & (jnp.roll(flag_s, 1) == 0)
    next_is_partner = jnp.roll(prev_is_partner, -1) & (flag_s == 0)
    partner = jnp.where(
        prev_is_partner,
        jnp.roll(payload_s, 1),
        jnp.where(next_is_partner, jnp.roll(payload_s, -1), n),
    ).astype(jnp.int32)
    return jnp.zeros(n, jnp.int32).at[payload_s].set(partner)


@jax.jit
def connected_table_pair(sorted_packed, z_words, x_words):
    """Involution-pairing variant of :func:`connected_table` for huge subspaces.

    ``(col, sign)`` of one term; see :func:`_pair_col` for the pairing design
    (and its ``x != 0`` requirement).
    """
    n = sorted_packed.shape[0]
    col = _pair_col(sorted_packed, x_words)
    sign = 1 - 2 * (bitpack.jnp_popcount_rows(sorted_packed & z_words[None, :]) % 2)
    sign = jnp.where(col < n, sign, 0).astype(jnp.int8)
    return col, sign


_pair_col_batched = jax.jit(jax.vmap(_pair_col, in_axes=(None, 0)))


def _search_col(sorted_packed, x_words):
    """Connected-index column of one x-mask via branchless binary search."""
    d = sorted_packed.shape[0]
    col = bitpack.jnp_find_packed(sorted_packed, sorted_packed ^ x_words[None, :])
    return jnp.where(col >= 0, col, d).astype(jnp.int32)


_search_col_batched = jax.jit(jax.vmap(_search_col, in_axes=(None, 0)))


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ProjectedPauliOperator:
    """Matrix-free projected Pauli-sum over a sorted bitstring subspace.

    Terms are stored GROUPED BY X-MASK: the connected map ``a -> a ^ x``
    depends only on a term's x component, so all terms sharing an x-mask
    share one permutation table, and their ``coeff * i^{#Y} * (-1)^{b & z}``
    amplitudes are pre-summed into a single per-group weight vector.  The
    matvec is then ``(H v)[i] = sum_u W_u[i] * v[perm_u[i]]`` over the
    ``U <= T`` unique x-masks — for a Heisenberg ring (XXⱼ/YYⱼ share
    x-masks; ZZⱼ and the field are all diagonal) this is ~4x fewer gather
    rounds than per-term tables, and the build does ~4x less membership
    work.

    Complex weights are stored SPLIT (``weight_re``/``weight_im``): the
    axon TPU runtime supports no complex dtype anywhere (device_put of a
    complex array hangs the tunnel; device complex math is UNIMPLEMENTED).
    When any term has an imaginary effective coefficient, the operator acts
    on the REAL EMBEDDING of the complex Hermitian matrix ``H = A + iB``:
    vectors are ``[v_re; v_im]`` of length ``2d`` and
    ``H_embed = [[A, -B], [B, A]]`` (symmetric; every eigenvalue of H
    doubled), so the whole eigensolve runs in f64 real arithmetic.
    """

    perm: jax.Array  # (U, d) int32 — connected index per row per x-group, sentinel d
    weight_re: jax.Array  # (U, d) f64 — sum over group terms of Re(c·i^{#Y})·sign
    weight_im: jax.Array  # (U, d) f64 — imaginary part; (0, 0) for real operators
    hdiag: jax.Array  # (d,) — real diagonal (for preconditioning)
    is_complex: bool = False  # static: any term coeff with nonzero imag part

    def tree_flatten(self):
        children = (self.perm, self.weight_re, self.weight_im, self.hdiag)
        return children, (self.is_complex,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, is_complex=aux[0])

    @property
    def dim(self) -> int:
        return self.perm.shape[1]

    @property
    def num_groups(self) -> int:
        """Number of unique x-masks (gather rounds per matvec)."""
        return self.perm.shape[0]

    @property
    def embedded_dim(self) -> int:
        """Length of the vectors :meth:`matvec` acts on."""
        return 2 * self.dim if self.is_complex else self.dim

    @property
    def shape(self) -> tuple[int, int]:
        return (self.dim, self.dim)

    def _apply(self, v: jax.Array, weights: jax.Array) -> jax.Array:
        v_pad = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
        picked = v_pad[self.perm]  # (U, d)
        return jnp.sum(weights * picked, axis=0)

    def matvec(self, v: jax.Array) -> jax.Array:
        """``H v`` via per-x-group gathers.

        Convention matches the reference projection (``qubit.py:167-240``):
        ``A[row, col] = amp(row)`` with ``col`` the connected index, i.e.
        ``(H v)[row] = sum_t c_t a_t(row) v[col_t(row)]`` — here with the
        ``t`` sum folded into the per-group weights at build time.

        For a complex operator ``v`` is the stacked real embedding
        ``[v_re; v_im]`` (length ``2d``).
        """
        dt = v.dtype
        w_re = self.weight_re.astype(dt)
        if not self.is_complex:
            return self._apply(v, w_re)
        d = self.dim
        w_im = self.weight_im.astype(dt)
        vr, vi = v[:d], v[d:]
        out_r = self._apply(vr, w_re) - self._apply(vi, w_im)
        out_i = self._apply(vr, w_im) + self._apply(vi, w_re)
        return jnp.concatenate([out_r, out_i])


def pauli_apply_flat(op: ProjectedPauliOperator, v: jax.Array) -> jax.Array:
    """Module-level matvec adapter (stable identity for jit caching)."""
    return op.matvec(v)


def _weights_chunk(sorted_packed, z_chunk, cre, cim, gid, num_groups, with_imag):
    """One term-chunk's contribution to the per-group weight vectors."""
    par = jax.vmap(
        lambda zz: bitpack.jnp_popcount_rows(sorted_packed & zz[None, :]) % 2
    )(z_chunk)
    s = (1 - 2 * par).astype(jnp.float64)  # (Tc, d) sign of each term
    wre = jnp.zeros((num_groups, s.shape[1]), jnp.float64).at[gid].add(cre[:, None] * s)
    if with_imag:
        wim = jnp.zeros((num_groups, s.shape[1]), jnp.float64).at[gid].add(
            cim[:, None] * s
        )
    else:
        wim = jnp.zeros((0, 0), jnp.float64)
    return wre, wim


@partial(jax.jit, static_argnames=("num_groups", "chunk", "with_imag"))
def _group_weights(sorted_packed, z_stack, c_re, c_im, group_id, *, num_groups, chunk, with_imag):
    """Per-group weights ``W_u[i] = sum_{t in u} c_t (-1)^{b_i & z_t}``.

    One compiled program: a ``lax.scan`` over term-chunks bounds the live
    ``(chunk, d)`` sign intermediate (88 terms x 5e7 rows would otherwise
    hold a 35 GB i8 buffer).  Inputs are padded to a multiple of ``chunk``
    with zero coefficients (harmless scatter-adds into group 0).
    """
    tpad = z_stack.shape[0]
    n_chunks = tpad // chunk
    xs = (
        z_stack.reshape(n_chunks, chunk, -1),
        c_re.reshape(n_chunks, chunk),
        c_im.reshape(n_chunks, chunk),
        group_id.reshape(n_chunks, chunk),
    )

    def step(carry, x):
        wre, wim = carry
        z, cr, ci, g = x
        dre, dim_ = _weights_chunk(sorted_packed, z, cr, ci, g, num_groups, with_imag)
        return (wre + dre, wim + dim_), None

    d = sorted_packed.shape[0]
    init = (
        jnp.zeros((num_groups, d), jnp.float64),
        jnp.zeros((num_groups, d) if with_imag else (0, 0), jnp.float64),
    )
    (wre, wim), _ = jax.lax.scan(step, init, xs)
    return wre, wim


@jax.jit
def _hdiag_from_groups(perm, weight_re):
    rows = jnp.arange(perm.shape[1], dtype=perm.dtype)
    return jnp.sum(weight_re * (perm == rows[None, :]), axis=0)


# per-term chunk cap for the sign scan (elements of the (chunk, d) buffer)
_WEIGHT_CHUNK_ELEMS = 50_000_000
# byte budget for the batched pairing sort's live buffers at large d
_PAIR_BATCH_BYTES = 1_500_000_000


def build_projected_operator(sorted_packed: np.ndarray, paulis, coeffs) -> ProjectedPauliOperator:
    """Assemble the matrix-free projected operator for a Pauli sum.

    Replaces the reference's per-term Python loop over
    ``matrix_elements_from_pauli`` + COO accumulation
    (``qubit.py:78-144``).  Terms are grouped by x-mask: one membership
    resolution per UNIQUE x (binary search batched in one vmapped program
    below 1e6 rows; chunk-batched involution-pairing sorts above), and one
    scan-chunked program folds every term's ``c·i^{#Y}·(-1)^{b&z}``
    amplitude into its group's weight vector.

    Args:
        sorted_packed: (d, W) uint32 — sorted unique packed bitstrings.
        paulis: sequence of :class:`sqd_tpu.primitives.Pauli`.
        coeffs: complex coefficients.
    """
    sp = jnp.asarray(sorted_packed)
    d, w = sp.shape
    zws, xws, cs = [], [], []
    for pauli, c in zip(paulis, np.asarray(coeffs)):
        zw, xw = pauli_masks_to_packed(pauli.z, pauli.x)
        if np.any(zw[w:]) or np.any(xw[w:]):
            raise ValueError(
                f"Pauli term acts on more qubits ({len(np.asarray(pauli.z))}) than the "
                f"packed subspace encodes ({w * 32}); truncating its mask would build a "
                "wrong operator."
            )
        n_y = int(np.sum(np.asarray(pauli.z) & np.asarray(pauli.x)))
        zws.append(zw[:w])
        xws.append(xw[:w])
        cs.append(complex(c) * (1j**n_y))
    n_terms = len(cs)

    # ---- group terms by x-mask (insertion order; diagonal group = x == 0) --
    group_of: dict[bytes, int] = {}
    group_id = np.empty(n_terms, dtype=np.int32)
    unique_x: list[np.ndarray] = []
    for t, xw in enumerate(xws):
        key = xw.tobytes()
        if key not in group_of:
            group_of[key] = len(unique_x)
            unique_x.append(xw)
        group_id[t] = group_of[key]
    num_groups = len(unique_x)
    x_arr = np.stack(unique_x)
    is_diag = ~x_arr.any(axis=1)

    # ---- one membership table per unique x ---------------------------------
    if d >= 1_000_000:
        # the pairing sort holds O(d) buffers per x-mask: batch in chunks
        # sized to _PAIR_BATCH_BYTES instead of all-at-once or one-by-one
        per_x = d * (w + 2) * 4 * 3
        uc = max(1, min(int(np.count_nonzero(~is_diag)) or 1, _PAIR_BATCH_BYTES // per_x))
        nondiag = np.nonzero(~is_diag)[0]
        cols = np.empty(num_groups, dtype=object)
        for start in range(0, len(nondiag), uc):
            sel = nondiag[start : start + uc]
            batch = x_arr[sel]
            if len(batch) < uc:  # pad to the jitted shape with a repeat
                batch = np.concatenate([batch, np.tile(batch[-1:], (uc - len(batch), 1))])
            got = _pair_col_batched(sp, jnp.asarray(batch))
            for k, u in enumerate(sel):
                cols[u] = got[k]
        ident = jnp.arange(d, dtype=jnp.int32)
        perm = jnp.stack([ident if is_diag[u] else cols[u] for u in range(num_groups)])
    else:
        # binary search handles x == 0 naturally (conn == self)
        perm = _search_col_batched(sp, jnp.asarray(x_arr))

    # ---- fold every term's amplitude into its group's weight ---------------
    cs_arr = np.array(cs, dtype=np.complex128)
    is_complex = bool(np.any(cs_arr.imag != 0.0))
    chunk = max(1, min(n_terms, _WEIGHT_CHUNK_ELEMS // max(d, 1)))
    tpad = -(-n_terms // chunk) * chunk
    z_stack = np.zeros((tpad, w), dtype=np.uint32)
    z_stack[:n_terms] = np.stack(zws)
    c_re = np.zeros(tpad)
    c_im = np.zeros(tpad)
    c_re[:n_terms] = cs_arr.real
    c_im[:n_terms] = cs_arr.imag
    gid = np.zeros(tpad, dtype=np.int32)
    gid[:n_terms] = group_id
    weight_re, weight_im = _group_weights(
        sp,
        jnp.asarray(z_stack),
        jnp.asarray(c_re),
        jnp.asarray(c_im),
        jnp.asarray(gid),
        num_groups=num_groups,
        chunk=chunk,
        with_imag=is_complex,
    )
    hdiag = _hdiag_from_groups(perm, weight_re)
    return ProjectedPauliOperator(
        perm=perm, weight_re=weight_re, weight_im=weight_im,
        hdiag=hdiag, is_complex=is_complex,
    )
