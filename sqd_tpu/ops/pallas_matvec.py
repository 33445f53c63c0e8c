# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Fused Pallas TPU kernel for the cross-spin SCI matvec.

The XLA path (``hamiltonian._matvec_blocked``) materializes the product-space
intermediates ``D = E^a c`` and ``G = eri @ D`` in HBM — ~3-4 GB of traffic
per matvec at 10^6 determinants, which is what bounds the Davidson iteration.
But the amplitude matrix itself is only ``M*N*4`` bytes (4 MB at 10^6), far
below VMEM.  This kernel keeps ``c`` and all gather tables VMEM-resident and
runs the whole chain per alpha-row tile on-chip:

    for each alpha row i (grid, 8 rows per step):
        d[pq, :]  = c[src_a[pq, i], :]   for the VALID pairs of row i only
                                          # compacted VMEM row gathers
        g         = (eri_t * sign_a[i]) @ d          # MXU
        sigma[i, j] = sum_rs sign_b[rs, j] * g[rs, src_b[rs, j]]
                                                     # VPU lane gather

Two structural optimizations over the straightforward fused form:

* **Compacted alpha gather.**  Only ``ne_a * (norb - ne_a + 1)`` of the
  ``norb^2`` pairs are valid per alpha string (~23% at (16o, 5e)).  The
  alpha sign is folded into the coefficient matrix columns, which zeroes
  every invalid pair's contribution — so stale ``d`` rows are harmless and
  the kernel gathers ONLY the valid pairs (host-compacted per-row lists;
  padding entries write to a dustbin row past ``npair``).  This cuts the
  scalar-driven row-copy loop ~4x.
* **Tunable matmul precision.**  The f32 Davidson stage tolerates
  ``Precision.HIGH`` (3-pass bf16, ~1e-6 relative) — the final energies are
  re-derived in f64 anyway — which halves the MXU passes vs ``HIGHEST``.
  ``hamiltonian.PALLAS_MATMUL_PRECISION`` pins it globally.

HBM traffic per matvec collapses to the operands themselves (~16 MB), making
the cross-spin term MXU/VPU-bound (~131 GFLOP at 10^6 dets).  The same-spin
neighbor-list channels and the spin penalty stay on the XLA path (they are
cheap and gather-shaped differently); see ``SCIHamiltonian.matvec`` for the
dispatch.

Measured design space (v5e, 1e6 dets — negative results recorded so they are
not re-tried):

* cross-spin v2 (this file): 10.7 ms; full matvec 16.0 ms; solve 0.36 s.
* Mosaic ``dot_general`` supports only DEFAULT and HIGHEST precision, and
  HIGHEST already costs bf16x3 grade (measured 1.4e-6 rel) — the matmul is
  ~1.4 ms, not the bottleneck.
* The beta lane-pick (~6.5 ms) is the floor-setter: an arbitrary 1024->128
  lane route needs ``nblk`` masked gathers per output block (lane gathers
  cannot cross a 128-lane vreg).  Every variant that amortizes the
  compare/select re-adds the cost elsewhere or blows VMEM: per-(t,s) f32
  masks = 8 MB; dustbin-lane per-s i32 index tables = 8 MB; i8 tables need a
  per-use convert.  A sorted-bucket beta layout (source block lane-constant
  per pair-range, exploiting that sorted packed strings group by high bits)
  would cut the pick ~nblk-fold but its bucket-capacity padding inflates
  ``c`` and the beta tables ~2x — out of VMEM on this chip, and
  data-dependent bucket boundaries would force per-iteration recompiles.
* Fusing the same-spin channels INTO the kernel was implemented and measured
  SLOWER (21.4 ms all-channel kernel vs 16.0 ms composed): the scalar-driven
  neighbor-row loop and a second lane-pick cost more on the VPU than the XLA
  einsum-gathers cost in HBM traffic.

Reference behavior: PySCF ``contract_2e`` (reference fermion.py:505-516 calls
through ``pyscf.fci.selected_ci``); this kernel is its TPU replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cross_spin_matvec", "supports", "FORCE_INTERPRET"]

_LANE = 128
_ROWS = 8  # alpha rows per grid step (f32 sublane tile)
_MAX_VMEM_BYTES = 12 * 1024 * 1024  # leave headroom in ~16 MB of VMEM

# Test hook: when True, SCIHamiltonian.matvec dispatches here in interpret
# mode even on CPU, so the dispatch path itself is exercised by the suite.
FORCE_INTERPRET = False

# Backends whose Pallas/Mosaic lowering targets real TPU hardware ("axon" is
# this image's tunneled TPU PJRT platform).
TPU_BACKENDS = ("tpu", "axon")


def supports(m: int, n: int, npair: int, itemsize: int = 4) -> bool:
    """True if the fused kernel's VMEM-resident plan fits this problem."""
    if n % _LANE or m % _ROWS:
        return False
    resident = (
        m * n * 4  # c (f32)
        + 3 * npair * n * 4  # lo_b + hi_b (i32) + sign_b (f32)
        + npair * npair * 4  # eri_t
        + 3 * npair * n * 4  # scratch: d + g + tot
        + _ROWS * n * 4  # out tile
    )
    return resident <= _MAX_VMEM_BYTES


def _kernel(ka_idx_ref, ka_src_ref, sign_a_ref, c_ref, lo_b_ref, hi_b_ref,
            sign_b_ref, eri_ref, out_ref, d_ref, g_ref, tot_ref):
    # alpha tables arrive TRANSPOSED — (_ROWS, ka) blocks — because Mosaic
    # requires block tails divisible by (8, 128); the alpha sign is folded
    # into the coefficient matrix columns (one lane-broadcast multiply)
    # instead of scaling the gathered rows.
    npair, n = g_ref.shape
    ka = ka_idx_ref.shape[1]
    # x64 may be enabled globally (the f64 energy paths need it) but Mosaic
    # rejects 64-bit types — pin every loop counter/carry to int32.
    i32 = jnp.int32

    # Zero d ONCE per grid step: the sign fold (eri_signed columns are 0 for
    # invalid pairs) kills FINITE stale rows between rows of the tile, but
    # uninitialized scratch can be NaN and 0 * NaN = NaN.
    d_ref[:] = jnp.zeros_like(d_ref)

    def one_row(r, _):
        def gather_row(k, _):
            # compacted: only valid pairs; padding entries aim at the
            # dustbin row (npair) and invalid/stale rows of d are zeroed
            # through the sign fold in the coefficient columns
            d_ref[ka_idx_ref[r, k], :] = c_ref[ka_src_ref[r, k], :]
            return i32(0)

        jax.lax.fori_loop(i32(0), i32(ka), gather_row, i32(0), unroll=1)
        eri_signed = eri_ref[:] * sign_a_ref[r, :][None, :]
        g_ref[:] = jax.lax.dot_general(
            eri_signed,
            d_ref[:npair, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Beta scatter: picked[rs, j] = g[rs, src_b[rs, j]].  Mosaic's lane
        # gather (tpu.dynamic_gather) can neither cross the 128-lane vreg
        # boundary on the source nor take indices shaped differently from the
        # source, so run it as (output block x source block) 128x128 pairs
        # with masked accumulation — a static Python double loop.  All column
        # slicing happens on REFS: value slices at lane offsets past the
        # first tile are "input offsets outside of the first tile" to Mosaic.
        # The block decomposition (lo = src_b % 128, hi = src_b // 128) is
        # row-invariant, so it is precomputed on the host and fed in — the
        # inner pair is one compare + one gather + one select-accumulate.
        nblk = n // _LANE
        for t in range(nblk):
            lo_t = lo_b_ref[:, t * _LANE : (t + 1) * _LANE]
            hi_t = hi_b_ref[:, t * _LANE : (t + 1) * _LANE]
            tot_t = jnp.zeros((npair, _LANE), jnp.float32)
            for s in range(nblk):
                part = jnp.take_along_axis(
                    g_ref[:, s * _LANE : (s + 1) * _LANE], lo_t, axis=1
                )
                tot_t = jnp.where(hi_t == i32(s), part, tot_t)
            tot_ref[:, t * _LANE : (t + 1) * _LANE] = tot_t
        # single full-width dynamic-row store (column-sliced dynamic stores
        # are "dynamic store with unaligned indices" to Mosaic, and lane-
        # offset value concatenation is "input offsets outside of the first
        # tile" — the picked values therefore stage through tot_ref)
        out_ref[r, :] = jnp.sum(tot_ref[:] * sign_b_ref[:], axis=0)
        return i32(0)

    jax.lax.fori_loop(i32(0), i32(_ROWS), one_row, i32(0))


@functools.partial(jax.jit, static_argnames=("ka", "interpret", "precision"))
def cross_spin_matvec(c, src_a, sign_a, src_b, sign_b, eri_t, *, ka: int,
                      interpret: bool = False, precision: str = "highest"):
    """``sigma = sum_rs E^b_rs [ sum_pq eri_t[rs,pq] E^a_pq c ]`` fused.

    All tables follow the clamped convention (invalid entries -> index 0,
    sign 0).  ``c`` is (M, N) with N a multiple of 128 and M a multiple of 8;
    tables are (npair, M) / (npair, N).  ``ka`` is the static per-row valid-
    pair bound (``ne_a * (norb - ne_a + 1)`` rounded up to 8).  Computes in
    f32 regardless of input dtype (the Davidson path; f64 refinement uses the
    XLA path); ``precision`` selects the MXU pass count ("high" = 3-pass
    bf16, plenty under the f32 stage's tolerance; "highest" = full f32).
    """
    m, n = c.shape
    npair = src_a.shape[0]
    c32 = c.astype(jnp.float32)
    # Compact per-row alpha lists.  Pure jnp on loop-invariant operands: XLA's
    # loop-invariant code motion hoists this out of the Davidson while-loop,
    # and even unhoisted it is ~2M element-ops against a 131 GFLOP matvec.
    valid = sign_a != 0  # (npair, M)
    order = jnp.argsort(~valid, axis=0, stable=True)[:ka]  # (ka, M)
    ka_idx = jnp.where(
        jnp.take_along_axis(valid, order, axis=0), order, npair
    ).astype(jnp.int32)
    ka_src = jnp.take_along_axis(src_a.astype(jnp.int32), order, axis=0)
    # x64 canonicalization makes jnp.take_along_axis promote its indices to
    # int64 inside the kernel, which Mosaic rejects; everything here is
    # 32-bit by construction, so trace the kernel with x64 off.
    with jax.enable_x64(False):
        with jax.default_matmul_precision(precision):
            return _call(
                c32, ka_idx, ka_src, sign_a, src_b, sign_b, eri_t,
                m, n, npair, ka, interpret,
            )


def _call(c32, ka_idx, ka_src, sign_a, src_b, sign_b, eri_t, m, n, npair, ka,
          interpret):
    return pl.pallas_call(
        _kernel,
        grid=(m // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, ka), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, ka), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, npair), lambda i: (i, 0)),
            pl.BlockSpec((m, n), lambda i: (0, 0)),
            pl.BlockSpec((npair, n), lambda i: (0, 0)),
            pl.BlockSpec((npair, n), lambda i: (0, 0)),
            pl.BlockSpec((npair, n), lambda i: (0, 0)),
            pl.BlockSpec((npair, npair), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((npair + 8, n), jnp.float32),  # d (+ dustbin rows)
            pltpu.VMEM((npair, n), jnp.float32),
            pltpu.VMEM((npair, n), jnp.float32),
        ],
        interpret=interpret,
    )(
        ka_idx.T,
        ka_src.T,
        sign_a.T.astype(jnp.float32),
        c32,
        src_b.astype(jnp.int32) & (_LANE - 1),
        src_b.astype(jnp.int32) >> 7,
        sign_b.astype(jnp.float32),
        eri_t.astype(jnp.float32),
    )
