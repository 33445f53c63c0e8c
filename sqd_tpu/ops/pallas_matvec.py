# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Fused Pallas TPU kernel for the cross-spin SCI matvec.

The XLA path (``hamiltonian._matvec_blocked``) materializes the product-space
intermediates ``D = E^a c`` and ``G = eri @ D`` in HBM — ~3-4 GB of traffic
per matvec at 10^6 determinants, which is what bounds the Davidson iteration.
But the amplitude matrix itself is only ``M*N*4`` bytes (4 MB at 10^6), far
below VMEM.  This kernel keeps ``c`` and all gather tables VMEM-resident and
runs the whole chain per alpha-row tile on-chip:

    for each alpha row i (grid, 8 rows per step):
        d[pq, :]  = sign_a[pq, i] * c[src_a[pq, i], :]      # VMEM row gather
        g         = eri_t @ d                               # MXU, f32-highest
        sigma[i, j] = sum_rs sign_b[rs, j] * g[rs, src_b[rs, j]]
                                                            # VPU lane gather

HBM traffic per matvec collapses to the operands themselves (~16 MB), making
the cross-spin term compute-bound on the MXU (~131 GFLOP at 10^6 dets).
The same-spin neighbor-list channels and the spin penalty stay on the XLA
path (they are cheap and gather-shaped differently); see
``SCIHamiltonian.matvec`` for the dispatch.

Reference behavior: PySCF ``contract_2e`` (reference fermion.py:505-516 calls
through ``pyscf.fci.selected_ci``); this kernel is its TPU replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cross_spin_matvec", "supports"]

_LANE = 128
_ROWS = 8  # alpha rows per grid step (f32 sublane tile)
_MAX_VMEM_BYTES = 10 * 1024 * 1024  # leave headroom in ~16 MB of VMEM


def supports(m: int, n: int, npair: int, itemsize: int = 4) -> bool:
    """True if the fused kernel's VMEM-resident plan fits this problem."""
    if n % _LANE or m % _ROWS:
        return False
    resident = (
        m * n * 4  # c (f32)
        + 2 * npair * n * 4  # src_b + sign_b (i32 + f32)
        + npair * npair * 4  # eri_t
        + 3 * npair * n * 4  # d scratch + g + picked
        + _ROWS * n * 4  # out tile
    )
    return resident <= _MAX_VMEM_BYTES


def _kernel(src_a_ref, sign_a_ref, c_ref, src_b_ref, sign_b_ref, eri_ref,
            out_ref, d_ref):
    npair = d_ref.shape[0]

    def one_row(r, _):
        def gather_row(k, _):
            d_ref[k, :] = c_ref[src_a_ref[k, r], :]
            return 0

        jax.lax.fori_loop(0, npair, gather_row, 0, unroll=8)
        d = d_ref[:] * sign_a_ref[:, r][:, None]
        g = jax.lax.dot_general(
            eri_ref[:],
            d,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        picked = jnp.take_along_axis(g, src_b_ref[:], axis=1)
        out_ref[r, :] = jnp.sum(picked * sign_b_ref[:], axis=0)
        return 0

    jax.lax.fori_loop(0, _ROWS, one_row, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cross_spin_matvec(c, src_a, sign_a, src_b, sign_b, eri_t, *,
                      interpret: bool = False):
    """``sigma = sum_rs E^b_rs [ sum_pq eri_t[rs,pq] E^a_pq c ]`` fused.

    All tables follow the clamped convention (invalid entries -> index 0,
    sign 0).  ``c`` is (M, N) with N a multiple of 128 and M a multiple of 8;
    tables are (npair, M) / (npair, N).  Computes in f32 regardless of input
    dtype (the Davidson path; f64 refinement uses the XLA path).
    """
    m, n = c.shape
    npair = src_a.shape[0]
    c32 = c.astype(jnp.float32)
    return pl.pallas_call(
        _kernel,
        grid=(m // _ROWS,),
        in_specs=[
            pl.BlockSpec((npair, _ROWS), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((npair, _ROWS), lambda i: (0, i)),
            pl.BlockSpec((m, n), lambda i: (0, 0)),
            pl.BlockSpec((npair, n), lambda i: (0, 0)),
            pl.BlockSpec((npair, n), lambda i: (0, 0)),
            pl.BlockSpec((npair, npair), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((npair, n), jnp.float32)],
        interpret=interpret,
    )(
        src_a.astype(jnp.int32),
        sign_a.astype(jnp.float32),
        c32,
        src_b.astype(jnp.int32),
        sign_b.astype(jnp.float32),
        eri_t.astype(jnp.float32),
    )
