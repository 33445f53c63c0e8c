# (C) 2026. Licensed under the Apache License, Version 2.0.
"""One large solve with the DENSITY-FITTING (factor) axis sharded over the mesh.

The dense-DF operator (:mod:`sqd_tpu.ops.dense_df`) writes the cross-spin
channel as ``sigma_ab = sum_x Wa_x @ c @ Wb_x^T`` — a clean data-parallel sum
over the factor index x.  Sharding x over the mesh gives each device

* ``X / ndev`` of the (M, M) / (N, N) dense factor matrices (the dominant
  memory: ``2 * X * M^2 / ndev`` floats per device), and
* ``X / ndev`` of the batched matmul FLOPs,

while the Krylov state stays replicated at only ``M * N`` floats per vector
(40 MB at the 10^7-determinant [4Fe-4S] shape) — the inverse trade of
:mod:`.row_sharded` (which shards the vectors and replicates the work
metadata).  The matvec's only communication is ONE ``psum`` of the (M, N)
result per application.

Everything here is GSPMD: the factor rows ``L`` land on the mesh with a
``P('x', None)`` sharding, the per-device ``Wa``/``Wb`` slices are BUILT
where they live (the one-hot build consumes only replicated tables plus the
local L rows — no device ever materializes the full stack), and XLA inserts
the reduction collectives from the sharding alone.

Use when the factor memory, not the vector memory, is the ceiling —
i.e. exactly the large-active-space regime dense-DF targets.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import bitpack, rdm as rdm_ops
from ..ops.dense_df import DenseDFOperator, _dense_samespin, _w_stack, dense_df_matvec_flat
from ..ops.davidson import davidson_ground_state, davidson_initial_guess
from ..ops.hamiltonian import build_sci_hamiltonian, expectation_value, sci_matvec_flat
from .distributed import host_local, replicate_to_host

__all__ = ["solve_sci_dfsharded"]

_AXIS = "x"


def solve_sci_dfsharded(
    ci_strings,
    one_body_tensor,
    two_body_tensor,
    norb: int,
    nelec,
    *,
    mesh=None,
    eri_factor="auto",
    solver_dtype=jnp.float32,
    tol: float = 1e-6,
    max_subspace: int = 16,
    max_cycle: int = 200,
    refine_iterations: int | None = None,
    with_rdms: bool = True,
):
    """Ground state with the dense-DF factor axis sharded over the mesh.

    Same result contract as :func:`sqd_tpu.fermion.solve_sci`
    (``matvec_strategy="dense_df"``): the Davidson iterates through the
    sharded dense operator; energy, f64 refinement and RDMs use the exact
    (unfactored) f64 operator.  Requires symmetric PSD integrals with
    npair > 256 (or an explicit ``eri_factor`` array).

    Note the f64 refinement runs the exact gather matvec REPLICATED — at
    very large norb each refine iteration costs a dense-ERI f64 matvec;
    pass ``refine_iterations=0`` there and rely on the exact f64 energy
    evaluation.
    """
    from ..fermion import SCIResult, SCIState, _check_ci_strs

    if mesh is None:
        from .mesh import default_mesh

        mesh = default_mesh()
    if _AXIS not in mesh.axis_names:
        from jax.sharding import Mesh

        mesh = Mesh(mesh.devices.reshape(-1), (_AXIS,))
    ndev = int(mesh.devices.size)
    if refine_iterations is None:
        refine_iterations = 0 if jnp.dtype(solver_dtype) == jnp.float64 else 6

    strs_a, strs_b = _check_ci_strs(ci_strings)
    pa = bitpack.pack_ints(
        np.asarray(strs_a, dtype=object if norb >= 63 else np.int64), norb
    )
    pb = bitpack.pack_ints(
        np.asarray(strs_b, dtype=object if norb >= 63 else np.int64), norb
    )
    m, n = len(strs_a), len(strs_b)

    ham64 = build_sci_hamiltonian(
        pa, pb, one_body_tensor, two_body_tensor, norb, nelec,
        dtype=jnp.float64, eri_factor=eri_factor,
    )
    if ham64.eri_chol is None:
        raise ValueError(
            "solve_sci_dfsharded requires a PSD ERI factor — needs "
            "npair > 256 and symmetric PSD two_body_tensor, or an explicit "
            "eri_factor array"
        )
    m_pad, n_pad = ham64.shape

    # pad the factor count to the device count with zero rows (zero factors
    # contribute zero Wa/Wb slices — inert by construction)
    ell = np.asarray(ham64.eri_chol)
    x_tot = -(-ell.shape[0] // ndev) * ndev
    if x_tot != ell.shape[0]:
        ell = np.pad(ell, ((0, x_tot - ell.shape[0]), (0, 0)))
    ell_sh = jax.device_put(
        ell.astype(np.dtype(solver_dtype)), NamedSharding(mesh, P(_AXIS, None))
    )
    repl = NamedSharding(mesh, P())
    x_shard = NamedSharding(mesh, P(_AXIS, None, None))

    # build each device's factor slice WHERE IT LIVES: the one-hot build
    # reads only the (replicated) gather tables and the local L rows
    build = jax.jit(
        lambda s, g, e: _w_stack(s, g, e, solver_dtype),
        out_shardings=x_shard,
    )
    wa = build(
        jax.device_put(host_local(ham64.src_a), repl),
        jax.device_put(host_local(ham64.sign_a), repl),
        ell_sh,
    )
    wb = build(
        jax.device_put(host_local(ham64.src_b), repl),
        jax.device_put(host_local(ham64.sign_b), repl),
        ell_sh,
    )
    op = DenseDFOperator(
        wa=wa,
        wb=wb,
        haa=jax.device_put(
            host_local(_dense_samespin(ham64.nbr_idx_a, ham64.nbr_val_a, solver_dtype)), repl
        ),
        hbb=jax.device_put(
            host_local(_dense_samespin(ham64.nbr_idx_b, ham64.nbr_val_b, solver_dtype)), repl
        ),
        hdiag=jax.device_put(host_local(ham64.hdiag.astype(solver_dtype)), repl),
        x_chunk=0,  # sharded x axis: unchunked einsum, GSPMD inserts the psum
    )

    hd_flat = op.hdiag.reshape(-1)
    v0 = davidson_initial_guess(hd_flat, solver_dtype)
    scale = float(jnp.max(jnp.abs(jnp.where(jnp.abs(hd_flat) > 1e20, 0.0, hd_flat))))
    eps = float(jnp.finfo(solver_dtype).eps)
    tol_eff = max(tol, 32 * eps * max(1.0, scale))
    result = davidson_ground_state(
        dense_df_matvec_flat, op, hd_flat, v0,
        tol=tol_eff, max_subspace=max_subspace, max_iterations=max_cycle,
    )
    vec_flat = result.vector.astype(jnp.float64)
    if jax.process_count() > 1:
        # multi-host: replicate + localize the Krylov output so the f64
        # epilogue (exact gather refine/energy/RDMs over the locally-built
        # ham64) runs redundantly-but-identically per process on local
        # buffers; single-process keeps the device array.
        vec_flat = jnp.asarray(replicate_to_host(vec_flat, mesh))
    if refine_iterations > 0 and jnp.dtype(solver_dtype) != jnp.float64:
        result64 = davidson_ground_state(
            sci_matvec_flat, ham64, ham64.hdiag.reshape(-1), vec_flat,
            tol=tol, max_subspace=max_subspace, max_iterations=refine_iterations,
        )
        vec_flat = result64.vector
    vec_pad = vec_flat.reshape(m_pad, n_pad)
    vec_pad = vec_pad / jnp.linalg.norm(vec_pad)

    energy = float(expectation_value(ham64, vec_pad.reshape(-1), spin_penalty=False))
    rdms = rdm_ops.make_rdms(
        ham64, vec_pad, pa if with_rdms else None, pb if with_rdms else None,
        with_dm2=with_rdms,
    )
    occ = (
        np.diagonal(np.asarray(rdms["dm1a"])).copy(),
        np.diagonal(np.asarray(rdms["dm1b"])).copy(),
    )
    rdm1 = np.asarray(rdms["dm1a"] + rdms["dm1b"])
    rdm2 = np.asarray(rdms["dm2"]) if with_rdms else None
    state = SCIState(
        amplitudes=np.asarray(vec_pad[:m, :n]),
        ci_strs_a=strs_a,
        ci_strs_b=strs_b,
        norb=norb,
        nelec=tuple(int(x) for x in nelec),
    )
    return SCIResult(energy, state, orbital_occupancies=occ, rdm1=rdm1, rdm2=rdm2)
