"""solve_qubit_device on the real chip: L=22 Heisenberg, d = 49,718 subspace.

The reference solves this with an explicit scipy COO + ARPACK on host
(``docs/guides/project_pauli_operators_onto_hilbert_subspaces.ipynb``); here
the matrix-free projected operator + Davidson run entirely on the TPU
(real f64 arithmetic — complex terms would use the real embedding).
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
import sqd_tpu  # noqa: F401
from sqd_tpu import qubit
from sqd_tpu.models.heisenberg import heisenberg_ring
from sqd_tpu.ops import bitpack

nq, d = 22, 49_718
op = heisenberg_ring(nq, j_xx=1.0, j_yy=1.0, j_zz=1.0, h_z=0.1)
rng = np.random.default_rng(5)
ints = np.unique(rng.integers(0, 1 << nq, size=2 * d, dtype=np.int64))[:d]
packed = np.zeros((len(ints), 1), dtype=np.uint32)
packed[:, 0] = ints
mat = bitpack.unpack_to_bool_matrix(packed, nq)

t0 = time.perf_counter()
energy, vec, proj = qubit.solve_qubit_device(mat, op, tol=1e-6)
t_solve = time.perf_counter() - t0
print(f"terms={len(op.coeffs)} d={len(ints)}  E0={energy:.9f}  "
      f"|v|={np.linalg.norm(vec):.6f}  wall={t_solve:.1f}s (includes compile)", flush=True)

t0 = time.perf_counter()
energy2, vec2, _ = qubit.solve_qubit_device(mat, op, tol=1e-6)
print(f"warm solve: {time.perf_counter()-t0:.2f}s  E0={energy2:.9f}", flush=True)
assert abs(energy - energy2) < 1e-8
print("QUBIT SOLVE ON TPU OK", flush=True)
