"""solve_qubit_device at d = 1e7: 104-term L=26 Heisenberg ring, one chip.

The reference's qubit story tops out at projection-only for large d (its
benchmark notebook times per-term COO assembly at d = 5e7,
``docs/guides/benchmark_pauli_projection.ipynb``) and hands eigensolves to
host ARPACK (``qiskit_addon_sqd/qubit.py:73``).  This probe runs the FULL
eigensolve — grouped bit-packed-weight operator + on-device Davidson — at a
dimension ARPACK-over-COO cannot hold: d = 1e7 rows, 26 gather groups.

HBM plan (estimate_operator_bytes): perm 26 x 1e7 x 4 = 1.04 GB, sign words
65 MB, hdiag 80 MB; Davidson adds ~2 x 32 vectors x 80 MB (f64) = 5.1 GB.

CPU-reduced-d correctness pin: tests/test_qubit.py
``test_solve_qubit_device_on_packed_operator``.
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
import sqd_tpu  # noqa: F401
from sqd_tpu import qubit
from sqd_tpu.models.heisenberg import heisenberg_ring
from sqd_tpu.ops.pauli_proj import estimate_operator_bytes

nq, d = 26, 10_000_000
op = heisenberg_ring(nq, j_xx=1.0, j_yy=1.0, j_zz=1.0, h_z=0.1)
rng = np.random.default_rng(7)
ints = np.unique(rng.integers(0, 1 << nq, size=int(d * 1.1), dtype=np.int64))[:d]
assert len(ints) == d
packed = np.zeros((d, 1), dtype=np.uint32)
packed[:, 0] = ints

est = estimate_operator_bytes(d, num_nondiag_groups=nq, max_terms_per_group=2,
                              weights="packed", is_complex=False)
print(f"terms={len(op.coeffs)} d={d}  operator estimate {est/1e9:.2f} GB", flush=True)

t0 = time.perf_counter()
energy, vec, proj = qubit.solve_qubit_device(packed, op, tol=1e-6)
t_cold = time.perf_counter() - t0
print(f"cold solve {t_cold:.1f}s (incl. compile)  E0={energy:.9f}  "
      f"packed_weights={proj.packed_weights} scan={proj.scan_matvec} "
      f"resident={proj.memory_bytes/1e9:.2f} GB  groups={proj.num_groups}", flush=True)
assert proj.packed_weights and proj.scan_matvec
assert abs(proj.memory_bytes - est) < 0.01 * est

t0 = time.perf_counter()
energy2, vec2, _ = qubit.solve_qubit_device(packed, op, tol=1e-6)
t_warm = time.perf_counter() - t0
print(f"warm solve {t_warm:.1f}s  E0={energy2:.9f}", flush=True)
assert abs(energy - energy2) < 1e-6
print("QUBIT SOLVE 1e7 OK", flush=True)
