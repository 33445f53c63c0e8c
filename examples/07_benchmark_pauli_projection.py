# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Pauli-projection scaling benchmark.

Mirrors the reference's benchmark notebook
(docs/guides/benchmark_pauli_projection.ipynb): project one Z^(x)n term onto
subspaces of growing dimension d and report wall-clock.  The reference
measures ~4.2 s at n = 40, d = 5e7 on a CPU host (63-qubit hard limit); the
packed-word device kernel below has no qubit ceiling.
"""

import time

import numpy as np

from sqd_tpu import qubit
from sqd_tpu.ops import bitpack
from sqd_tpu.primitives import Pauli


def run(num_qubits: int, dims):
    rng = np.random.default_rng(0)
    pauli = Pauli.from_label("Z" * num_qubits)
    for d in dims:
        bits = rng.integers(0, 2, size=(d, num_qubits)).astype(bool)
        packed = bitpack.unique_packed(bitpack.pack_bool_matrix(bits))
        mat = bitpack.unpack_to_bool_matrix(packed, num_qubits)
        # warm-up (compile)
        qubit.matrix_elements_from_pauli(mat[: min(len(mat), 1024)], pauli)
        t0 = time.perf_counter()
        amps, rows, cols = qubit.matrix_elements_from_pauli(mat, pauli)
        dt = time.perf_counter() - t0
        print(
            f"n={num_qubits:3d}  d={len(mat):>10,}  projection: {dt*1e3:9.2f} ms  "
            f"nnz={len(amps):,}"
        )


def main():
    print("40 qubits (reference: ~4.2 s at d = 5e7 on CPU):")
    run(40, [50_000, 500_000, 5_000_000])
    print("\n60 qubits:")
    run(60, [500_000])
    print("\n70 qubits (beyond the reference's 63-qubit limit):")
    run(70, [500_000])


if __name__ == "__main__":
    main()
