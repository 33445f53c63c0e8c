# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Qubit path: project a Heisenberg-ring Hamiltonian onto a sampled subspace.

Mirrors the reference guide
(docs/guides/project_pauli_operators_onto_hilbert_subspaces.ipynb): an L-site
Heisenberg ring, a set of sampled bitstrings, the projected operator, and its
lowest eigenvalue — via both the scipy-parity path and the fully on-device
matrix-free path.
"""

import numpy as np

from sqd_tpu import qubit
from sqd_tpu.models.heisenberg import heisenberg_ring


def main():
    num_sites = 12
    op = heisenberg_ring(num_sites, h_z=0.1)
    print(f"{num_sites}-site Heisenberg ring, {op.size} Pauli terms")

    rng = np.random.default_rng(0)
    # sample half-filling-weighted random bitstrings
    samples = rng.integers(0, 2, size=(2000, num_sites)).astype(bool)
    mat = qubit.sort_and_remove_duplicates(samples)
    print(f"subspace dimension: {len(mat)} of 2^{num_sites} = {2**num_sites}")

    proj = qubit.project_operator_to_subspace(mat, op)
    energies, _ = qubit.solve_qubit(mat, op, k=1, which="SA")
    print(f"scipy eigsh lowest eigenvalue:  {energies[0]:.8f}")

    e_dev, vec, _ = qubit.solve_qubit_device(mat, op)
    print(f"device Davidson (matrix-free):  {e_dev:.8f}")
    print(f"projected operator nnz: {proj.nnz}")


if __name__ == "__main__":
    main()
