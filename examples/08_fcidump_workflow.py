# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Molecular workflow via FCIDUMP interchange.

The reference obtains integrals from PySCF inside its guides; here any
chemistry package's FCIDUMP file drives the same workflow.  This example
writes one (from a model Hamiltonian), reads it back, and runs SQD.
"""

import tempfile

import numpy as np

from sqd_tpu import BitArray, diagonalize_fermionic_hamiltonian
from sqd_tpu.models.fcidump import read_fcidump, write_fcidump
from sqd_tpu.models.hubbard import hubbard_integrals


def main():
    norb, nelec = 6, (3, 3)
    h1, eri = hubbard_integrals(norb, u=4.0)
    path = tempfile.mktemp(suffix=".fcidump")
    write_fcidump(path, h1, eri, nelec=nelec, ecore=-1.5)
    print(f"wrote {path}")

    mol = read_fcidump(path)
    print(f"read back: norb={mol['norb']} nelec={mol['nelec']} ecore={mol['ecore']}")

    rng = np.random.default_rng(0)
    rows = []
    for _ in range(4000):
        row = np.zeros(2 * norb, dtype=bool)
        row[rng.choice(norb, nelec[1], replace=False)] = True
        row[norb + rng.choice(norb, nelec[0], replace=False)] = True
        rows.append(row)
    bit_array = BitArray.from_bool_array(np.array(rows))

    result = diagonalize_fermionic_hamiltonian(
        mol["h1e"],
        mol["eri"],
        bit_array,
        samples_per_batch=60,
        norb=mol["norb"],
        nelec=mol["nelec"],
        num_batches=2,
        max_iterations=4,
        seed=0,
    )
    print(f"electronic energy: {result.energy:.8f}")
    print(f"total energy (+ core): {result.energy + mol['ecore']:.8f}")


if __name__ == "__main__":
    main()
