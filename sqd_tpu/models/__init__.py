# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Hamiltonian model builders: Hubbard, Heisenberg spin chains, FCIDUMP molecular integrals."""
