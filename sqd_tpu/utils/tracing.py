# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Observability helpers for the SQD loop.

The reference exposes only a bare ``callback(results)`` hook and ``verbose``
prints (SURVEY.md §5).  This module keeps that callback contract and layers
structured metrics and profiler tracing on top:

* :class:`IterationLogger` — a callback object recording per-iteration
  energies, subspace dimensions and wall-clock (the pattern the reference's
  quickstart notebook builds by hand).
* :func:`profile_trace` — context manager around ``jax.profiler`` for
  capturing a TensorBoard-compatible device trace of one or more iterations.
"""

from __future__ import annotations

import contextlib
import logging
import time

import numpy as np

__all__ = ["IterationLogger", "profile_trace", "logger"]

logger = logging.getLogger("sqd_tpu")


class IterationLogger:
    """Callback collecting per-iteration metrics of the SQD loop.

    Usage::

        log = IterationLogger()
        result = diagonalize_fermionic_hamiltonian(..., callback=log)
        log.history  # list of dicts: iteration, best/all energies, dims, dt
    """

    def __init__(self, log_level: int | None = logging.INFO):
        self.history: list[dict] = []
        self._t_last = time.perf_counter()
        self._log_level = log_level

    def __call__(self, results) -> None:
        now = time.perf_counter()
        energies = [float(r.energy) for r in results]
        dims = [
            (len(r.sci_state.ci_strs_a), len(r.sci_state.ci_strs_b)) for r in results
        ]
        entry = {
            "iteration": len(self.history),
            "best_energy": min(energies),
            "energies": energies,
            "subspace_dims": dims,
            "occupancies": results[int(np.argmin(energies))].orbital_occupancies,
            "wall_seconds": now - self._t_last,
        }
        self._t_last = now
        self.history.append(entry)
        if self._log_level is not None:
            logger.log(
                self._log_level,
                "SQD iteration %d: best energy %.10f, dims %s, %.2fs",
                entry["iteration"],
                entry["best_energy"],
                dims,
                entry["wall_seconds"],
            )

    @property
    def energies(self) -> list[float]:
        return [h["best_energy"] for h in self.history]


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a ``jax.profiler`` device trace (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
