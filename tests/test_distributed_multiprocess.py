# (C) 2026. Licensed under the Apache License, Version 2.0.
"""REAL multi-process execution of the distributed entry points.

The reference's cluster story is an MPI-launched external solver
(``integrate_dice_solver.ipynb``); ours is SPMD over a global mesh
(SURVEY.md N10).  Degenerate single-process behavior is covered in
``test_parallel.py``; this test launches TWO actual OS processes (4 virtual
CPU devices each), wires them through :func:`sqd_tpu.parallel.init_distributed`
(Gloo cross-process collectives), and runs a row-sharded Davidson solve whose
psum collectives genuinely cross the process boundary — then pins both ranks'
energies against the in-process dense oracle.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _problem(return_chol: bool = False):
    """Small synthetic PSD-ERI problem: norb=6, (3,3)e, full 400-det CAS."""
    rng = np.random.default_rng(12)
    norb = 6
    h1 = rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2 + np.diag(np.linspace(-4.0, 0.0, norb))
    chol = rng.normal(size=(8, norb, norb)) * 0.3
    chol = (chol + chol.transpose(0, 2, 1)) / 2
    eri = np.einsum("xpq,xrs->pqrs", chol, chol)
    if return_chol:
        return norb, h1, eri, chol
    return norb, h1, eri


def _run_full_loop(mesh):
    """The FULL SQD loop (L3 orchestrator) over the mesh-sharded batch solver.

    Deterministic by construction (fixed seeds everywhere); returns a
    JSON-able fingerprint whose floats round-trip exactly (Python json uses
    shortest-roundtrip repr), so cross-process comparisons are bit-for-bit.
    """
    import hashlib
    from functools import partial

    from sqd_tpu import fermion
    from sqd_tpu.ops import dense_fci
    from sqd_tpu.parallel import solve_sci_batch_sharded
    from sqd_tpu.primitives import BitArray

    norb, h1, eri = _problem()
    nelec = (3, 3)
    strs = dense_fci.all_hamming_strings(norb, nelec[0])
    h_dense = dense_fci.build_dense_hamiltonian(strs, strs, h1, eri)
    gs = np.linalg.eigh(h_dense)[1][:, 0]
    n = len(strs)
    probs = np.abs(gs) ** 2
    probs /= probs.sum()
    rng = np.random.default_rng(21)
    draws = rng.choice(n * n, size=4000, p=probs)
    rows = np.zeros((len(draws), 2 * norb), dtype=bool)
    for i, d in enumerate(draws):
        sa, sb = int(strs[d // n]), int(strs[d % n])
        for p in range(norb):
            rows[i, norb - 1 - p] = (sb >> p) & 1
            rows[i, 2 * norb - 1 - p] = (sa >> p) & 1
    bit_array = BitArray.from_bool_array(rows)

    energies_iter = []
    result = fermion.diagonalize_fermionic_hamiltonian(
        h1,
        eri,
        bit_array,
        samples_per_batch=40,
        norb=norb,
        nelec=nelec,
        num_batches=3,
        max_iterations=3,
        energy_tol=1e-15,
        occupancies_tol=1e-15,
        seed=5,
        sci_solver=partial(solve_sci_batch_sharded, mesh=mesh, tol=1e-8),
        callback=lambda rs: energies_iter.append([r.energy for r in rs]),
    )
    st = result.sci_state
    h = hashlib.sha256()
    for arr in (
        np.asarray(st.ci_strs_a, np.int64),
        np.asarray(st.ci_strs_b, np.int64),
        np.ascontiguousarray(st.amplitudes, np.float64),
        np.ascontiguousarray(result.orbital_occupancies[0], np.float64),
        np.ascontiguousarray(result.orbital_occupancies[1], np.float64),
    ):
        h.update(arr.tobytes())
    return {
        "iterations": len(energies_iter),
        "energies_iter": energies_iter,
        "final_energy": result.energy,
        "state_sha": h.hexdigest(),
        "dim": [len(st.ci_strs_a), len(st.ci_strs_b)],
    }


_WORKER_FULL_LOOP = """
import json, sys
sys.path.insert(0, REPO_DIR)
import jax

rank, port = int(sys.argv[1]), int(sys.argv[2])
import sqd_tpu.parallel as par

ok = par.init_distributed(
    "127.0.0.1:%d" % port, num_processes=2, process_id=rank, platform="cpu"
)
assert ok and jax.process_count() == 2 and jax.device_count() == 8

from tests.test_distributed_multiprocess import _run_full_loop

out = _run_full_loop(par.global_mesh("batch"))
out["rank"] = rank
print(json.dumps(out), flush=True)
"""


_WORKER = """
import json, sys
sys.path.insert(0, REPO_DIR)
import jax
import numpy as np

rank, port = int(sys.argv[1]), int(sys.argv[2])
import sqd_tpu.parallel as par

ok = par.init_distributed(
    "127.0.0.1:%d" % port, num_processes=2, process_id=rank, platform="cpu"
)
assert ok, "init_distributed returned False with explicit coordinator"
assert par.is_distributed(), jax.process_count()
assert jax.process_count() == 2
assert jax.device_count() == 8 and jax.local_device_count() == 4

mesh = par.global_mesh("rows")
from tests.test_distributed_multiprocess import _problem
from sqd_tpu.ops.dense_fci import all_hamming_strings
from sqd_tpu.parallel import solve_sci_rowsharded

norb, h1, eri = _problem()
strs = all_hamming_strings(norb, 3)
res = solve_sci_rowsharded(
    (strs, strs), h1, eri, norb, (3, 3), mesh=mesh, tol=1e-7
)
occ_a, occ_b = res.orbital_occupancies
print(json.dumps({
    "rank": rank,
    "energy": res.energy,
    "occ_a_sum": float(np.sum(occ_a)),
    "amp_norm": float(np.linalg.norm(res.sci_state.amplitudes)),
}), flush=True)
"""


_WORKER_GRID_DF = """
import json, sys
sys.path.insert(0, REPO_DIR)
import jax
import numpy as np

rank, port = int(sys.argv[1]), int(sys.argv[2])
import sqd_tpu.parallel as par

ok = par.init_distributed(
    "127.0.0.1:%d" % port, num_processes=2, process_id=rank, platform="cpu"
)
assert ok and jax.process_count() == 2 and jax.device_count() == 8

from tests.test_distributed_multiprocess import _problem
from sqd_tpu.ops.dense_fci import all_hamming_strings
from sqd_tpu.parallel import solve_sci_dfsharded, solve_sci_gridsharded

norb, h1, eri, chol = _problem(return_chol=True)
strs = all_hamming_strings(norb, 3)

# 2-D (alpha x beta) grid over both processes: the row all-gather, col
# all-gather and psum_scatter all cross the process boundary
res_grid = solve_sci_gridsharded((strs, strs), h1, eri, norb, (3, 3), tol=1e-7)

# factor-axis sharding: the x-reduction psum crosses the process boundary
res_df = solve_sci_dfsharded(
    (strs, strs), h1, eri, norb, (3, 3),
    eri_factor=chol.reshape(chol.shape[0], norb * norb), tol=1e-8,
)

print(json.dumps({
    "rank": rank,
    "energy_grid": res_grid.energy,
    "energy_df": res_df.energy,
    "occ_grid_sum": float(np.sum(res_grid.orbital_occupancies[0])),
    "occ_df_sum": float(np.sum(res_df.orbital_occupancies[0])),
}), flush=True)
"""


def _launch_two(tmp_path, worker_src):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(f"REPO_DIR = {_REPO!r}\n" + worker_src)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=_REPO,
            text=True,
        )
        for rank in range(2)
    ]
    try:
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=540)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            outs.append(json.loads(out.strip().splitlines()[-1]))
        return outs
    finally:
        # one rank failing leaves the other blocked in a Gloo collective —
        # never leak it (stray workers wedge later runs on this machine)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)


def test_two_process_grid_and_df_sharded(tmp_path):
    """Grid- (2-D alpha x beta) and DF-factor-axis solves across 2 processes."""
    outs = _launch_two(tmp_path, _WORKER_GRID_DF)

    from sqd_tpu.ops.dense_fci import all_hamming_strings, build_dense_hamiltonian

    norb, h1, eri = _problem()
    strs = all_hamming_strings(norb, 3)
    e_exact = np.linalg.eigvalsh(build_dense_hamiltonian(strs, strs, h1, eri))[0]

    assert {o["rank"] for o in outs} == {0, 1}
    for o in outs:
        assert abs(o["energy_grid"] - e_exact) < 1e-6, (o, e_exact)
        assert abs(o["energy_df"] - e_exact) < 1e-6, (o, e_exact)
        assert abs(o["occ_grid_sum"] - 3.0) < 1e-6
        assert abs(o["occ_df_sum"] - 3.0) < 1e-6
    # SPMD: both ranks computed the identical epilogue
    for key in ("energy_grid", "energy_df"):
        assert outs[0][key] == pytest.approx(outs[1][key], abs=1e-12)


def test_two_process_rowsharded_solve(tmp_path):
    outs = _launch_two(tmp_path, _WORKER)

    # oracle: dense eigensolve of the same operator, in this process
    from sqd_tpu.ops.dense_fci import all_hamming_strings, build_dense_hamiltonian

    norb, h1, eri = _problem()
    strs = all_hamming_strings(norb, 3)
    e_exact = np.linalg.eigvalsh(build_dense_hamiltonian(strs, strs, h1, eri))[0]

    assert {o["rank"] for o in outs} == {0, 1}
    for o in outs:
        assert abs(o["energy"] - e_exact) < 1e-6, (o, e_exact)
        assert abs(o["occ_a_sum"] - 3.0) < 1e-6
        assert abs(o["amp_norm"] - 1.0) < 1e-9
    # SPMD: both ranks computed the identical epilogue
    assert outs[0]["energy"] == pytest.approx(outs[1]["energy"], abs=1e-12)


def test_two_process_full_sqd_loop(tmp_path):
    """The COMPLETE SQD loop (postselect -> recover -> subsample -> batch
    solve -> carryover, 3 iterations) across 2 OS processes with the
    mesh-sharded batch solver, bit-for-bit identical to the single-process
    loop on the same 8-device mesh — the seam the reference distributes via
    its MPI Dice solver (``fermion.py:161-165,370``,
    ``docs/guides/integrate_dice_solver.ipynb``)."""
    outs = _launch_two(tmp_path, _WORKER_FULL_LOOP)

    from sqd_tpu.parallel import default_mesh

    want = _run_full_loop(default_mesh())
    assert want["iterations"] == 3

    assert {o["rank"] for o in outs} == {0, 1}
    for o in outs:
        # bit-for-bit: every per-batch energy of every iteration, the final
        # energy, and the sha over strings + amplitudes + occupancies
        assert o["energies_iter"] == want["energies_iter"]
        assert o["final_energy"] == want["final_energy"]
        assert o["state_sha"] == want["state_sha"]
        assert o["dim"] == want["dim"]
