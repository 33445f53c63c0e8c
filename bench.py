# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Headline benchmark: Davidson ground-state solve at a 10^6-determinant subspace.

Matches BASELINE.json's metric ("Davidson solve wall-clock at 10^6-det
subspace") on REAL chemistry: the N2/6-31G CAS(16o, (5,5)e) Hamiltonian of
BASELINE config 1, with integrals computed by the built-in Gaussian-integral
engine (``sqd_tpu.chem`` — validated to 7e-13 against the reference's
published RHF energy).  The 10^6-det subspace is 1000 x 1000 excitation
strings around the Hartree-Fock determinant; the solve runs the production
path: f32 Davidson iterations + chunk-accumulated f64 energy.

Accuracy gates:
* the 10^6-det solve is checked against a true host-f64 Rayleigh quotient of
  the same vector (<1e-7 Ha);
* the FULL CASCI space (4368^2 = 1.91e7 determinants on one chip) is checked
  against the reference's published exact energy -109.046671778080 Ha
  (``/root/reference/docs/guides/integrate_dice_solver.ipynb`` cell-1 output).

``vs_baseline``: the reference delegates this solve to PySCF's OpenMP
selected-CI kernels; its README claims ~10^7-dim problems are tractable on
10-30 CPU cores (README.md:78) with no published wall-clock.  We use a
conservative 60 s estimate for a 64-core node at 10^6 determinants
(~40 Davidson iterations x ~1.5 s/contract_2e); ``vs_baseline`` is the
speedup factor over that estimate.

Secondary metrics: the reference's one published wall-clock headline — Pauli
projection of a Z^n term over d = 5e7 sorted unique bitstrings, 4.17 s at 40
qubits / 5.16 s at 60 qubits on its notebook host
(``docs/guides/benchmark_pauli_projection.ipynb`` cells 7/11) — measured
device-resident (packed uint32 in HBM -> per-term table on chip), plus a
non-diagonal (X-containing) term through the on-device involution-pairing
membership (sort by min(a, a^x) lands partners adjacent), which the
reference cannot express at 60 qubits at all (63-bit ceiling).
"""

import json
import os
import time

import numpy as np

# SQD_BENCH_SMALL=1 shrinks every problem so the full script logic can be
# smoke-tested on CPU in seconds (the published-number gates that only hold
# at full scale are skipped); the driver's real run never sets it.
_SMALL = bool(os.environ.get("SQD_BENCH_SMALL"))

CPU_BASELINE_SECONDS = 60.0
N2_631G_CASCI_TOTAL = -109.046671778080  # integrate_dice_solver.ipynb cell 1
REF_PAULI_40Q_SECONDS = 4.17  # benchmark_pauli_projection.ipynb cell 7
REF_PAULI_60Q_SECONDS = 5.16  # benchmark_pauli_projection.ipynb cell 11
_T_START = time.perf_counter()

# Progressive result state shared with the watchdog thread: the tunnel daemon
# can WEDGE mid-run (client blocks forever in a futex wait — see CLAUDE.md);
# a wedged bench would hit the driver's process timeout and leave NO artifact.
# Sections record their results here as they complete; if the budget expires,
# a daemon thread (which keeps running even when the main thread is stuck in
# a blocking C call) prints whatever is done as one valid JSON line and exits.
_WD = {"stage": "startup", "headline": None, "detail": {}}


def _watchdog_fire(budget: float) -> None:  # pragma: no cover - wedge path
    detail = dict(_WD["detail"])
    detail["watchdog"] = (
        f"budget of {budget:.0f}s expired during stage {_WD['stage']!r}; "
        "partial results only (likely a wedged tunnel daemon)"
    )
    head = _WD["headline"] or {"value": None, "vs_baseline": None}
    out = {
        "metric": "davidson_solve_1e6_dets_wallclock",
        "value": head["value"],
        "unit": "seconds",
        "vs_baseline": head["vs_baseline"],
        "detail": detail,
    }
    print(json.dumps(out), flush=True)
    os._exit(0)


def _host_f64_energy(ham, vec_flat: np.ndarray) -> float:
    """True f64 Rayleigh quotient <c|H|c>/<c|c> on the HOST (NumPy/BLAS).

    Uses the operator's own gather tables; every contraction is genuine f64
    (unlike on-TPU "f64" dot_generals, which accumulate at f32 grade).
    """
    m, n = ham.shape
    c = vec_flat.reshape(m, n)
    c = c / np.linalg.norm(c)
    src_a = np.asarray(ham.src_a)
    sign_a = np.asarray(ham.sign_a, np.float64)
    src_b = np.asarray(ham.src_b)
    sign_b = np.asarray(ham.sign_b, np.float64)
    eri_t = np.asarray(ham.eri_t, np.float64)
    npair = eri_t.shape[0]
    # cross-spin: pab[pq, rs] = <E^a_pq c, E^b_rs c>, blocked over pairs
    d_a = (sign_a[:, :, None] * c[src_a]).reshape(npair, -1)  # (npair, m*n)
    d_b = np.swapaxes(np.take(c, src_b, axis=1), 0, 1) * sign_b[:, None, :]
    pab = d_a @ d_b.reshape(npair, -1).T
    e = float(np.sum(eri_t * pab.T))
    # same-spin channels via Gram matrices (exact, tiny)
    gram_r = c @ c.T
    gram_c = c.T @ c
    idx_a = np.asarray(ham.nbr_idx_a)
    val_a = np.asarray(ham.nbr_val_a, np.float64)
    rows = np.arange(m)[:, None]
    e += float(np.sum(val_a * gram_r[idx_a, rows]))
    idx_b = np.asarray(ham.nbr_idx_b)
    val_b = np.asarray(ham.nbr_val_b, np.float64)
    cols = np.arange(n)[:, None]
    e += float(np.sum(val_b * gram_c[idx_b, cols]))
    return e


def excitation_strings(count, norb, n_elec, seed):
    """HF determinant + a random walk of low-order excitations (SQD-like set)."""
    r = np.random.default_rng(seed)
    hf = (1 << n_elec) - 1
    seen = {hf}
    frontier = [hf]
    while len(seen) < count:
        base = frontier[r.integers(len(frontier))] if frontier else hf
        occ = [p for p in range(norb) if (base >> p) & 1]
        virt = [p for p in range(norb) if not (base >> p) & 1]
        o = occ[r.integers(len(occ))]
        v = virt[r.integers(len(virt))]
        new = base ^ (1 << o) ^ (1 << v)
        if new not in seen:
            seen.add(new)
            frontier.append(new)
            if len(frontier) > 64:
                frontier.pop(0)
    return np.array(sorted(seen), dtype=np.int64)


def _tunnel_alive() -> bool:
    """True when at least one axon relay port accepts a connection.

    The tunneled-TPU client blocks FOREVER in ``make_c_api_client`` when the
    relay (/root/.tpu_init.py) is down — observed 2026-08-17 when the relay
    process died mid-session.  A bounded socket preflight turns an unbounded
    hang into a fast, diagnosable failure.
    """
    import socket

    for port in (8082, 8083, 8087, 8092, 8093, 8097, 8102, 8103, 8107, 8112, 8113, 8117):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            continue
    return False


def main():
    import jax

    if not _SMALL and not _tunnel_alive():
        import sys

        sys.stderr.write(
            "bench: no axon tunnel relay port is listening on 127.0.0.1 "
            "(8082-8117); the TPU client would hang forever in "
            "make_c_api_client.  Restore the tunnel (or run the CPU smoke "
            "test with SQD_BENCH_SMALL=1) and retry.\n"
        )
        raise SystemExit(3)

    import threading

    # generous: a fully cold run (session establishment up to ~20 min +
    # multi-minute tunnel compiles) must never trip it; only a true wedge does
    wd_budget = float(os.environ.get("SQD_BENCH_WATCHDOG_SECONDS", "5400"))
    wd_timer = threading.Timer(wd_budget, _watchdog_fire, args=(wd_budget,))
    wd_timer.daemon = True
    wd_timer.start()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    # persist EVERY compile (incl. sub-second convert/sum ops): at ~0.2-0.3 s
    # apiece over the tunnel they otherwise recompile in every process
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from sqd_tpu.chem import Molecule, active_space_integrals, rhf
    from sqd_tpu.ops import bitpack
    from sqd_tpu.ops.davidson import davidson_ground_state, davidson_initial_guess
    from sqd_tpu.ops.hamiltonian import (
        build_sci_hamiltonian,
        expectation_value,
        sci_matvec_flat,
    )

    # --- real chemistry: N2/6-31G CAS(16o, (5,5)e), BASELINE config 1 -------
    t_chem0 = time.perf_counter()
    mol = Molecule([("N", (0.0, 0.0, 0.0)), ("N", (1.0, 0.0, 0.0))], basis="6-31g")
    mf = rhf(mol)
    h1, eri, ecore = active_space_integrals(mf, ncas=16, nelecas=10)
    t_chem = time.perf_counter() - t_chem0
    norb, nelec = 16, (5, 5)

    m = n = 60 if _SMALL else 1000
    strs_a = excitation_strings(m, norb, nelec[0], 1)
    strs_b = excitation_strings(n, norb, nelec[1], 2)
    pa = bitpack.pack_ints(strs_a, norb)
    pb = bitpack.pack_ints(strs_b, norb)

    # The first device op of a process pays axon tunnel session establishment
    # (tens of seconds, varies by session) — fence it out so table_build
    # measures the build, not the tunnel (BENCH_r02 conflated them: 28 s
    # reported vs <1 s of actual host compute).
    _WD["stage"] = "tunnel_session_establishment"
    t_sess0 = time.perf_counter()
    _ = float(jnp.sum(jnp.arange(8.0)))
    t_session = time.perf_counter() - t_sess0

    # --- chip-health fence: the tunneled chip has DEGRADED WINDOWS (~20x
    # slower, identical HLO — tpu_numerics.md §10b).  Record a chained bf16
    # matmul calibration so anomalous wall-clocks in THIS run can be
    # attributed to chip state rather than code (healthy window: ~80 TFLOP/s;
    # degraded: single-digit).  Chained fori_loop is the only valid timing
    # through the tunnel (single-dispatch floors are not constant).
    chip_tflops = None
    if not _SMALL:
        _WD["stage"] = "chip_health_calibration"
        from functools import partial

        @partial(jax.jit, static_argnames=("r",))
        def _mm_chain(a, y, r):
            def body(_, y):
                return jnp.matmul(
                    a, y, preferred_element_type=jnp.float32
                ).astype(y.dtype)

            return jax.lax.fori_loop(0, r, body, y)

        _cal_n, _cal_r = 2048, 32
        _rng_cal = np.random.default_rng(0)
        _a_cal = jnp.asarray(
            (_rng_cal.normal(size=(_cal_n, _cal_n)) / np.sqrt(_cal_n)).astype(
                np.float32
            )
        ).astype(jnp.bfloat16)
        _y_cal = jnp.asarray(
            _rng_cal.normal(size=(_cal_n, _cal_n)).astype(np.float32)
        ).astype(jnp.bfloat16)
        _out = _mm_chain(_a_cal, _y_cal, _cal_r)
        _ = float(jnp.sum(_out[0].astype(jnp.float32)))  # compile + warm
        _t0 = time.perf_counter()
        _out = _mm_chain(_a_cal, _y_cal, _cal_r)
        _ = float(jnp.sum(_out[0].astype(jnp.float32)))
        _t = (time.perf_counter() - _t0) / _cal_r
        chip_tflops = round(2 * _cal_n**3 / _t / 1e12, 1)

    # pure host-side native table compute (no device involvement)
    from sqd_tpu import native as native_mod

    t_host0 = time.perf_counter()
    if native_mod.available():
        native_mod.gather_tables(pa, norb)
        native_mod.gather_tables(pb, norb)
        native_mod.samespin_tables(pa, np.asarray(h1), np.asarray(eri), norb, nelec[0])
        native_mod.samespin_tables(pb, np.asarray(h1), np.asarray(eri), norb, nelec[1])
    t_host_tables = time.perf_counter() - t_host0

    _WD["stage"] = "table_build_1e6"
    t_build0 = time.perf_counter()
    ham64 = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, dtype=jnp.float64)
    ham32 = ham64.astype(jnp.float32)
    hd32 = ham32.hdiag.reshape(-1)
    # force completion of the table build
    _ = float(jnp.sum(ham32.nbr_val_a)) + float(jnp.sum(hd32))
    t_build = time.perf_counter() - t_build0

    # ONE jitted program for init + Davidson + f64 energy: the tunnel adds
    # ~27 ms dispatch latency PER host->device call, so splitting these into
    # separate calls taxes the 0.4 s headline by ~15-20%.
    @jax.jit
    def _solve_fused(ham32, ham64, hd32):
        v0 = davidson_initial_guess(hd32, jnp.float32)
        res = davidson_ground_state(
            sci_matvec_flat, ham32, hd32, v0, tol=1e-3, max_subspace=24, max_iterations=200
        )
        # chunk-accumulated f64 energy: a plain "f64" matvec+vdot on TPU is
        # both ~12x slower AND only ~1e-5-accurate (f32-grade MXU
        # accumulation); this path is ~1e-9 vs host-f64 ground truth.
        energy = expectation_value(ham64, res.vector)
        return energy, res.iterations, res.residual_norm, res.converged, res.vector

    def solve():
        energy, iters, rnorm, converged, vec = _solve_fused(ham32, ham64, hd32)
        return float(energy), int(iters), float(rnorm), bool(converged), vec

    # warm-up (compile)
    _WD["stage"] = "headline_solve_compile"
    energy, iters, rnorm, converged, vec = solve()
    _WD["stage"] = "headline_solve_timed"
    t0 = time.perf_counter()
    energy, iters, rnorm, converged, vec = solve()
    elapsed = time.perf_counter() - t0
    assert converged, f"Davidson did not converge (residual {rnorm})"
    _WD["headline"] = {
        "value": round(elapsed, 4),
        "vs_baseline": round(CPU_BASELINE_SECONDS / elapsed, 2),
    }

    # --- ACCURACY GATE: host-f64 oracle on the same vector ------------------
    # BASELINE demands <1e-8 Ha agreement with an exact f64 reference; TPU
    # has no f64 MXU, so the on-device energy must be checked against a true
    # host-f64 Rayleigh quotient of the SAME eigenvector, computed in NumPy
    # from the operator's own gather tables (reference oracle pattern:
    # /root/reference/test/test_fermion.py:117-125).
    e_host = _host_f64_energy(ham64, np.asarray(vec, np.float64))
    energy_abs_err = abs(energy - e_host)
    assert energy_abs_err < 1e-7, (energy, e_host)
    _WD["detail"].update(
        problem="N2/6-31G CAS(16o,(5,5)e), 1000x1000 excitation strings",
        dim=m * n,
        energy_total=energy + ecore,
        energy_abs_error_vs_host_f64=energy_abs_err,
        davidson_iterations=iters,
        tunnel_session_establishment_seconds=round(t_session, 3),
        table_build_seconds=round(t_build, 3),
        chip_health_bf16_2048_tflops=chip_tflops,
    )

    # --- stretch: the FULL N2/6-31G CASCI space on ONE chip -----------------
    # All C(16,5) = 4368 strings per spin -> 19,075,584 determinants; the
    # converged energy must hit the reference's published exact CASCI energy
    # -109.046671778080 Ha (integrate_dice_solver.ipynb cell 1).  This is
    # BOTH the 1e7-scale capability demo (reference envelope: ~1e7 dims on a
    # 10-30 core node, README.md:78) AND an external-truth accuracy gate at
    # exactly the scale where TPU f64-accumulation pitfalls live.
    casci_detail = None
    _WD["stage"] = "full_casci_1p9e7"
    try:
        if _SMALL:
            casci_detail = {"skipped": "SQD_BENCH_SMALL"}
        # budget EXCLUDES tunnel-session establishment (observed 2-1000+ s,
        # varies wildly by session; it is fenced and reported separately)
        elif time.perf_counter() - _T_START - t_session < 1500:
            from sqd_tpu.ops.dense_fci import all_hamming_strings

            strs_full = all_hamming_strings(norb, nelec[0])
            pf = bitpack.pack_ints(strs_full, norb)
            t_b7 = time.perf_counter()
            ham64_7 = build_sci_hamiltonian(pf, pf, h1, eri, norb, nelec, dtype=jnp.float64)
            ham32_7 = ham64_7.astype(jnp.float32)
            hd7 = ham32_7.hdiag.reshape(-1)
            _ = float(jnp.sum(hd7))
            t_build7 = time.perf_counter() - t_b7

            def solve_casci():
                v0 = davidson_initial_guess(hd7, jnp.float32)
                res = davidson_ground_state(
                    sci_matvec_flat, ham32_7, hd7, v0,
                    tol=1e-4, max_subspace=24, max_iterations=400,
                )
                return (
                    float(expectation_value(ham64_7, res.vector)),
                    int(res.iterations),
                    float(res.residual_norm),
                )

            e7, it7, rn7 = solve_casci()  # warm-up/compile
            t0 = time.perf_counter()
            e7, it7, rn7 = solve_casci()
            t7 = time.perf_counter() - t0
            e7_total = e7 + ecore
            err_published = abs(e7_total - N2_631G_CASCI_TOTAL)
            assert err_published < 2e-6, (e7_total, N2_631G_CASCI_TOTAL)
            casci_detail = {
                "dim": int(len(strs_full)) ** 2,
                "seconds": round(t7, 4),
                "table_build_seconds": round(t_build7, 3),
                "iterations": it7,
                "residual_norm": rn7,
                "energy_total": e7_total,
                "published_exact_total": N2_631G_CASCI_TOTAL,
                "abs_error_vs_published": err_published,
            }
            # free the ~GB-scale 1.9e7-det tables: they (plus the 1e6
            # headline tables below) otherwise stay HBM-resident and OOM the
            # fe4s4 1e7-det section (observed RESOURCE_EXHAUSTED, r5 run 1)
            del ham64_7, ham32_7, hd7, strs_full, pf
        else:
            casci_detail = {"skipped": "time budget"}
    except Exception as exc:  # pragma: no cover - defensive
        casci_detail = {"error": str(exc)[:200]}
    _WD["detail"]["full_casci_1p9e7_dets_single_chip"] = casci_detail

    # --- Pauli projection (the reference's published wall-clock headline) ---
    # Reference: one Z^n term over d = 5e7 sorted unique bitstrings through
    # matrix_elements_from_pauli: ~4.17 s (40q) / ~5.16 s (60q) on its CPU
    # host.  Here the subspace is device-resident in the framework's packed
    # uint32 form (its canonical representation throughout the SQD loop) and
    # the timed work is the full per-term operator build on chip
    # (sqd_tpu.ops.pauli_proj.pauli_term_table) including a value readback
    # to force completion.  A non-diagonal term exercises the on-device
    # involution-pairing membership at the same scale.
    pauli_detail = None
    _WD["stage"] = "pauli_projection"
    try:
        from sqd_tpu.ops.pauli_proj import pauli_term_table
        from sqd_tpu.primitives import Pauli

        def rand_packed(nq, d_target, seed):
            rng2 = np.random.default_rng(seed)
            ints = np.sort(rng2.integers(0, 1 << nq, size=d_target, dtype=np.int64))
            ints = ints[np.concatenate(([True], ints[1:] != ints[:-1]))]
            packed = np.zeros((len(ints), 2), dtype=np.uint32)
            packed[:, 0] = ints & 0xFFFFFFFF
            packed[:, 1] = ints >> 32
            return packed

        def time_term(packed_dev, pauli, runs=3):
            best = float("inf")
            checksum = None
            for _ in range(runs):
                t0 = time.perf_counter()
                col, sign, phase = pauli_term_table(packed_dev, pauli)
                checksum = int(jnp.sum(sign.astype(jnp.int32)))  # forces sync
                best = min(best, time.perf_counter() - t0)
            return best, checksum

        import jax.numpy as jnp

        d_proj = 200_000 if _SMALL else 50_000_000
        pauli_detail = {}
        for nq, ref_s, key in (
            (40, REF_PAULI_40Q_SECONDS, "z40_d5e7"),
            (60, REF_PAULI_60Q_SECONDS, "z60_d5e7"),
        ):
            packed = rand_packed(nq, d_proj, 3 if nq == 40 else 4)
            packed_dev = jnp.asarray(packed)
            pz = Pauli.from_label("Z" * nq)
            t_z, cs = time_term(packed_dev, pz)  # first call compiles; min of 3
            entry = {
                "dim": int(packed.shape[0]),
                "device_op_seconds": round(t_z, 4),
                "reference_cpu_seconds": ref_s,
                "speedup_vs_reference": round(ref_s / t_z, 1),
                "checksum": cs,
            }
            if nq == 40:
                # non-diagonal term: on-device pairing membership at d=5e7
                px = Pauli.from_label("X" + "Z" * (nq - 1))
                t_x, cs_x = time_term(packed_dev, px)
                entry["nondiagonal_term_seconds"] = round(t_x, 4)
                entry["nondiagonal_checksum"] = cs_x
                # API-parity figure: packed host input -> host COO triplets
                # through the public matrix_elements_from_pauli (no 2 GB bool
                # matrix materialization)
                from sqd_tpu import qubit as qubit_mod

                # min of 2: this VM sees episodic 10-100x CPU steal from the
                # tunnel terminal, so single host-side timings are unreliable
                t_api = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    amps, rows, cols = qubit_mod.matrix_elements_from_pauli(packed, pz)
                    t_api = min(t_api, time.perf_counter() - t0)
                entry["host_api_packed_seconds"] = round(t_api, 4)
                entry["nnz"] = int(len(amps))
                del amps, rows, cols
                # LIKE-FOR-LIKE with the reference's exact published setup
                # (benchmark_pauli_projection.ipynb cells 6-7): the subspace
                # arrives as the d x nq HOST BOOL MATRIX and the timed call
                # returns host COO triplets — including our bool->packed
                # conversion cost, the closest apples-to-apples figure to the
                # published 4.17 s.
                bool_mat = bitpack.unpack_to_bool_matrix(packed, nq)
                t_bool = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    amps, rows, cols = qubit_mod.matrix_elements_from_pauli(bool_mat, pz)
                    t_bool = min(t_bool, time.perf_counter() - t0)
                entry["like_for_like_bool_input_seconds"] = round(t_bool, 4)
                entry["like_for_like_speedup_vs_reference"] = round(ref_s / t_bool, 2)
                del bool_mat, amps, rows, cols
            pauli_detail[key] = entry
            del packed, packed_dev
    except Exception as exc:  # pragma: no cover - defensive
        pauli_detail = {"error": str(exc)[:200]}
        import gc

        gc.collect()
    _WD["detail"]["pauli_projection_device_resident"] = pauli_detail

    # --- grouped multi-term projection at large d (88 terms, d = 1e6) ------
    # The reference projects multi-term operators with a per-term Python loop
    # (qubit.py:127-142); at d >= 1e6 each term costs a full involution-
    # pairing sort on chip.  The grouped operator resolves membership once
    # per UNIQUE x-mask (22 for the L=22 ring) and folds all 88 amplitudes
    # into per-group weights — this section records both paths' wall-clock.
    multiterm_detail = None
    _WD["stage"] = "pauli_multiterm"
    try:
        import jax.numpy as jnp

        from sqd_tpu.models.heisenberg import heisenberg_ring
        from sqd_tpu.ops.pauli_proj import (
            build_projected_operator,
            pauli_apply_flat,
            pauli_term_table,
        )

        nq_m, d_m = 22, 50_000 if _SMALL else 1_000_000
        op_m = heisenberg_ring(nq_m, j_xx=1.0, j_yy=1.0, j_zz=1.0, h_z=0.1)
        rng_m = np.random.default_rng(6)
        ints_m = np.unique(
            rng_m.integers(0, 1 << nq_m, size=3 * d_m, dtype=np.int64)
        )[:d_m]
        packed_m = np.zeros((len(ints_m), 1), dtype=np.uint32)
        packed_m[:, 0] = ints_m
        sp_m = jnp.asarray(packed_m)

        def per_term_build():
            cols = None
            for p in op_m.paulis:
                cols, _, _ = pauli_term_table(sp_m, p)
            return int(jnp.sum(cols.astype(jnp.int32)))

        _ = per_term_build()  # compile
        t0 = time.perf_counter()
        _ = per_term_build()
        t_per_term = time.perf_counter() - t0

        def grouped_build():
            # sp_m: same device-resident input as per_term_build (jnp.asarray
            # is a no-op on a device array) — keeps the comparison symmetric;
            # a host input would re-pay the ~47 MB/s tunnel transfer per call
            proj = build_projected_operator(sp_m, op_m.paulis, op_m.coeffs)
            _ = float(jnp.sum(proj.weight_re[:, :8]))
            return proj

        proj_m = grouped_build()  # compile
        t0 = time.perf_counter()
        proj_m = grouped_build()
        t_grouped = time.perf_counter() - t0
        v_m = jnp.asarray(np.random.default_rng(7).normal(size=len(ints_m)))
        mv = jax.jit(pauli_apply_flat)
        _ = float(jnp.sum(mv(proj_m, v_m)))
        t0 = time.perf_counter()
        checksum_m = float(jnp.sum(mv(proj_m, v_m)))
        t_mv = time.perf_counter() - t0
        multiterm_detail = {
            "terms": int(len(op_m.coeffs)),
            "unique_x_groups": int(proj_m.num_groups),
            "dim": int(len(ints_m)),
            "per_term_build_seconds": round(t_per_term, 4),
            "grouped_build_seconds": round(t_grouped, 4),
            "speedup_grouped_vs_per_term": round(t_per_term / t_grouped, 2),
            "grouped_matvec_seconds": round(t_mv, 4),
            "checksum": checksum_m,
        }
        del proj_m, sp_m, packed_m, v_m
    except Exception as exc:  # pragma: no cover - defensive
        multiterm_detail = {"error": str(exc)[:200]}
    _WD["detail"]["pauli_multiterm_88term_1e6"] = multiterm_detail

    # --- 66-term Heisenberg projection (reference qubit-path scale demo) ----
    # Reference demonstrates L=22, 66 Pauli terms, d = 49,718 with no timing
    # (docs/guides/project_pauli_operators_onto_hilbert_subspaces.ipynb);
    # report the end-to-end matrix-free operator build + one matvec.
    heis_detail = None
    _WD["stage"] = "heisenberg_projection"
    try:
        import jax.numpy as jnp

        from sqd_tpu.models.heisenberg import heisenberg_ring
        from sqd_tpu.ops.pauli_proj import build_projected_operator, pauli_apply_flat

        nq_h, d_h = 22, 5_000 if _SMALL else 49_718
        op_h = heisenberg_ring(nq_h, j_xx=1.0, j_yy=1.0, j_zz=1.0, h_z=0.1)
        rng3 = np.random.default_rng(5)
        ints_h = np.unique(rng3.integers(0, 1 << nq_h, size=2 * d_h, dtype=np.int64))[:d_h]
        packed_h = np.zeros((len(ints_h), 1), dtype=np.uint32)
        packed_h[:, 0] = ints_h
        proj = build_projected_operator(packed_h, op_h.paulis, op_h.coeffs)  # warm-up
        v = jnp.ones((len(ints_h),), jnp.float64)
        _ = float(jnp.sum(pauli_apply_flat(proj, v)))
        t0 = time.perf_counter()
        proj = build_projected_operator(packed_h, op_h.paulis, op_h.coeffs)
        hv_sum = float(jnp.sum(pauli_apply_flat(proj, v)))
        t_heis = time.perf_counter() - t0
        heis_detail = {
            "qubits": nq_h,
            "terms": int(len(op_h.coeffs)),
            "dim": int(len(ints_h)),
            "build_plus_matvec_seconds": round(t_heis, 4),
            "checksum": hv_sum,
        }
    except Exception as exc:  # pragma: no cover - defensive
        heis_detail = {"error": str(exc)[:200]}
    _WD["detail"]["heisenberg_66term_projection"] = heis_detail

    # --- BASELINE config 5: (54e, 36o) 1.0e7-det high-filling solve --------
    # [4Fe-4S]-class ENVELOPE (synthetic integrals — no Fe basis data in this
    # image; the claim is the shape: 36-orbital multiword strings, 27
    # electrons/spin, 1e7 determinants) through the zero-gather dense-DF
    # operator.  Records the full wall-clock the VERDICT r3 found missing.
    fe4s4_detail = None
    _WD["stage"] = "fe4s4_class_1e7"
    # release the headline-solve device buffers (1e6-det gather tables +
    # Krylov vector) before staging the 1e7-det dense-DF operator
    del ham64, ham32, hd32, vec
    import gc

    gc.collect()
    try:
        if _SMALL:
            m7 = n7 = 96
        elif time.perf_counter() - _T_START - t_session > 2400:
            raise RuntimeError("time budget")
        else:
            m7 = n7 = 3163  # ~1.0e7 determinants
        norb7, nelec7 = 36, (27, 27)
        rng7 = np.random.default_rng(7)
        orb_e7 = np.linspace(-14.0, 4.0, norb7)
        h17 = np.diag(orb_e7) + 0.05 * rng7.normal(size=(norb7, norb7))
        h17 = (h17 + h17.T) / 2
        chol7 = rng7.normal(size=(3 * norb7, norb7, norb7)) * (0.5 / np.sqrt(3 * norb7))
        chol7 = (chol7 + chol7.transpose(0, 2, 1)) / 2
        eri7 = np.einsum("xpq,xrs->pqrs", chol7, chol7)
        # same alpha/beta set (S_z = 0 sector): dense-DF aliases Wb == Wa
        # (modulo the builder's x8-row / x128-column pad mismatch, handled
        # inside densify — see test_densify_aliases_wb_across_mismatched_pads)
        sa7 = excitation_strings(m7, norb7, nelec7[0], 1)
        pa7 = bitpack.pack_ints(sa7, norb7)
        t0 = time.perf_counter()
        ham64_7f = build_sci_hamiltonian(pa7, pa7, h17, eri7, norb7, nelec7, dtype=jnp.float64)
        hd7f = ham64_7f.hdiag.astype(jnp.float32).reshape(-1)
        _ = float(jnp.sum(hd7f))
        t_build7f = time.perf_counter() - t0

        from sqd_tpu.ops.dense_df import dense_df_matvec_flat, densify

        t0 = time.perf_counter()
        op7 = densify(ham64_7f, dtype=jnp.float32)
        _ = float(jnp.sum(op7.wa[0, 0]))
        t_densify = time.perf_counter() - t0

        from sqd_tpu.ops.davidson import davidson_ground_state_segmented

        def solve_fe():
            v0 = davidson_initial_guess(hd7f, jnp.float32)
            # max_subspace 12: (1e7, k) f32 Krylov buffers are ~650 MB each
            # and the dense-DF factor stack holds ~4.4 GB (Wb aliased).
            # SEGMENTED solver: at ~1.6 s/matvec a single 200-iteration XLA
            # program runs >5 min and hard-crashes the tunneled worker
            # (probes/fe4s4_stage.py); 25-iteration segments are safe.
            res = davidson_ground_state_segmented(
                dense_df_matvec_flat, op7, hd7f, v0,
                tol=1e-4, max_subspace=12, max_iterations=200,
            )
            return res

        res7 = solve_fe()
        theta7 = float(res7.theta)  # compile + first timing fence
        t0 = time.perf_counter()
        res7 = solve_fe()
        theta7 = float(res7.theta)
        t_solve7 = time.perf_counter() - t0
        e64_7 = float(expectation_value(ham64_7f, res7.vector))
        assert abs(e64_7 - theta7) < 5e-3, (e64_7, theta7)
        fe4s4_detail = {
            "problem": "(54e,36o) synthetic PSD integrals, multiword strings",
            "dim": m7 * n7,
            "table_build_seconds": round(t_build7f, 3),
            "densify_seconds": round(t_densify, 3),
            "solve_seconds": round(t_solve7, 3),
            "iterations": int(res7.iterations),
            "residual_norm": float(res7.residual_norm),
            "energy_f64_eval": e64_7,
            "f64_eval_vs_theta_abs": abs(e64_7 - theta7),
            "eri_chol_rank": None if ham64_7f.eri_chol is None else int(ham64_7f.eri_chol.shape[0]),
        }
        del ham64_7f, hd7f, op7, res7
    except Exception as exc:  # pragma: no cover - defensive
        fe4s4_detail = {"error": str(exc)[:200] if not isinstance(exc, RuntimeError) else "skipped: " + str(exc)}
    _WD["detail"]["fe4s4_class_1e7_dets"] = fe4s4_detail

    wd_timer.cancel()
    out = {
        "metric": "davidson_solve_1e6_dets_wallclock",
        "value": round(elapsed, 4),
        "unit": "seconds",
        "vs_baseline": round(CPU_BASELINE_SECONDS / elapsed, 2),
        "detail": {
            "problem": "N2/6-31G CAS(16o,(5,5)e), 1000x1000 excitation strings",
            "dim": m * n,
            "norb": norb,
            "energy_total": energy + ecore,
            "energy_abs_error_vs_host_f64": energy_abs_err,
            "davidson_converged": converged,
            "davidson_iterations": iters,
            "residual_norm": rnorm,
            "integrals_seconds": round(t_chem, 3),
            "tunnel_session_establishment_seconds": round(t_session, 3),
            "host_table_compute_seconds": round(t_host_tables, 3),
            "table_build_seconds": round(t_build, 3),
            "baseline_assumption": f"{CPU_BASELINE_SECONDS}s on 64-core CPU (see docstring)",
            "device": str(jax.devices()[0]),
            "full_casci_1p9e7_dets_single_chip": casci_detail,
            "pauli_projection_device_resident": pauli_detail,
            "pauli_multiterm_88term_1e6": multiterm_detail,
            "heisenberg_66term_projection": heis_detail,
            "fe4s4_class_1e7_dets": fe4s4_detail,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
