# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Headline benchmark: Davidson ground-state solve at a 10^6-determinant subspace.

Matches BASELINE.json's metric ("Davidson solve wall-clock at 10^6-det
subspace").  The problem is a 16-orbital, (5,5)-electron selected-CI space
with 1000 alpha x 1000 beta strings (dim = 10^6) over synthetic molecular-like
integrals (the N2/6-31g problem class).  The solve runs the production
path: f32 Davidson iterations + f64 Rayleigh refinement of the energy.

``vs_baseline``: the reference delegates this solve to PySCF's OpenMP
selected-CI kernels; its README claims ~10^7-dim problems are tractable on
10-30 CPU cores (README.md:78) with no published wall-clock.  We use a
conservative 60 s estimate for a 64-core node at 10^6 determinants
(~40 Davidson iterations x ~1.5 s/contract_2e) as the baseline;
``vs_baseline`` is the speedup factor over that estimate.
"""

import json
import time

import numpy as np

CPU_BASELINE_SECONDS = 60.0
_T_START = time.perf_counter()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    
    from sqd_tpu.ops import bitpack
    from sqd_tpu.ops.davidson import davidson_ground_state, davidson_initial_guess
    from sqd_tpu.ops.hamiltonian import (
        build_sci_hamiltonian,
        expectation_value,
        sci_matvec_flat,
    )

    norb, nelec = 16, (5, 5)
    m = n = 1000
    rng = np.random.default_rng(0)
    # Molecular-like synthetic integrals (the N2/6-31g problem class of
    # BASELINE config 1): spread one-body spectrum + low-rank Cholesky-form
    # two-body integrals (positive semidefinite, 8-fold symmetric).
    orb_e = np.linspace(-12.0, 3.0, norb)
    h1 = np.diag(orb_e) + 0.08 * rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2
    rank = 3 * norb
    chol = rng.normal(size=(rank, norb, norb)) * (0.8 / np.sqrt(rank))
    chol = (chol + chol.transpose(0, 2, 1)) / 2
    eri = np.einsum("xpq,xrs->pqrs", chol, chol)

    # SQD-realistic subspace: the Hartree-Fock determinant plus low-order
    # excitations (what sampled configurations cluster around), giving a
    # well-connected selected space.
    def excitation_strings(count, seed):
        r = np.random.default_rng(seed)
        hf = (1 << nelec[0]) - 1
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

    strs_a = excitation_strings(m, 1)
    strs_b = excitation_strings(n, 2)
    pa = bitpack.pack_ints(strs_a, norb)
    pb = bitpack.pack_ints(strs_b, norb)

    t_build0 = time.perf_counter()
    ham64 = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, dtype=jnp.float64)
    ham32 = ham64.astype(jnp.float32)
    hd32 = ham32.hdiag.reshape(-1)
    # force completion of the table build
    _ = float(jnp.sum(ham32.nbr_val_a)) + float(jnp.sum(hd32))
    t_build = time.perf_counter() - t_build0

    def solve():
        v0 = davidson_initial_guess(hd32, jnp.float32)
        res = davidson_ground_state(
            sci_matvec_flat, ham32, hd32, v0, tol=1e-3, max_subspace=24, max_iterations=200
        )
        # chunk-accumulated f64 energy: a plain "f64" matvec+vdot on TPU is
        # both ~12x slower AND only ~1e-5-accurate (f32-grade MXU
        # accumulation); this path is ~1e-9 vs host-f64 ground truth.
        energy = expectation_value(ham64, res.vector)
        return float(energy), int(res.iterations), float(res.residual_norm)

    # warm-up (compile)
    energy, iters, rnorm = solve()
    t0 = time.perf_counter()
    energy, iters, rnorm = solve()
    elapsed = time.perf_counter() - t0

    # --- secondary metric: Pauli projection (reference headline) -----------
    # Reference: one Z^40 term over d = 5e7 sorted unique bitstrings takes
    # ~4.17 s on its CPU host (docs/guides/benchmark_pauli_projection.ipynb).
    # Guarded so a failure/timeout here never loses the main metric line.
    pauli_detail = None
    try:
        from sqd_tpu.ops.pauli_proj import connected_table_rank, pauli_masks_to_packed
        from sqd_tpu.primitives import Pauli

        nq, d_proj = 40, 50_000_000
        rng2 = np.random.default_rng(3)
        ints = np.sort(rng2.integers(0, 1 << nq, size=d_proj, dtype=np.int64))
        ints = ints[np.concatenate(([True], ints[1:] != ints[:-1]))]  # fast unique
        packed = np.zeros((len(ints), 2), dtype=np.uint32)
        packed[:, 0] = ints & 0xFFFFFFFF
        packed[:, 1] = ints >> 32
        packed_d = jnp.asarray(packed)
        pz = Pauli.from_label("Z" * nq)
        zw, xw = pauli_masks_to_packed(pz.z, pz.x)
        zw_d, xw_d = jnp.asarray(zw), jnp.asarray(xw)
        col, sign = connected_table_rank(packed_d, zw_d, xw_d)  # warm-up/compile
        _ = int(jnp.sum(sign.astype(jnp.int32)))
        t0 = time.perf_counter()
        col, sign = connected_table_rank(packed_d, zw_d, xw_d)
        checksum = int(jnp.sum(sign.astype(jnp.int32)))
        t_pauli = time.perf_counter() - t0
        pauli_detail = {
            "dim": int(len(ints)),
            "seconds": round(t_pauli, 4),
            "reference_cpu_seconds": 4.17,
            "speedup_vs_reference": round(4.17 / t_pauli, 1),
            "checksum": checksum,
        }
    except Exception as exc:  # pragma: no cover - defensive
        pauli_detail = {"error": str(exc)[:200]}

    # --- stretch metric: 1e7 determinants on ONE chip -----------------------
    # The reference's stated capability envelope is ~1e7 dims on a 10-30 core
    # node (README.md:78).  The beta-first blocked matvec needs no full-size
    # intermediate, so the same solve fits a single v5e chip.
    stretch_detail = None
    try:
        if time.perf_counter() - _T_START < 420:
            m7 = n7 = 3163  # dim ~ 1.0e7
            strs_a7 = excitation_strings(m7, 5)
            strs_b7 = excitation_strings(n7, 6)
            pa7 = bitpack.pack_ints(strs_a7, norb)
            pb7 = bitpack.pack_ints(strs_b7, norb)
            ham64_7 = build_sci_hamiltonian(pa7, pb7, h1, eri, norb, nelec, dtype=jnp.float64)
            ham32_7 = ham64_7.astype(jnp.float32)
            hd7 = ham32_7.hdiag.reshape(-1)

            def solve7():
                v0 = davidson_initial_guess(hd7, jnp.float32)
                res = davidson_ground_state(
                    sci_matvec_flat, ham32_7, hd7, v0,
                    tol=1e-3, max_subspace=24, max_iterations=200,
                )
                return (
                    float(expectation_value(ham64_7, res.vector)),
                    int(res.iterations),
                    float(res.residual_norm),
                )

            e7, it7, rn7 = solve7()  # warm-up/compile
            t0 = time.perf_counter()
            e7, it7, rn7 = solve7()
            t7 = time.perf_counter() - t0
            stretch_detail = {
                "dim": m7 * n7,
                "seconds": round(t7, 4),
                "iterations": it7,
                "residual_norm": rn7,
                "energy": e7,
            }
        else:
            stretch_detail = {"skipped": "time budget"}
    except Exception as exc:  # pragma: no cover - defensive
        stretch_detail = {"error": str(exc)[:200]}

    out = {
        "metric": "davidson_solve_1e6_dets_wallclock",
        "value": round(elapsed, 4),
        "unit": "seconds",
        "vs_baseline": round(CPU_BASELINE_SECONDS / elapsed, 2),
        "detail": {
            "dim": m * n,
            "norb": norb,
            "energy": energy,
            "davidson_iterations": iters,
            "residual_norm": rnorm,
            "table_build_seconds": round(t_build, 3),
            "baseline_assumption": f"{CPU_BASELINE_SECONDS}s on 64-core CPU (see docstring)",
            "device": str(jax.devices()[0]),
            "note": (
                "table_build includes tunneled-TPU session/sync latency; the "
                "native host table computation itself is <1s"
            ),
            "pauli_projection_40q": pauli_detail,
            "davidson_1e7_dets_single_chip": stretch_detail,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
