# Probe: grouped multi-term Pauli projection vs the per-term loop, on chip.
#
# VERDICT r3 item 6: an 88-term operator at d >= 1e6 must not pay
# 0.83 s x T through per-term involution-pairing sorts.  The grouped build
# (ops/pauli_proj.build_projected_operator) resolves membership once per
# UNIQUE x-mask (22 for an L=22 Heisenberg ring, vs 66 non-diagonal terms)
# in chunk-batched sorts, and folds all 88 amplitudes into per-group weights
# in one scan program.  Target: >= 5x over the per-term loop.
#
# Run from /root/repo (no PYTHONPATH), serialized with all other TPU work:
#   timeout 1800 python probes/pauli_multiterm.py
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp  # noqa: E402

from sqd_tpu.models.heisenberg import heisenberg_ring  # noqa: E402
from sqd_tpu.ops.pauli_proj import (  # noqa: E402
    build_projected_operator,
    pauli_apply_flat,
    pauli_term_table,
)


def main(nq=22, d_target=1_000_000):
    op = heisenberg_ring(nq, j_xx=1.0, j_yy=1.0, j_zz=1.0, h_z=0.1)
    print(f"terms={len(op.coeffs)} nq={nq} d={d_target}", flush=True)
    rng = np.random.default_rng(5)
    ints = np.unique(rng.integers(0, 1 << nq, size=2 * d_target, dtype=np.int64))[:d_target]
    packed = np.zeros((len(ints), 1), dtype=np.uint32)
    packed[:, 0] = ints

    t0 = time.perf_counter()
    sp = jax.device_put(jnp.asarray(packed))
    _ = float(jnp.sum(sp[:8, 0].astype(jnp.float32)))
    print(f"session+transfer: {time.perf_counter() - t0:.1f}s", flush=True)

    def per_term():
        outs = []
        for p in op.paulis:
            col, sign, phase = pauli_term_table(sp, p)
            outs.append(col)
        return float(jnp.sum(outs[-1].astype(jnp.float32)))

    _ = per_term()  # compile
    t0 = time.perf_counter()
    _ = per_term()
    t_old = time.perf_counter() - t0

    def grouped():
        # sp (device-resident) keeps the comparison symmetric with per_term
        proj = build_projected_operator(sp, op.paulis, op.coeffs)
        _ = float(jnp.sum(proj.weight_re[:, :8]))
        return proj

    proj = grouped()  # compile
    t0 = time.perf_counter()
    proj = grouped()
    t_new = time.perf_counter() - t0
    print(
        f"per-term: {t_old:.3f}s  grouped: {t_new:.3f}s  "
        f"speedup {t_old / t_new:.1f}x  groups={proj.num_groups}",
        flush=True,
    )

    v = jnp.asarray(rng.normal(size=len(ints)))
    mv = jax.jit(pauli_apply_flat)
    _ = float(jnp.sum(mv(proj, v)))
    t0 = time.perf_counter()
    for _ in range(5):
        s = float(jnp.sum(mv(proj, v)))
    print(f"grouped matvec: {(time.perf_counter() - t0) / 5 * 1000:.1f} ms  (checksum {s:.6f})")


if __name__ == "__main__":
    main()
