"""[4Fe-4S]-class scale on one chip: (54e, 36o), ~1e7-determinant solve.

BASELINE.md config 5 envelope with synthetic integrals (no Fe basis data in
this image; the point is the SHAPE: 36 orbitals = two packed words per
string, 27-electron strings, 10^7 determinants).  Measures table build and
Davidson solve wall-clock on the real TPU, checks the f64-evaluated energy
against the Davidson eigenvalue and the variational bound vs a smaller
subspace.
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import faulthandler; faulthandler.dump_traceback_later(600, repeat=True)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from sqd_tpu.ops import bitpack
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian, expectation_value, sci_matvec_flat
from sqd_tpu.ops.davidson import (
    davidson_ground_state,
    davidson_ground_state_segmented,
    davidson_initial_guess,
)

NORB, NELEC = 36, (27, 27)
M = N = 3163  # ~1.0e7 determinants

rng = np.random.default_rng(7)
orb_e = np.linspace(-14.0, 4.0, NORB)
h1 = np.diag(orb_e) + 0.05 * rng.normal(size=(NORB, NORB)); h1 = (h1 + h1.T) / 2
chol = rng.normal(size=(3 * NORB, NORB, NORB)) * (0.5 / np.sqrt(3 * NORB))
chol = (chol + chol.transpose(0, 2, 1)) / 2
eri = np.einsum("xpq,xrs->pqrs", chol, chol)

def excitation_strings(count, seed):
    r = np.random.default_rng(seed)
    hf = (1 << NELEC[0]) - 1
    seen = {hf}; frontier = [hf]
    while len(seen) < count:
        base = frontier[r.integers(len(frontier))] if frontier else hf
        occ = [p for p in range(NORB) if (base >> p) & 1]
        virt = [p for p in range(NORB) if not (base >> p) & 1]
        new = base ^ (1 << occ[r.integers(len(occ))]) ^ (1 << virt[r.integers(len(virt))])
        if new not in seen:
            seen.add(new); frontier.append(new)
            if len(frontier) > 64: frontier.pop(0)
    return np.array(sorted(seen), dtype=np.int64)

t0 = time.perf_counter()
# same alpha/beta string set (the physical S_z = 0 sector) — lets the
# dense-DF path alias Wb == Wa, halving its dominant HBM cost
sa = excitation_strings(M, 1); sb = sa
pa = bitpack.pack_ints(sa, NORB); pb = pa
assert pa.shape[1] == 2, pa.shape  # multiword: 36 bits -> 2 uint32 words
print(f"strings+pack: {time.perf_counter()-t0:.1f} s", flush=True)

_ = float(jnp.sum(jnp.zeros(8)))  # fence session establishment
t0 = time.perf_counter()
ham64 = build_sci_hamiltonian(pa, pb, h1, eri, NORB, NELEC, dtype=jnp.float64)
ham32 = ham64.astype(jnp.float32)
hd32 = ham32.hdiag.reshape(-1)
_ = float(jnp.sum(hd32))
t_build = time.perf_counter() - t0
chol_rank = None if ham32.eri_chol is None else ham32.eri_chol.shape[0]
print(f"table build (36o, {M}x{N}): {t_build:.2f} s  cb={ham32.col_block} "
      f"eri_chol rank={chol_rank}", flush=True)

USE_DENSE = ham32.eri_chol is not None and "--gather" not in _sys.argv
if USE_DENSE:
    from sqd_tpu.ops.dense_df import densify, dense_df_matvec_flat
    t0 = time.perf_counter()
    op = densify(ham64, dtype=jnp.float32)
    _ = float(jnp.sum(op.wa[0, 0]))
    print(f"densify (wa/wb {op.wa.shape}+{op.wb.shape}): "
          f"{time.perf_counter()-t0:.2f} s", flush=True)

def dav():
    v0 = davidson_initial_guess(hd32, jnp.float32)
    # max_subspace 12-16: the (1e7, k) f32 Krylov workspaces are ~650 MB
    # each, plus the aliased dense-DF W stack (~4.4 GB) — well under the
    # 15.75 GB v5e limit.  SEGMENTED: one long XLA program (>~2 min) crashes
    # the tunneled worker; 25-iteration segments are safe (fe4s4_stage.py).
    if USE_DENSE:
        return davidson_ground_state_segmented(
            dense_df_matvec_flat, op, hd32, v0,
            tol=1e-4, max_subspace=12, max_iterations=200)
    return davidson_ground_state_segmented(
        sci_matvec_flat, ham32, hd32, v0,
        tol=1e-4, max_subspace=16, max_iterations=200)

res = dav(); _ = float(res.theta)   # compile
t0 = time.perf_counter(); res = dav(); theta = float(res.theta)
t_solve = time.perf_counter() - t0
e64 = float(expectation_value(ham64, res.vector))
print(f"solve 1.0e7 dets: {t_solve:.2f} s, {int(res.iterations)} its, "
      f"residual {float(res.residual_norm):.2e}", flush=True)
print(f"theta(f32)={theta:.9f}  E(f64 eval)={e64:.9f}  |diff|={abs(e64-theta):.2e}", flush=True)
assert abs(e64 - theta) < 5e-3

# variational bound: a subspace strictly inside the big one lies above
small = (np.sort(rng.choice(sa, size=400, replace=False)),
         np.sort(rng.choice(sb, size=400, replace=False)))
psa = bitpack.pack_ints(small[0], NORB); psb = bitpack.pack_ints(small[1], NORB)
h_s64 = build_sci_hamiltonian(psa, psb, h1, eri, NORB, NELEC, dtype=jnp.float64)
h_s32 = h_s64.astype(jnp.float32); hds = h_s32.hdiag.reshape(-1)
v0 = davidson_initial_guess(hds, jnp.float32)
rs = davidson_ground_state(sci_matvec_flat, h_s32, hds, v0, tol=1e-5,
                           max_subspace=24, max_iterations=200)
e_small = float(expectation_value(h_s64, rs.vector))
print(f"sub-subspace (400x400) energy {e_small:.9f} >= big {e64:.9f}: "
      f"{e_small >= e64 - 1e-6}", flush=True)
assert e_small >= e64 - 1e-6
print("OK", flush=True)
