"""Stage-isolated [4Fe-4S]-class dense-DF solve: find the op that kills the worker.

Runs the fe4s4_class.py pipeline in instrumented stages with HBM readings
between each: table build -> densify -> single matvec -> chained matvecs ->
3-iteration Davidson -> full Davidson.  See probes/logs/fe4s4_stage*.log.
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import faulthandler; faulthandler.dump_traceback_later(900, repeat=True)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from sqd_tpu.ops import bitpack
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian
from sqd_tpu.ops.davidson import (
    davidson_ground_state,
    davidson_ground_state_segmented,
    davidson_initial_guess,
)

NORB, NELEC = 36, (27, 27)
M = N = 3163

def hbm(tag):
    try:
        s = jax.devices()[0].memory_stats()
        print(f"[hbm] {tag}: in_use={s.get('bytes_in_use', -1)/2**30:.2f} GiB "
              f"peak={s.get('peak_bytes_in_use', -1)/2**30:.2f} GiB", flush=True)
    except Exception as e:
        print(f"[hbm] {tag}: unavailable ({e})", flush=True)

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

sa = excitation_strings(M, 1)
pa = bitpack.pack_ints(sa, NORB)
_ = float(jnp.sum(jnp.zeros(8)))
hbm("session up")

t0 = time.perf_counter()
ham64 = build_sci_hamiltonian(pa, pa, h1, eri, NORB, NELEC, dtype=jnp.float64)
hd32 = ham64.hdiag.astype(jnp.float32).reshape(-1)
_ = float(jnp.sum(hd32))
print(f"[1] table build: {time.perf_counter()-t0:.2f} s", flush=True)
hbm("tables")

from sqd_tpu.ops.dense_df import densify, dense_df_matvec_flat
t0 = time.perf_counter()
op = densify(ham64, dtype=jnp.float32)
_ = float(jnp.sum(op.wa[0, 0]))
print(f"[2] densify {op.wa.shape} aliased={op.wb is op.wa}: "
      f"{time.perf_counter()-t0:.2f} s", flush=True)
hbm("densify")

mp, np_ = op.shape
c = jnp.asarray(np.random.default_rng(0).normal(size=mp * np_).astype(np.float32))
c = c / jnp.linalg.norm(c)
t0 = time.perf_counter()
s1 = dense_df_matvec_flat(op, c)
chk = float(jnp.vdot(c, s1))
print(f"[3] single matvec: {time.perf_counter()-t0:.2f} s  <c|Hc>={chk:.6f}", flush=True)
hbm("matvec1")

import functools
@functools.partial(jax.jit, static_argnums=2)
def chain(op, v, k):
    def body(i, v):
        w = dense_df_matvec_flat(op, v)
        return w / jnp.linalg.norm(w)
    return jax.lax.fori_loop(0, k, body, v)

t0 = time.perf_counter()
v5 = chain(op, c, 5)
print(f"[4] 5 chained matvecs: {time.perf_counter()-t0:.2f} s "
      f"norm={float(jnp.linalg.norm(v5)):.3f}", flush=True)
hbm("matvec5")

v0 = davidson_initial_guess(hd32, jnp.float32)
t0 = time.perf_counter()
r3 = davidson_ground_state(dense_df_matvec_flat, op, hd32, v0,
                           tol=1e-4, max_subspace=12, max_iterations=3)
print(f"[5] 3-iter davidson: {time.perf_counter()-t0:.2f} s "
      f"theta={float(r3.theta):.6f}", flush=True)
hbm("dav3")

t0 = time.perf_counter()
res = davidson_ground_state_segmented(dense_df_matvec_flat, op, hd32, v0,
                                      tol=1e-4, max_subspace=12,
                                      max_iterations=200)
print(f"[6] full davidson (segmented): {time.perf_counter()-t0:.2f} s "
      f"theta={float(res.theta):.9f} its={int(res.iterations)} "
      f"rn={float(res.residual_norm):.2e}", flush=True)
hbm("davfull")
print("OK", flush=True)
