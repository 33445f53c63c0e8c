"""Single cross-spin matvec at the (36o, 1e7-det) shape, explicit col_block.

Usage: python probes/fe4s4_matvec_only.py [col_block]
Isolates the TPU-worker crash seen in probes/fe4s4_class.py: table build
succeeds, the first Davidson call kills the worker.  This runs ONE matvec.
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from sqd_tpu.ops import bitpack
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian

CB = int(_sys.argv[1]) if len(_sys.argv) > 1 else 32
NORB, NELEC = 36, (27, 27)
M = N = 3163

rng = np.random.default_rng(7)
h1 = np.diag(np.linspace(-14.0, 4.0, NORB)) + 0.05 * rng.normal(size=(NORB, NORB))
h1 = (h1 + h1.T) / 2
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

pa = bitpack.pack_ints(excitation_strings(M, 1), NORB)
pb = bitpack.pack_ints(excitation_strings(N, 2), NORB)
_ = float(jnp.sum(jnp.zeros(8)))
print("session up", flush=True)
t0 = time.perf_counter()
ham = build_sci_hamiltonian(pa, pb, h1, eri, NORB, NELEC, dtype=jnp.float32,
                            col_block=CB)
print(f"build (cb={ham.col_block}): {time.perf_counter()-t0:.1f} s", flush=True)
mp, npd = ham.shape
c = jnp.ones((mp, npd), jnp.float32) / np.sqrt(mp * npd)
t0 = time.perf_counter()
s = ham.matvec(c)
chk = float(jnp.vdot(c.reshape(-1), s.reshape(-1)))
print(f"matvec+compile: {time.perf_counter()-t0:.1f} s  <c,Hc>={chk:.9f}", flush=True)
t0 = time.perf_counter()
s = ham.matvec(c); chk2 = float(jnp.vdot(c.reshape(-1), s.reshape(-1)))
print(f"matvec warm: {time.perf_counter()-t0:.3f} s  {chk2:.9f}", flush=True)
print("OK", flush=True)
