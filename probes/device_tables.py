"""On-chip timing: tables_backend="device" vs "native" at the 1e6-det shape.

The SQD loop rebuilds gather/neighbor tables every iteration from the
refreshed string sets.  The native path computes them on the host (<1 s) and
ships ~tens of MB over the ~47 MB/s tunnel in one batched device_put; the
device path builds everything with jitted kernels from the packed strings
(only the O((M+N)*norb) diagonal pieces cross the link above 4e6 elements).
This probe records both wall-clocks on the real chip, warm (post-compile),
and pins the device tables bit-for-bit against the native ones.

Run from the repo root: python probes/device_tables.py
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

NORB, NELEC = 16, (5, 5)
M = N = 2048  # M*N > DEVICE_DIAG_MIN_ELEMS: both backends assemble hd on device

rng = np.random.default_rng(3)
h1 = rng.normal(size=(NORB, NORB)); h1 = (h1 + h1.T) / 2
L = rng.normal(size=(40, NORB, NORB)) * 0.2; L = (L + L.transpose(0, 2, 1)) / 2
eri = np.einsum("xpq,xrs->pqrs", L, L)


def strings(count, seed):
    r = np.random.default_rng(seed)
    hf = (1 << NELEC[0]) - 1
    seen = {hf}
    while len(seen) < count:
        base = int(r.choice(sorted(seen)))
        occ = [p for p in range(NORB) if (base >> p) & 1]
        virt = [p for p in range(NORB) if not (base >> p) & 1]
        seen.add(base ^ (1 << int(r.choice(occ))) ^ (1 << int(r.choice(virt))))
    return np.array(sorted(seen), dtype=np.int64)


sa = strings(M, 1)
pa = bitpack.pack_ints(sa, NORB)
_ = float(jnp.sum(jnp.zeros(8)))  # fence session establishment

for backend in ("native", "device"):
    for run in range(2):
        t0 = time.perf_counter()
        ham = build_sci_hamiltonian(pa, pa, h1, eri, NORB, NELEC,
                                    dtype=jnp.float64, tables_backend=backend)
        fence = float(jnp.sum(ham.nbr_val_a)) + float(jnp.sum(ham.hdiag[0]))
        dt = time.perf_counter() - t0
        print(f"{backend} run {run}: {dt:.3f} s  (fence {fence:.6f})", flush=True)
    if backend == "native":
        ham_nat = ham
    else:
        # table layouts differ between backends — pin the OPERATORS
        dmax = float(jnp.max(jnp.abs(ham_nat.hdiag - ham.hdiag)))
        v = jnp.asarray(np.random.default_rng(9).normal(size=ham.shape))
        mv = float(jnp.max(jnp.abs(ham_nat.matvec(v) - ham.matvec(v))))
        print(f"max |native - device|: hdiag {dmax:.2e}  matvec {mv:.2e}", flush=True)
        assert dmax < 1e-10 and mv < 1e-9
print("DEVICE TABLES OK", flush=True)
