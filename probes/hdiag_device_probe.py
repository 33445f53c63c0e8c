# Probe: device-side hdiag assembly at the 1.9e7-det CASCI shape (4368 x 4368
# f64).  The fori_loop version measured ~10 s (loop-carried 152 MB f64
# accumulator, 16 read+write round trips); this times the UNROLLED assembly
# in sqd_tpu.ops.hamiltonian._hdiag_device plus transfer of its operands,
# checked against the host f64 oracle.
# Run from /root/repo. One process at a time on the tunnel.
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from sqd_tpu.chem import Molecule, active_space_integrals, rhf
from sqd_tpu.ops import bitpack
from sqd_tpu.ops.dense_fci import all_hamming_strings
from sqd_tpu.ops.hamiltonian import _hdiag_device, _hdiag_np, _hdiag_parts_np, _occupancy_np

mol = Molecule([("N", (0.0, 0.0, 0.0)), ("N", (1.0, 0.0, 0.0))], basis="6-31g")
mf = rhf(mol)
h1, eri, ecore = active_space_integrals(mf, ncas=16, nelecas=10)
norb = 16
strs = all_hamming_strings(norb, 5)
pf = bitpack.pack_ints(strs, norb)
occ = _occupancy_np(pf, norb)
print("shape", occ.shape, flush=True)

t0 = time.perf_counter()
_ = float(jnp.sum(jnp.arange(8.0)))
print(f"session {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
a_part, b_part, w = _hdiag_parts_np(occ, occ, np.asarray(h1), np.asarray(eri))
t_host = time.perf_counter() - t0
print(f"host parts: {t_host*1e3:.1f} ms", flush=True)

t0 = time.perf_counter()
ops = jax.device_put({"a": a_part, "b": b_part, "occ": occ.astype(np.float64), "w": w})
jax.block_until_ready(ops)
print(f"operand transfer: {time.perf_counter()-t0*1:.2f}s", flush=True)

for run in range(3):
    t0 = time.perf_counter()
    hd = _hdiag_device(ops["a"], ops["b"], ops["occ"], ops["w"], out_dtype=jnp.float64)
    s = float(jnp.sum(hd[0]))  # scalar readback fence
    print(f"run {run}: {time.perf_counter()-t0:.3f}s (rowsum {s:.6f})", flush=True)

hd_host = _hdiag_np(occ, occ, np.asarray(h1), np.asarray(eri))
err = float(jnp.max(jnp.abs(hd - jnp.asarray(hd_host))))
print(f"max abs err vs host f64: {err:.2e}", flush=True)
