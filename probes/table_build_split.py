"""Itemize table_build_seconds: host compute vs tunnel transfer vs dispatch.

bench.py r3 reports table_build 7.2 s at 1e6 dets (host compute 0.164 s) and
8.5 s at 1.9e7 — this probe answers where the other ~7-8 s go:
  (a) per-call tunnel dispatch (~27 ms each x how many calls?)
  (b) device_put bandwidth over the tunnel (measure directly at 1-160 MB)
  (c) the hdiag (M, N) f64 transfer (8 MB at 1e6, 156 MB at 1.9e7)
  (d) astype(f32) device-side conversions
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from sqd_tpu.chem import Molecule, rhf, active_space_integrals
from sqd_tpu.ops import bitpack
from sqd_tpu import native as native_mod
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian, _occupancy_np, _hdiag_np

# fence out session establishment
t0 = time.perf_counter()
_ = float(jnp.sum(jnp.arange(8.0)))
print(f"session establishment: {time.perf_counter()-t0:.1f} s", flush=True)

# --- raw tunnel device_put bandwidth ---------------------------------------
for mb in (1, 8, 64, 156):
    a = np.random.default_rng(0).normal(size=(mb * 131072,)).astype(np.float64)
    x = jax.device_put(a); x.block_until_ready(); del x  # warm path
    t0 = time.perf_counter()
    x = jax.device_put(a); x.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"device_put {mb:4d} MB: {dt*1e3:8.1f} ms  ({mb/dt:.0f} MB/s)", flush=True)
    del x, a

# --- dispatch overhead: 20 tiny transfers ----------------------------------
small = [np.arange(100, dtype=np.float64) + i for i in range(20)]
t0 = time.perf_counter()
for s in small:
    jax.device_put(s).block_until_ready()
print(f"20 tiny device_puts: {(time.perf_counter()-t0)*1e3:.1f} ms total", flush=True)

# --- the bench 1e6 build, itemized ------------------------------------------
from bench import excitation_strings  # reuse the exact generator

mol = Molecule([("N", (0.0, 0.0, 0.0)), ("N", (1.0, 0.0, 0.0))], basis="6-31g")
mf = rhf(mol)
h1, eri, ecore = active_space_integrals(mf, ncas=16, nelecas=10)
norb, nelec = 16, (5, 5)
m = n = 1000
pa = bitpack.pack_ints(excitation_strings(m, norb, nelec[0], 1), norb)
pb = bitpack.pack_ints(excitation_strings(n, norb, nelec[1], 2), norb)
h1_np, eri_np = np.asarray(h1, np.float64), np.asarray(eri, np.float64)

t0 = time.perf_counter()
sa, ga = native_mod.gather_tables(pa, norb)
sb, gb = native_mod.gather_tables(pb, norb)
ia, va = native_mod.samespin_tables(pa, h1_np, eri_np, norb, nelec[0])
ib, vb = native_mod.samespin_tables(pb, h1_np, eri_np, norb, nelec[1])
occ_a = _occupancy_np(np.asarray(pa, np.uint32), norb)
occ_b = _occupancy_np(np.asarray(pb, np.uint32), norb)
hd = _hdiag_np(occ_a, occ_b, h1_np, eri_np)
t_host = time.perf_counter() - t0
print(f"host compute (tables + hdiag): {t_host*1e3:.1f} ms", flush=True)

parts = {"src_a": sa, "sign_a": ga, "src_b": sb, "sign_b": gb,
         "nbr_idx_a": ia, "nbr_val_a": va, "nbr_idx_b": ib, "nbr_val_b": vb,
         "hdiag": hd}
total = 0.0
for name, arr in parts.items():
    t0 = time.perf_counter()
    x = jnp.asarray(arr); x.block_until_ready()
    dt = time.perf_counter() - t0
    total += dt
    print(f"  transfer {name:10s} {arr.nbytes/1e6:7.2f} MB dtype={arr.dtype}: {dt*1e3:7.1f} ms", flush=True)
    del x
print(f"sum of itemized transfers: {total*1e3:.1f} ms", flush=True)

# full build_sci_hamiltonian as bench does it (f64 then astype f32)
t0 = time.perf_counter()
ham64 = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, dtype=jnp.float64)
ham32 = ham64.astype(jnp.float32)
_ = float(jnp.sum(ham32.nbr_val_a)) + float(jnp.sum(ham32.hdiag.reshape(-1)))
print(f"build_sci_hamiltonian + astype + sync: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

# astype alone, second time (cached compile)
t0 = time.perf_counter()
h2 = ham64.astype(jnp.float32)
jax.block_until_ready(h2.hdiag)
print(f"astype(f32) alone (warm): {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
del h2, ham32, ham64

# --- candidate cures ---------------------------------------------------------
# (1) one device_put of the whole pytree (does the tunnel batch the RPCs?)
t0 = time.perf_counter()
tree = jax.device_put(parts)
jax.block_until_ready(tree)
print(f"device_put(whole dict): {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
del tree

# (2) single concatenated byte buffer + device-side unbundle
metas = [(k, v.shape, v.dtype, v.nbytes) for k, v in parts.items()]
t0 = time.perf_counter()
blob = np.concatenate([np.ascontiguousarray(v).view(np.uint8).ravel() for v in parts.values()])
t_pack = time.perf_counter() - t0

@jax.jit
def unbundle(b):
    out, off = {}, 0
    for k, shape, dt, nb in metas:
        seg = jax.lax.dynamic_slice(b, (off,), (nb,))
        out[k] = jax.lax.bitcast_convert_type(
            seg.reshape(-1, np.dtype(dt).itemsize), jnp.dtype(dt)
        ).reshape(shape)
        off += nb
    return out

t0 = time.perf_counter()
bd = jax.device_put(blob)
tree2 = unbundle(bd)
jax.block_until_ready(tree2)
t_unb = time.perf_counter() - t0
print(f"host pack {t_pack*1e3:.1f} ms; blob put+unbundle ({blob.nbytes/1e6:.1f} MB): {t_unb*1e3:.1f} ms", flush=True)
for k in parts:
    same = bool(jnp.all(tree2[k] == jnp.asarray(parts[k])))
    if not same:
        print(f"  MISMATCH in {k}!", flush=True)
print("unbundle verified", flush=True)

# (3) device-side hdiag: transfer only O((M+N)*norb), compute exactly on chip
#     via elementwise-f64 accumulation (norb steps), never moving (M,N) f64.
hdm = np.diagonal(h1_np)
jm = np.einsum("ppqq->pq", eri_np)
km = np.einsum("pqqp->pq", eri_np)
jk = jm - km
a_part = occ_a @ hdm + 0.5 * np.einsum("ip,pq,iq->i", occ_a, jk, occ_a)
b_part = occ_b @ hdm + 0.5 * np.einsum("ip,pq,iq->i", occ_b, jk, occ_b)
w = occ_b @ jm.T  # (N, norb) f64, exact on host

@jax.jit
def hdiag_device(a_part, b_part, occ_a, w):
    acc = a_part[:, None] + b_part[None, :]
    for p in range(norb):  # elementwise f64 is software-exact on TPU
        acc = acc + occ_a[:, p][:, None] * w[:, p][None, :]
    return acc

t0 = time.perf_counter()
hd_dev = hdiag_device(jnp.asarray(a_part), jnp.asarray(b_part),
                      jnp.asarray(occ_a), jnp.asarray(w))
hd_dev.block_until_ready()
t_hd = time.perf_counter() - t0
err = float(jnp.max(jnp.abs(hd_dev - jnp.asarray(hd))))
print(f"device-side hdiag: {t_hd*1e3:.1f} ms, max abs err vs host f64: {err:.2e}", flush=True)
