import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import sqd_tpu
from sqd_tpu.chem import Molecule, rhf, active_space_integrals
from sqd_tpu.ops import bitpack
from sqd_tpu.ops.dense_fci import all_hamming_strings
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian

# the full N2/6-31G CASCI problem from bench.py (19M determinants)
mol = Molecule([("N", (0.0, 0.0, 0.0)), ("N", (1.0, 0.0, 0.0))], basis="6-31g")
mf = rhf(mol)
h1, eri, ecore = active_space_integrals(mf, ncas=16, nelecas=10)
norb, nelec = 16, (5, 5)
strs = all_hamming_strings(norb, 5)
pf = bitpack.pack_ints(strs, norb)
ham = build_sci_hamiltonian(pf, pf, h1, eri, norb, nelec, dtype=jnp.float64).astype(jnp.float32)
mp, np_ = ham.shape
print("shapes", ham.shape, "col_block", ham.col_block, flush=True)
rng = np.random.default_rng(0)
c = jnp.asarray(rng.normal(size=(mp, np_)).astype(np.float32))
c = c / jnp.linalg.norm(c)

old = jax.jit(lambda c: ham._SCIHamiltonian__matvec_blocked_beta_first(c))
new = jax.jit(lambda c: ham._SCIHamiltonian__matvec_blocked_beta_first_rowmajor(c))

o1 = old(c)
o2 = new(c)
print("max abs diff old vs new:", float(jnp.max(jnp.abs(o1 - o2))), flush=True)
del o1, o2

def chain(f, reps=6):
    @jax.jit
    def run(c):
        def body(i, acc):
            return acc + jnp.sum(f(c + acc * 1e-30))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    float(run(c))
    t0 = time.perf_counter()
    s = float(run(c))
    return (time.perf_counter() - t0 - 0.027) / reps

t_new = chain(lambda c: ham._SCIHamiltonian__matvec_blocked_beta_first_rowmajor(c))
print(f"beta-first row-major:        {t_new*1e3:.1f} ms", flush=True)

# measured 2026-08-17 (session casci_probe6): unroll=2/4 identical to unroll=1
# (1115.7 / 1116.5 / 1115.6 ms) — XLA does not overlap unrolled block bodies.

# independent-block variant: emit stacked (nblk, m, cb) via lax.map instead
# of threading sigma through dynamic_update_slice (removes the serial carry)
# measured 2026-08-17: 1165.4 ms vs 1115.5 ms for the dus-threaded fori_loop
# (diff 5.2e-5, f32 accumulation order) — the carry is NOT the cost; together
# with the unroll no-op and the cb=640 sweep (1042.8 ms) this pins the 1.9e7
# matvec at its per-stage gather floor (~19 ms/block alpha pick, slice-count
# bound; see casci_stages2).  Do not re-try loop-structure variants.
def rowmajor_scan(c):
    dt = c.dtype
    m, n = c.shape
    npair = 256
    cb = ham.col_block
    nblk = n // cb
    ct = c.T
    sign_a_f = ham.sign_a.astype(dt)
    sign_b_f = ham.sign_b.astype(dt)
    nbr_val_a_f = ham.nbr_val_a.astype(dt)
    nbr_val_b_f = ham.nbr_val_b.astype(dt)
    eri_m2 = ham.eri_t.astype(dt).T
    n_a = 5
    ka2 = min(npair, n_a * (16 - n_a + 1))
    valid_a = ham.sign_a != 0
    order_a = jnp.argsort(~valid_a, axis=0, stable=True)[:ka2]
    ok_a = jnp.take_along_axis(valid_a, order_a, axis=0)
    src_sel = jnp.take_along_axis(ham.src_a.astype(jnp.int32), order_a, axis=0)
    flat_rows = (order_a.astype(jnp.int32) * m + src_sel).T
    sign_sel = jnp.where(ok_a, jnp.take_along_axis(sign_a_f, order_a, axis=0), 0).T

    i0 = jnp.int32(0)

    def block(i):
        src_b_blk = jax.lax.dynamic_slice(ham.src_b, (i0, i * cb), (npair, cb))
        sgn_b_blk = jax.lax.dynamic_slice(sign_b_f, (i0, i * cb), (npair, cb))
        db = ct[src_b_blk] * sgn_b_blk[:, :, None]
        g2 = jnp.matmul(eri_m2, db.reshape(npair, cb * m), preferred_element_type=dt).reshape(npair, cb, m)
        g2 = jnp.transpose(g2, (0, 2, 1))
        picked = jnp.take(g2.reshape(npair * m, cb), flat_rows.reshape(-1), axis=0)
        sig_blk = jnp.einsum("mk,mkc->mc", sign_sel, picked.reshape(m, ka2, cb))
        c_blk = jax.lax.dynamic_slice(c, (i0, i * cb), (m, cb))
        sig_blk = sig_blk + jnp.einsum("jl,jlc->jc", nbr_val_a_f, c_blk[ham.nbr_idx_a])
        idx_b_blk = jax.lax.dynamic_slice(ham.nbr_idx_b, (i * cb, i0), (cb, ham.nbr_idx_b.shape[1]))
        val_b_blk = jax.lax.dynamic_slice(nbr_val_b_f, (i * cb, i0), (cb, nbr_val_b_f.shape[1]))
        sig_blk = sig_blk + jnp.einsum("kl,klm->mk", val_b_blk, ct[idx_b_blk])
        return sig_blk

    with jax.default_matmul_precision("highest"):
        stacked = jax.lax.map(block, jnp.arange(nblk, dtype=jnp.int32))  # (nblk, m, cb)
    return jnp.transpose(stacked, (1, 0, 2)).reshape(m, n)

o = jax.jit(rowmajor_scan)(c)
print(f"scan variant diff: {float(jnp.max(jnp.abs(o - new(c)))):.2e}", flush=True)
del o
t_scan = chain(rowmajor_scan)
print(f"beta-first row-major lax.map-stacked: {t_scan*1e3:.1f} ms", flush=True)
