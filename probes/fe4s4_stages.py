"""Stage split of the (36o, 1e7-det) build + matvec on the real chip.

Where do the 223 s build and the 52 s warm matvec (probes/fe4s4_matvec_only)
go at npair = 1296, m = n = 3168, cb = 32?  Times each host build stage,
the transfer, and each device matvec stage (chained inside one jit to defeat
the ~27 ms tunnel dispatch floor), plus a pivoted-Cholesky factorized
variant of the pair-pair matmul (the eri here is rank 108 by construction;
real ERIs factor at ~6-10x norb).
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from sqd_tpu import native
from sqd_tpu.ops import bitpack
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian, _hdiag_parts_np, _occupancy_np

NORB, NELEC = 36, (27, 27)
M = N = 3163
CB = 32

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

# ---- host build stages ------------------------------------------------------
t0 = time.perf_counter()
src_a_h, sign_a_h = native.gather_tables(pa, NORB)
print(f"host gather_tables (one spin): {time.perf_counter()-t0:.2f} s", flush=True)
t0 = time.perf_counter()
ia, va = native.samespin_tables(pa, h1, eri, NORB, NELEC[0])
print(f"host samespin_tables (one spin): {time.perf_counter()-t0:.2f} s  "
      f"width={ia.shape[1]}", flush=True)
t0 = time.perf_counter()
occ_a_h = _occupancy_np(np.asarray(pa, np.uint32), NORB)
occ_b_h = _occupancy_np(np.asarray(pb, np.uint32), NORB)
a_part, b_part, w_h = _hdiag_parts_np(occ_a_h, occ_b_h, h1, eri)
print(f"host hdiag parts: {time.perf_counter()-t0:.2f} s", flush=True)

_ = float(jnp.sum(jnp.zeros(8)))
print("session up", flush=True)
t0 = time.perf_counter()
ham = build_sci_hamiltonian(pa, pb, h1, eri, NORB, NELEC, dtype=jnp.float32,
                            col_block=CB)
hd = ham.hdiag
_ = float(jnp.sum(hd))
print(f"full f32 build (cb={ham.col_block}): {time.perf_counter()-t0:.2f} s  "
      f"La={ham.nbr_idx_a.shape[1]} Lb={ham.nbr_idx_b.shape[1]}", flush=True)

mp, npd = ham.shape
npair = NORB * NORB
c = jnp.ones((mp, npd), jnp.float32) / np.sqrt(mp * npd)
ct = c.T
eri_m = ham.eri_t.T.astype(jnp.float32)
src_b_blk = ham.src_b[:, :CB]
sgn_b_blk = ham.sign_b[:, :CB].astype(jnp.float32)
sign_a_f = ham.sign_a.astype(jnp.float32)
nbr_val_a_f = ham.nbr_val_a.astype(jnp.float32)
nbr_val_b_f = ham.nbr_val_b.astype(jnp.float32)
idx_b_blk = ham.nbr_idx_b[:CB]
val_b_blk = nbr_val_b_f[:CB]
c_blk = c[:, :CB]

# compacted alpha pick metadata (as in __matvec_blocked_beta_first_rowmajor)
n_a = int(NELEC[0])
ka = min(npair, n_a * (NORB - n_a + 1))
valid_a = ham.sign_a != 0
order_a = jnp.argsort(~valid_a, axis=0, stable=True)[:ka]
ok_a = jnp.take_along_axis(valid_a, order_a, axis=0)
src_sel = jnp.take_along_axis(ham.src_a.astype(jnp.int32), order_a, axis=0)
flat_rows = (order_a.astype(jnp.int32) * mp + src_sel).T
sign_sel = jnp.where(ok_a, jnp.take_along_axis(sign_a_f, order_a, axis=0), 0).T

# host pivoted Cholesky of the pair matrix (exact at this eri's rank)
t0 = time.perf_counter()
V = np.asarray(ham.eri_t.T, np.float64).copy()  # [pq, rs]
diag = np.diag(V).copy()
order, Ls = [], []
for _i in range(npair):
    p = int(np.argmax(diag))
    if diag[p] <= 1e-10 * max(1.0, float(diag.max())):
        break
    l = V[:, p].copy()
    for lprev in Ls:
        l -= lprev * lprev[p]
    l /= np.sqrt(l[p])
    Ls.append(l)
    diag -= l * l
    diag[p] = 0.0
L_h = np.stack(Ls)  # (X, npair)
X = L_h.shape[0]
err = np.abs(L_h.T @ L_h - np.asarray(ham.eri_t.T, np.float64)).max()
print(f"host pivoted Cholesky: rank {X}, |LL^T - V|max = {err:.2e}, "
      f"{time.perf_counter()-t0:.2f} s", flush=True)
L = jnp.asarray(L_h, jnp.float32)

def stage(name, f, *args, reps=4):
    jf = jax.jit(f)
    out = jf(*args)
    _ = float(out[(0,) * out.ndim])  # compile + first exec
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jf(*args)
        _ = float(out[(0,) * out.ndim])
    t = (time.perf_counter() - t0) / reps - 2 * 0.027  # 2 dispatches/iter
    print(f"{name:16s}: {t*1e3:8.1f} ms/blk  x{nblk} = {t*nblk:6.2f} s", flush=True)
    return out

nblk = npd // CB
print(f"shapes ({mp}, {npd}) cb {CB} nblk {nblk} ka {ka}", flush=True)
with jax.default_matmul_precision("highest"):
    db = stage("db gather+scale", lambda ct: ct[src_b_blk] * sgn_b_blk[:, :, None], ct)
    g2f = stage(
        "pair matmul",
        lambda db: jnp.matmul(eri_m, db.reshape(npair, CB * mp),
                              preferred_element_type=jnp.float32),
        db,
    )
    def chol_mm(db):
        tt = jnp.matmul(L, db.reshape(npair, CB * mp), preferred_element_type=jnp.float32)
        return jnp.matmul(L.T, tt, preferred_element_type=jnp.float32)
    stage(f"chol matmul X={X}", chol_mm, db)
    g2 = g2f.reshape(npair, CB, mp)
    g2t = stage("transpose", lambda g2: jnp.transpose(g2, (0, 2, 1)) + 0.0, g2)
    def pick_sum(g2t):
        picked = jnp.take(g2t.reshape(npair * mp, CB), flat_rows.reshape(-1), axis=0)
        return jnp.einsum("mk,mkc->mc", sign_sel, picked.reshape(mp, ka, CB))
    stage("alpha pick+sum", pick_sum, g2t)
    stage(
        "same-spin alpha",
        lambda c_blk: jnp.einsum("jl,jlc->jc", nbr_val_a_f, c_blk[ham.nbr_idx_a]),
        c_blk,
    )
    stage("same-spin beta", lambda ct: jnp.einsum("kl,klm->mk", val_b_blk, ct[idx_b_blk]), ct)
print("OK", flush=True)
