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

mol = Molecule([("N", (0.0, 0.0, 0.0)), ("N", (1.0, 0.0, 0.0))], basis="6-31g")
mf = rhf(mol)
h1, eri, ecore = active_space_integrals(mf, ncas=16, nelecas=10)
norb, nelec = 16, (5, 5)
strs = all_hamming_strings(norb, 5)
pf = bitpack.pack_ints(strs, norb)
ham = build_sci_hamiltonian(pf, pf, h1, eri, norb, nelec, dtype=jnp.float64).astype(jnp.float32)
mp, np_ = ham.shape
npair = 256
cb = ham.col_block
print("shapes", ham.shape, "cb", cb, flush=True)
rng = np.random.default_rng(0)
c = jnp.asarray(rng.normal(size=(mp, np_)).astype(np.float32))
ct = c.T
eri_m = ham.eri_t.T
src_b_blk = ham.src_b[:, :cb]
sgn_b_blk = ham.sign_b[:, :cb].astype(jnp.float32)
src_a32 = ham.src_a.astype(jnp.int32)
sign_a_f = ham.sign_a.astype(jnp.float32)

def chain(f, x, reps=10):
    @jax.jit
    def run(x):
        def body(i, acc):
            r = f(x + acc * 1e-30)
            return acc + r.ravel()[0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0 - 0.027) / reps

with jax.default_matmul_precision("highest"):
    t_db = chain(lambda ct: ct[src_b_blk] * sgn_b_blk[:, :, None], ct)
    print(f"stage db  (row gather + scale, 573MB out): {t_db*1e3:.1f} ms", flush=True)
    db = ct[src_b_blk] * sgn_b_blk[:, :, None]
    t_mm = chain(lambda db: jnp.matmul(eri_m, db.reshape(npair, cb*mp), preferred_element_type=jnp.float32).reshape(npair, cb, mp), db)
    print(f"stage g2  (matmul 256x256 @ 256x560k):     {t_mm*1e3:.1f} ms", flush=True)
    g2 = jnp.matmul(eri_m, db.reshape(npair, cb*mp), preferred_element_type=jnp.float32).reshape(npair, cb, mp)
    t_tr = chain(lambda g2: jnp.transpose(g2, (0, 2, 1)) + 0.0, g2)
    print(f"stage transpose (npair, cb, m)->(npair,m,cb): {t_tr*1e3:.1f} ms", flush=True)
    g2t = jnp.transpose(g2, (0, 2, 1))
    t_pick = chain(lambda g2t: jnp.take_along_axis(g2t, src_a32[:, :, None], axis=1), g2t)
    print(f"stage alpha pick (take_along axis=1):      {t_pick*1e3:.1f} ms", flush=True)
    picked = jnp.take_along_axis(g2t, src_a32[:, :, None], axis=1)
    t_sum = chain(lambda picked: jnp.sum(sign_a_f[:, :, None] * picked, axis=0), picked)
    print(f"stage weighted pair-sum:                   {t_sum*1e3:.1f} ms", flush=True)
    # alternative: column-gather db (the original orientation)
    t_db2 = chain(lambda c: jnp.take(c, src_b_blk, axis=1) * sgn_b_blk[None, :, :], c)
    print(f"stage db' (column gather orientation):     {t_db2*1e3:.1f} ms", flush=True)
    # alternative pair-sum via dot: sum_p sign*picked = einsum
    t_sum2 = chain(lambda picked: jnp.einsum("pmc,pm->mc", picked, sign_a_f), picked)
    print(f"stage pair-sum via einsum:                 {t_sum2*1e3:.1f} ms", flush=True)

    # variant: flatten to a single 2-D row gather (rows of 512B)
    rows_flat = (jnp.arange(npair, dtype=jnp.int32)[:, None] * mp + src_a32).reshape(-1)
    t_pick2 = chain(lambda g2t: jnp.take(g2t.reshape(npair * mp, cb), rows_flat, axis=0), g2t)
    print(f"stage alpha pick via flat row-take:        {t_pick2*1e3:.1f} ms", flush=True)
    # variant: fused pick+sum via flat take then segment reshape
    def pick_sum(g2t):
        picked = jnp.take(g2t.reshape(npair * mp, cb), rows_flat, axis=0).reshape(npair, mp, cb)
        return jnp.sum(sign_a_f[:, :, None] * picked, axis=0)
    t_ps = chain(pick_sum, g2t)
    print(f"stage flat pick + weighted sum:            {t_ps*1e3:.1f} ms", flush=True)
    # variant: pick on the pre-transpose layout (gather on last axis)
    t_pick3 = chain(lambda g2: jnp.take_along_axis(g2, src_a32[:, None, :], axis=2), g2)
    print(f"stage alpha pick on (npair,cb,m) axis=2:   {t_pick3*1e3:.1f} ms", flush=True)
