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

# does unrolling the block loop let XLA overlap independent blocks?
import sqd_tpu.ops.hamiltonian as H
for u in (2, 4):
    H.BETA_FIRST_UNROLL = u
    f = jax.jit(lambda c: ham._SCIHamiltonian__matvec_blocked_beta_first_rowmajor(c))
    o = f(c)
    print(f"unroll={u}: diff {float(jnp.max(jnp.abs(o - new(c)))):.2e}", flush=True)
    del o
    t_u = chain(lambda c: ham._SCIHamiltonian__matvec_blocked_beta_first_rowmajor(c))
    print(f"beta-first row-major unroll={u}: {t_u*1e3:.1f} ms", flush=True)
H.BETA_FIRST_UNROLL = 1
