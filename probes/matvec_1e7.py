"""1e7-determinant matvec: row-tiled alpha-first vs beta-first on the chip."""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
import jax.numpy as jnp
import sqd_tpu
from sqd_tpu.ops import bitpack
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian

norb, nelec = 16, (5, 5)
m7 = n7 = 3163
rng = np.random.default_rng(0)
orb_e = np.linspace(-12.0, 3.0, norb)
h1 = np.diag(orb_e) + 0.08 * rng.normal(size=(norb, norb)); h1 = (h1 + h1.T)/2
chol = rng.normal(size=(3*norb, norb, norb)) * (0.8/np.sqrt(3*norb)); chol = (chol + chol.transpose(0,2,1))/2
eri = np.einsum("xpq,xrs->pqrs", chol, chol)
def excitation_strings(count, seed):
    r = np.random.default_rng(seed); hf = (1 << nelec[0]) - 1
    seen = {hf}; frontier=[hf]
    while len(seen) < count:
        base = frontier[r.integers(len(frontier))] if frontier else hf
        occ=[p for p in range(norb) if (base>>p)&1]; virt=[p for p in range(norb) if not (base>>p)&1]
        new = base ^ (1<<occ[r.integers(len(occ))]) ^ (1<<virt[r.integers(len(virt))])
        if new not in seen:
            seen.add(new); frontier.append(new)
            if len(frontier)>64: frontier.pop(0)
    return np.array(sorted(seen), dtype=np.int64)
pa = bitpack.pack_ints(excitation_strings(m7, 5), norb)
pb = bitpack.pack_ints(excitation_strings(n7, 6), norb)
ham = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, dtype=jnp.float64).astype(jnp.float32)
mp, np_ = ham.shape
print("shape", ham.shape, "col_block", ham.col_block, flush=True)
c = jnp.asarray(rng.normal(size=(mp, np_)), jnp.float32)
c = c / jnp.linalg.norm(c)

def chain(f, reps=5):
    @jax.jit
    def run(c):
        def body(i, acc):
            return acc + jnp.sum(f(c + acc * 1e-30))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    s = float(run(c))
    t0 = time.perf_counter()
    s = float(run(c))
    return (time.perf_counter() - t0 - 0.027) / reps, s

t_rf, s_rf = chain(lambda c: ham._SCIHamiltonian__matvec_blocked_row_first(c))
print(f"row-first:  {t_rf*1e3:.0f} ms  checksum {s_rf:.6f}", flush=True)
t_bf, s_bf = chain(lambda c: ham._SCIHamiltonian__matvec_blocked_beta_first(c))
print(f"beta-first: {t_bf*1e3:.0f} ms  checksum {s_bf:.6f}", flush=True)
print(f"speedup {t_bf/t_rf:.2f}x", flush=True)
