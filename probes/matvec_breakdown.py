import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
import jax.numpy as jnp
import sqd_tpu
from sqd_tpu.ops import bitpack
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian

norb, nelec = 16, (5, 5)
m = n = 1000
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
pa = bitpack.pack_ints(excitation_strings(m,1), norb)
pb = bitpack.pack_ints(excitation_strings(n,2), norb)
ham = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, dtype=jnp.float64).astype(jnp.float32)
mp, np_ = ham.shape
c = jnp.asarray(rng.normal(size=(mp, np_)), jnp.float32)
print("shapes", ham.shape, "La", ham.nbr_idx_a.shape[1], "Lb", ham.nbr_idx_b.shape[1], flush=True)

def chain(f, reps=50):
    @jax.jit
    def run(c):
        def body(i, acc):
            return acc + jnp.sum(f(c + acc * 1e-30))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    float(run(c))
    t0 = time.perf_counter()
    s = float(run(c))
    return (time.perf_counter() - t0 - 0.027) / reps

t_a = chain(lambda c: ham.apply_samespin_alpha(c))
print(f"samespin alpha (row gathers): {t_a*1e3:.2f} ms", flush=True)
t_b = chain(lambda c: ham.apply_samespin_beta(c))
print(f"samespin beta (col gathers):  {t_b*1e3:.2f} ms", flush=True)

def beta_transposed(c):
    ct = c.T
    picked = ct[ham.nbr_idx_b]  # (N, Lb, M) row gathers
    with jax.default_matmul_precision("highest"):
        out = jnp.einsum("kl,klm->km", ham.nbr_val_b, picked)
    return out.T

t_bt = chain(beta_transposed)
print(f"samespin beta (transposed row gathers): {t_bt*1e3:.2f} ms", flush=True)
# correctness
d = float(jnp.max(jnp.abs(beta_transposed(c) - ham.apply_samespin_beta(c))))
print("beta transposed max diff:", d, flush=True)
# cross-spin pallas for scale
t_p = chain(lambda c: ham._matvec_pallas(c))
print(f"full pallas matvec: {t_p*1e3:.2f} ms", flush=True)
t_f = chain(lambda c: ham.matvec(c))
print(f"dispatched matvec:  {t_f*1e3:.2f} ms", flush=True)
