import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
import jax.numpy as jnp
import sqd_tpu
from sqd_tpu.ops import bitpack
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian, expectation_value, sci_matvec_flat
from sqd_tpu.ops.davidson import davidson_ground_state, davidson_initial_guess

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
ham64 = build_sci_hamiltonian(pa, pb, h1, eri, norb, nelec, dtype=jnp.float64)
ham32 = ham64.astype(jnp.float32)
hd32 = ham32.hdiag.reshape(-1)

def dav():
    v0 = davidson_initial_guess(hd32, jnp.float32)
    return davidson_ground_state(sci_matvec_flat, ham32, hd32, v0, tol=1e-3, max_subspace=24, max_iterations=200)

res = dav(); _ = float(res.theta)
t0 = time.perf_counter(); res = dav(); _ = float(res.theta)
t_dav = time.perf_counter() - t0
print(f"davidson-only: {t_dav*1e3:.0f} ms for {int(res.iterations)} its = {t_dav/int(res.iterations)*1e3:.1f} ms/it", flush=True)

e = float(expectation_value(ham64, res.vector))
t0 = time.perf_counter(); e = float(expectation_value(ham64, res.vector)); t_ev = time.perf_counter() - t0
print(f"expectation_value: {t_ev*1e3:.0f} ms   E={e:.9f}", flush=True)
