import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import sqd_tpu
from sqd_tpu.ops import bitpack
from sqd_tpu.ops.hamiltonian import build_sci_hamiltonian
from sqd_tpu.ops.pallas_matvec import cross_spin_matvec

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
ham = ham64.astype(jnp.float32)
mp, np_ = ham.shape
c = jnp.asarray(rng.normal(size=(mp, np_)), jnp.float32)
c = c / jnp.linalg.norm(c)
ka = -(-(nelec[0] * (norb - nelec[0] + 1)) // 8) * 8
print("shapes", ham.shape, "ka", ka, flush=True)

# exactness vs the XLA highest path (cross-spin only)
ref = ham._matvec_full(c) - ham.apply_samespin_alpha(c) - ham.apply_samespin_beta(c)
for prec in ("highest",):
    out = cross_spin_matvec(c, ham.src_a, ham.sign_a, ham.src_b, ham.sign_b,
                            ham.eri_t, ka=ka, precision=prec)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    print(f"prec={prec}: max abs err {err:.3e} (scale {scale:.3e})", flush=True)

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

from sqd_tpu.ops.pallas_matvec import fused_matvec
ref_full = ham._matvec_full(c)
out_full = ham._matvec_pallas(c)
print(f"fused full-matvec max abs err: {float(jnp.max(jnp.abs(out_full - ref_full))):.3e}", flush=True)
t = chain(lambda c: fused_matvec(
    c, ham.src_a, ham.sign_a, ham.src_b, ham.sign_b,
    ham.nbr_idx_a, ham.nbr_val_a, ham.nbr_idx_b, ham.nbr_val_b,
    ham.eri_t, ka=ka))
print(f"fused matvec (all 3 channels): {t*1e3:.2f} ms", flush=True)

t_full = chain(lambda c: ham.matvec(c))
print(f"full matvec (pallas dispatch): {t_full*1e3:.2f} ms", flush=True)

# full Davidson solve
from sqd_tpu.ops.davidson import davidson_ground_state, davidson_initial_guess
from sqd_tpu.ops.hamiltonian import sci_matvec_flat, expectation_value
hd32 = ham.hdiag.reshape(-1)
def solve():
    v0 = davidson_initial_guess(hd32, jnp.float32)
    res = davidson_ground_state(sci_matvec_flat, ham, hd32, v0, tol=1e-3,
                                max_subspace=24, max_iterations=200)
    e = expectation_value(ham64, res.vector)
    return float(e), int(res.iterations), float(res.residual_norm)
e, it, rn = solve()
t0 = time.perf_counter(); e, it, rn = solve(); dt = time.perf_counter() - t0
print(f"davidson solve: {dt:.3f} s, iters {it}, residual {rn:.2e}, E {e:.9f}", flush=True)
