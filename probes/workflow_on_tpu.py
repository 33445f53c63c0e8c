"""End-to-end SQD loop (recover -> subsample -> solve -> converge) ON the TPU."""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
import sqd_tpu
from sqd_tpu import fermion
from sqd_tpu.primitives import BitArray
from sqd_tpu.ops import dense_fci

norb, nelec = 6, (3, 3)
rng = np.random.default_rng(2)
orb_e = np.linspace(-3.0, 1.5, norb)
h1 = np.diag(orb_e) + 0.1 * rng.normal(size=(norb, norb)); h1 = (h1 + h1.T) / 2
chol = rng.normal(size=(2*norb, norb, norb)) * (0.4/np.sqrt(2*norb)); chol = (chol + chol.transpose(0,2,1))/2
eri = np.einsum("xpq,xrs->pqrs", chol, chol)

strs = dense_fci.all_hamming_strings(norb, nelec[0])
hd = dense_fci.build_dense_hamiltonian(strs, strs, h1, eri)
evals, evecs = np.linalg.eigh(hd)
print(f"exact E0 = {evals[0]:.9f} (dim {hd.shape[0]})", flush=True)

probs = np.abs(evecs[:, 0]) ** 2
probs /= probs.sum()
n = len(strs)
draws = rng.choice(n * n, size=6000, p=probs)
rows = []
for d in draws:
    sa, sb = strs[d // n], strs[d % n]
    row = np.zeros(2 * norb, dtype=bool)
    for p in range(norb):
        if (int(sb) >> p) & 1: row[norb - 1 - p] = True
        if (int(sa) >> p) & 1: row[2 * norb - 1 - p] = True
    rows.append(row)
# 15% uniform noise shots
noise = rng.integers(0, 2, (900, 2 * norb)).astype(bool)
ba = BitArray.from_bool_array(np.concatenate([np.array(rows), noise]))

hist = []
t0 = time.perf_counter()
res = fermion.diagonalize_fermionic_hamiltonian(
    h1, eri, ba, samples_per_batch=40, norb=norb, nelec=nelec,
    num_batches=3, max_iterations=6, seed=11,
    callback=lambda rs: hist.append(min(r.energy for r in rs)),
)
wall = time.perf_counter() - t0
print("iteration energies:", [f"{e:.6f}" for e in hist], flush=True)
err = res.energy - evals[0]
dim = res.sci_state.amplitudes.size
print(f"SQD E = {res.energy:.9f}  err = {err:.2e}  subspace dim = {dim}  wall = {wall:.1f}s", flush=True)
assert err >= -1e-9 and err < 5e-4, err
print("WORKFLOW ON TPU OK", flush=True)
