import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
import jax.numpy as jnp
import sqd_tpu
from sqd_tpu.ops.davidson import _jacobi_eigh, _round_robin_schedule

N = 24
rng = np.random.default_rng(0)
a_np = rng.normal(size=(N, N)); a_np = (a_np + a_np.T) / 2
vals_ref = np.linalg.eigvalsh(a_np)
a = jnp.asarray(a_np, jnp.float64)

def _mm64(x, y):
    # exact small f64 matmul: elementwise products + f64 software reduce
    return jnp.sum(x[:, :, None] * y[None, :, :], axis=1)

def jacobi_elem(a, sweeps=10):
    n = a.shape[0]
    schedule = jnp.asarray(np.tile(_round_robin_schedule(n), (sweeps, 1, 1)))
    def step(carry, pairs):
        mat, rot = carry
        p = pairs[:, 0]; q = pairs[:, 1]
        app = mat[p, p]; aqq = mat[q, q]; apq = mat[p, q]
        skip = jnp.abs(apq) <= 1e-14 * (jnp.abs(app) + jnp.abs(aqq) + 1.0)
        safe_apq = jnp.where(skip, 1.0, apq)
        tau = (aqq - app) / (2.0 * safe_apq)
        tt = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        tt = jnp.where(tau == 0.0, 1.0, tt)
        tt = jnp.where(skip, 0.0, tt)
        c = 1.0 / jnp.sqrt(1.0 + tt * tt); s = tt * c
        g = jnp.zeros_like(mat)
        g = g.at[p, p].set(c).at[q, q].set(c).at[p, q].set(-s).at[q, p].set(s)
        mat = _mm64(_mm64(g, mat), g.T)
        rot = _mm64(rot, g.T)
        return (mat, rot), None
    (mat, rot), _ = jax.lax.scan(step, (a, jnp.eye(n, dtype=a.dtype)), schedule)
    vals = jnp.diagonal(mat)
    order = jnp.argsort(vals)
    return vals[order], rot[:, order]

def hybrid(a, sweeps=2):
    v32 = jnp.linalg.eigh(a.astype(jnp.float32))[1].astype(jnp.float64)
    # one symmetric-orthogonalization Newton step in exact f64
    vtv = _mm64(v32.T, v32)
    v = _mm64(v32, 1.5 * jnp.eye(a.shape[0], dtype=a.dtype) - 0.5 * vtv)
    b = _mm64(_mm64(v.T, a), v)
    vals, w = jacobi_elem(b, sweeps=sweeps)
    return vals, _mm64(v, w)

for name, fn in [("current jacobi", lambda a: _jacobi_eigh(a)),
                 ("elementwise jacobi", lambda a: jacobi_elem(a)),
                 ("hybrid qdwh+2sweep", lambda a: hybrid(a, 2)),
                 ("hybrid qdwh+3sweep", lambda a: hybrid(a, 3))]:
    f = jax.jit(fn)
    vals, vecs = f(a)
    err = float(jnp.max(jnp.abs(vals - jnp.asarray(vals_ref))))
    # residual |Av - v diag| and orthonormality
    res = float(jnp.max(jnp.abs(_mm64(a, vecs) - vecs * vals[None, :])))
    orth = float(jnp.max(jnp.abs(_mm64(vecs.T, vecs) - jnp.eye(N, dtype=jnp.float64))))
    @jax.jit
    def chain(a):
        def body(i, acc):
            vv, _ = fn(a + acc * 1e-30)
            return acc + vv[0]
        return jax.lax.fori_loop(0, 20, body, jnp.float64(0.0))
    float(chain(a))
    t0 = time.perf_counter()
    for _ in range(3): float(chain(a))
    dt = ((time.perf_counter() - t0) / 3 - 0.027) / 20
    print(f"{name:22s}: {dt*1e3:6.2f} ms  val_err={err:.2e} resid={res:.2e} orth={orth:.2e}", flush=True)
