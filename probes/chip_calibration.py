"""Chip-peak calibration: is the npair pair-matmul "cliff" shape-specific
or chip-wide?

mfu_chained_r5.log measured the (k,k)@(k,N=101216) f32-HIGHEST matmul at
0.3-1.2 TFLOP/s with time scaling with BYTES (2*k*N*4 / t = ~4 GB/s for
every k in 256..1408) — i.e. bandwidth-shaped, at 0.5% of nominal v5e HBM.
Either (a) the chip/tunnel is globally slow, or (b) this lowering is
pathological.  This probe measures, all via chained lax.fori_loop (the only
timing that survives the tunnel's async dispatch):

  1. raw HBM bandwidth        — chained elementwise axpy on 256 MB
  2. chip peak matmul         — chained 4096^3 bf16 (DEFAULT)
  3. f32 HIGHEST square 2048  — the precision tier the solvers pin
  4. the pathological shape   — k=1296, N=101216 under DEFAULT and bf16
  5. same shape, N as rows    — (N,k)@(k,k) bf16 DEFAULT
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import faulthandler; faulthandler.dump_traceback_later(600, repeat=True)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
_ = float(jnp.sum(jnp.zeros(8)))
print("session up", flush=True)


def timed(fn, *args, reps):
    out = fn(*args, reps)
    _ = float(jnp.sum(out.ravel()[:4]))  # compile + warm
    t0 = time.perf_counter()
    out = fn(*args, reps)
    _ = float(jnp.sum(out.ravel()[:4]))
    return (time.perf_counter() - t0) / reps


# 1. raw HBM bandwidth: y <- y*a + b over 256 MB f32 (read+write = 512 MB/iter)
@partial(jax.jit, static_argnames=("r",))
def axpy_chain(y, r):
    return jax.lax.fori_loop(0, r, lambda _, y: y * 1.0000001 + 1e-7, y)

y = jnp.asarray(rng.normal(size=(64 * 1024 * 1024,)).astype(np.float32))
t = timed(axpy_chain, y, reps=32)
print(f"HBM axpy 256MB: {t*1e3:8.2f} ms/iter -> {2*y.nbytes/t/1e9:7.1f} GB/s", flush=True)

# 2. chip peak: 4096^3 bf16 DEFAULT (137.4 GFLOP/iter)
@partial(jax.jit, static_argnames=("r",))
def mm_chain(a, y, r):
    def body(_, y):
        return jnp.matmul(a, y, preferred_element_type=jnp.float32).astype(y.dtype)
    return jax.lax.fori_loop(0, r, body, y)

n = 4096
a = jnp.asarray((rng.normal(size=(n, n)) / np.sqrt(n)).astype(np.float32)).astype(jnp.bfloat16)
yb = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)).astype(jnp.bfloat16)
t = timed(mm_chain, a, yb, reps=32)
print(f"bf16 4096^3 DEFAULT: {t*1e3:8.2f} ms/iter -> {2*n**3/t/1e12:7.1f} TFLOP/s", flush=True)

# 3. f32 HIGHEST square 2048 (17.2 GFLOP/iter)
@partial(jax.jit, static_argnames=("r",))
def mm_hi_chain(a, y, r):
    def body(_, y):
        with jax.default_matmul_precision("highest"):
            return jnp.matmul(a, y, preferred_element_type=jnp.float32)
    return jax.lax.fori_loop(0, r, body, y)

n = 2048
a32 = jnp.asarray((rng.normal(size=(n, n)) / np.sqrt(n)).astype(np.float32))
y32 = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
t = timed(mm_hi_chain, a32, y32, reps=32)
print(f"f32 HIGHEST 2048^3: {t*1e3:8.2f} ms/iter -> {2*n**3/t/1e12:7.1f} TFLOP/s", flush=True)

# 4. the pathological shape under DEFAULT f32 and bf16
K, N = 1296, 101216
aK = jnp.asarray((rng.normal(size=(K, K)) / np.sqrt(K)).astype(np.float32))
yN = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))

@partial(jax.jit, static_argnames=("r",))
def mm_def_chain(a, y, r):
    def body(_, y):
        return jnp.matmul(a, y, preferred_element_type=jnp.float32).astype(y.dtype)
    return jax.lax.fori_loop(0, r, body, y)

t = timed(mm_def_chain, aK, yN, reps=16)
print(f"f32 DEFAULT 1296x1296@1296x101216: {t*1e3:8.2f} ms -> {2*K*K*N/t/1e12:7.1f} TFLOP/s", flush=True)
t = timed(mm_def_chain, aK.astype(jnp.bfloat16), yN.astype(jnp.bfloat16), reps=16)
print(f"bf16 DEFAULT 1296x1296@1296x101216: {t*1e3:8.2f} ms -> {2*K*K*N/t/1e12:7.1f} TFLOP/s", flush=True)

# 5. rows layout bf16: (N,k)@(k,k)
yR = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32)).astype(jnp.bfloat16)

@partial(jax.jit, static_argnames=("r",))
def mm_rows_chain(a, y, r):
    def body(_, y):
        return jnp.matmul(y, a, preferred_element_type=jnp.float32).astype(y.dtype)
    return jax.lax.fori_loop(0, r, body, y)

t = timed(mm_rows_chain, aK.astype(jnp.bfloat16), yR, reps=16)
print(f"bf16 DEFAULT rows 101216x1296@1296x1296: {t*1e3:8.2f} ms -> {2*K*K*N/t/1e12:7.1f} TFLOP/s", flush=True)
print("OK", flush=True)
