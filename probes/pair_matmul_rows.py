"""Layout fix test for the npair pair-matmul cliff (see mfu_chained_r5.log).

Finding so far: inside a jitted fori_loop, (k,k)@(k,N) with the huge det
dim N as OUTPUT COLUMNS runs at ~1 TFLOP/s for EVERY k in {256..1408} —
alignment is irrelevant; standalone dispatches of the identical matmul are
>20x faster.  The repo already documents the XLA pathology for huge-column
matmuls (K-split full-size accumulators; keep the huge dim as OUTPUT ROWS —
ops/hamiltonian's blocked two-pass matvec).  This probe confirms the
rows-layout chain is fast, which pins the round-3 "dense-eri 27.3 s/matvec
at npair=1296" cliff on layout, not on the MXU.
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import faulthandler; faulthandler.dump_traceback_later(600, repeat=True)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from functools import partial

N = 32 * 3163
R = 64
rng = np.random.default_rng(0)
_ = float(jnp.sum(jnp.zeros(8)))
print("session up", flush=True)


@partial(jax.jit, static_argnames=("r",))
def chain_rows(a, y, r):
    # carry (N, k): huge dim as output ROWS of y @ a
    def body(_, y):
        with jax.default_matmul_precision("highest"):
            return jnp.matmul(y, a, preferred_element_type=jnp.float32)
    return jax.lax.fori_loop(0, r, body, y)


def run_rows(k, n=N, r=R):
    a = jnp.asarray(rng.normal(size=(k, k)).astype(np.float32) / np.sqrt(k))
    y0 = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))
    out = chain_rows(a, y0, r)
    _ = float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    out = chain_rows(a, y0, r)
    _ = float(jnp.sum(out[0]))
    t = (time.perf_counter() - t0) / r
    tf = 2 * k * k * n / t / 1e12
    print(f"ROWS HIGHEST ({n}x{k}) @ ({k}x{k}): {t*1e3:8.2f} ms/matmul -> {tf:6.1f} TFLOP/s", flush=True)


for k in (256, 1296):
    run_rows(k)


# and the out-of-loop control for the same rows layout
k = 1296
a = jnp.asarray(rng.normal(size=(k, k)).astype(np.float32) / np.sqrt(k))
y0 = jnp.asarray(rng.normal(size=(N, k)).astype(np.float32))
f = jax.jit(lambda y, a: jnp.matmul(y, a, preferred_element_type=jnp.float32))
with jax.default_matmul_precision("highest"):
    out = f(y0, a); _ = float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _i in range(8):
        out = f(out, a)
    _ = float(jnp.sum(out[0]))
    t = (time.perf_counter() - t0) / 8
print(f"ROWS standalone x8 chained dispatches: {t*1e3:8.2f} ms -> {2*k*k*N/t/1e12:6.1f} TFLOP/s", flush=True)

# columns-layout standalone control (dispatch-chained, no readback between)
yc = jnp.asarray(rng.normal(size=(k, N)).astype(np.float32))
fc = jax.jit(lambda a, y: jnp.matmul(a, y, preferred_element_type=jnp.float32))
with jax.default_matmul_precision("highest"):
    out = fc(a, yc); _ = float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _i in range(8):
        out = fc(a, out)
    _ = float(jnp.sum(out[0]))
    t = (time.perf_counter() - t0) / 8
print(f"COLS standalone x8 chained dispatches: {t*1e3:8.2f} ms -> {2*k*k*N/t/1e12:6.1f} TFLOP/s", flush=True)
print("OK", flush=True)
