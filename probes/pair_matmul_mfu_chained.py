"""Chained-iteration MFU measurement for the npair=1296 pair matmul.

The original probe (pair_matmul_mfu.py) timed one dispatch per rep; on this
tunnel the ~27-40 ms dispatch+readback floor swamps the ~10-15 ms kernels
(negative times after the floor subtraction — see probes/logs/mfu_r5.log).
Here each timed unit is ONE jitted lax.fori_loop of R data-dependent
matmuls, so dispatch cost amortizes to R^-1 and the per-matmul time is
kernel-bound.  This settles the round-3 "1.2 TFLOP/s at npair=1296" cliff:
whether the pair matmul itself is slow, or the surrounding gather/alpha-pick
stages were the real cost.
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

N = 32 * 3163  # cb * m from the fe4s4 dense-ERI blocking
R = 64
rng = np.random.default_rng(0)
_ = float(jnp.sum(jnp.zeros(8)))
print("session up", flush=True)


@partial(jax.jit, static_argnames=("r",))
def chain(a, y, r):
    def body(_, y):
        with jax.default_matmul_precision("highest"):
            return jnp.matmul(a, y, preferred_element_type=jnp.float32)
    return jax.lax.fori_loop(0, r, body, y)


def run(k, n=N, r=R):
    # spectral-radius-safe operator so the chain neither over- nor underflows
    a = rng.normal(size=(k, k)).astype(np.float32) / np.sqrt(k)
    y0 = rng.normal(size=(k, n)).astype(np.float32)
    a, y0 = jnp.asarray(a), jnp.asarray(y0)
    out = chain(a, y0, r)
    _ = float(jnp.sum(out[0]))  # compile + warm
    t0 = time.perf_counter()
    out = chain(a, y0, r)
    _ = float(jnp.sum(out[0]))
    t = (time.perf_counter() - t0) / r
    tf = 2 * k * k * n / t / 1e12
    print(f"HIGHEST {k:5d}x{k} @ {k}x{n}: {t*1e3:8.2f} ms/matmul  -> {tf:6.1f} TFLOP/s", flush=True)
    return t, tf


for k in (256, 1024, 1280, 1296, 1408):
    run(k)

# the chol-factored two-thin-matmul shape (X=128 factor rows)
@partial(jax.jit, static_argnames=("r",))
def chain_chol(l, y, r):
    def body(_, y):
        with jax.default_matmul_precision("highest"):
            t = jnp.matmul(l, y, preferred_element_type=jnp.float32)
            return jnp.matmul(l.T, t, preferred_element_type=jnp.float32)
    return jax.lax.fori_loop(0, r, body, y)


k = 1296
l = jnp.asarray(rng.normal(size=(128, k)).astype(np.float32) / np.sqrt(k))
y0 = jnp.asarray(rng.normal(size=(k, N)).astype(np.float32))
out = chain_chol(l, y0, R)
_ = float(jnp.sum(out[0]))
t0 = time.perf_counter()
out = chain_chol(l, y0, R)
_ = float(jnp.sum(out[0]))
t = (time.perf_counter() - t0) / R
tf = 2 * 2 * 128 * k * N / t / 1e12
print(f"HIGHEST chol X=128 pair (two thin matmuls): {t*1e3:8.2f} ms  -> {tf:6.1f} TFLOP/s", flush=True)
print("OK", flush=True)
