"""A/B: does jax_enable_x64 poison chained-matmul timing via i64 loop carry?

mfu_chained_r5.log (x64 ON) measured (1296,1296)@(1296,101216) HIGHEST at
289 ms/iter; split_matmul_r5.log (x64 OFF) measured the identical chained
matmul at 15.06 ms/iter.  The dot HLO is identical under both flags — the
only structural difference is the fori_loop counter dtype (Python int
bounds become i64 under x64).  Three chains at the same shape settle it.
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

K, N, R = 1296, 101216, 32
rng = np.random.default_rng(0)
a = jnp.asarray((rng.normal(size=(K, K)) / np.sqrt(K)).astype(np.float32))
y = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
_ = float(jnp.sum(jnp.zeros(8)))
print("session up", flush=True)


def timed(chain, lo, hi, tag):
    out = chain(a, y, lo, hi)
    _ = float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    out = chain(a, y, lo, hi)
    _ = float(jnp.sum(out[0]))
    t = (time.perf_counter() - t0) / R
    print(f"{tag:28s}: {t*1e3:8.2f} ms/iter -> {2*K*K*N/t/1e12:6.1f} TFLOP/s", flush=True)


@jax.jit
def chain_dyn(a, y, lo, hi):
    def body(_, y):
        return jnp.matmul(a, y, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    return jax.lax.fori_loop(lo, hi, body, y)


timed(chain_dyn, jnp.int64(0), jnp.int64(R), "x64 i64 bounds")
timed(chain_dyn, jnp.int32(0), jnp.int32(R), "x64 i32 bounds")


@partial(jax.jit, static_argnames=("lo", "hi"))
def chain_static(a, y, lo, hi):
    def body(_, y):
        return jnp.matmul(a, y, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    return jax.lax.fori_loop(lo, hi, body, y)


timed(chain_static, 0, R, "x64 python-int bounds")
print("OK", flush=True)
