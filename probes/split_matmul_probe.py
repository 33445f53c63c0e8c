"""Precision-compensated matmul schemes at the pair-matmul cliff shape.

chip_calibration_r5.log isolated the npair=1296 cliff: (1296,1296)@(1296,
101216) runs at 58.6 TFLOP/s under DEFAULT f32 but 1.2 TFLOP/s under
HIGHEST — the 6-pass HIGHEST lowering is pathological at huge-N, while the
chip itself is healthy (84 TFLOP/s bf16, 11.8 TFLOP/s HIGHEST on square
2048).  Candidate cures, all timed with chained fori_loop and accuracy-
checked against host f64:

  - Precision.HIGH (bf16x3 in-compiler) — may share the cliff
  - manual 2-way bf16 split, 3 products at DEFAULT ("split3", bf16x3-grade)
  - manual 3-way bf16 split, 6 products at DEFAULT ("split6", ~f32-grade)
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

K, N, R = 1296, 101216, 32
rng = np.random.default_rng(0)
a_h = (rng.normal(size=(K, K)) / np.sqrt(K)).astype(np.float32)
y_h = rng.normal(size=(K, N)).astype(np.float32)
ref = a_h.astype(np.float64) @ y_h[:, :2048].astype(np.float64)
refn = np.linalg.norm(ref)
a, y = jnp.asarray(a_h), jnp.asarray(y_h)
_ = float(jnp.sum(jnp.zeros(8)))
print("session up", flush=True)


def bsplit(x, parts):
    outs = []
    r = x
    for _ in range(parts - 1):
        hi = r.astype(jnp.bfloat16)
        outs.append(hi)
        r = r - hi.astype(jnp.float32)
    outs.append(r.astype(jnp.bfloat16))
    return outs


def mm(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


def split3_mm(a, y):
    a1, a2 = bsplit(a, 2)
    y1, y2 = bsplit(y, 2)
    return mm(a1, y2) + mm(a2, y1) + mm(a1, y1)


def split6_mm(a, y):
    a1, a2, a3 = bsplit(a, 3)
    y1, y2, y3 = bsplit(y, 3)
    s = mm(a1, y3) + mm(a3, y1)
    s = s + mm(a2, y2)
    s = s + mm(a1, y2) + mm(a2, y1)
    return s + mm(a1, y1)


def prec_mm(p):
    def f(a, y):
        return jnp.matmul(a, y, precision=p, preferred_element_type=jnp.float32)
    return f

SCHEMES = {
    "DEFAULT": prec_mm(jax.lax.Precision.DEFAULT),
    "HIGH": prec_mm(jax.lax.Precision.HIGH),
    "HIGHEST": prec_mm(jax.lax.Precision.HIGHEST),
    "split3": split3_mm,
    "split6": split6_mm,
}

# accuracy: single application, first 2048 cols vs host f64
for name, f in SCHEMES.items():
    out = jax.jit(f)(a, y[:, :2048])
    err = np.linalg.norm(np.asarray(out, dtype=np.float64) - ref) / refn
    print(f"acc  {name:8s}: rel fro err {err:9.2e}", flush=True)

# speed: chained fori_loop, full N
for name, f in SCHEMES.items():
    @partial(jax.jit, static_argnames=("r",))
    def chain(a, y, r, f=f):
        return jax.lax.fori_loop(0, r, lambda _, yy: f(a, yy), y)
    out = chain(a, y, R)
    _ = float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    out = chain(a, y, R)
    _ = float(jnp.sum(out[0]))
    t = (time.perf_counter() - t0) / R
    print(f"time {name:8s}: {t*1e3:8.2f} ms/matvec -> {2*K*K*N/t/1e12:6.1f} TFLOP/s", flush=True)
print("OK", flush=True)
