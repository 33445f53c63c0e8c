"""Why does the (1296,1296)@(1296,101376) f32-HIGHEST matmul run at 1.2 TFLOP/s?

The production CASCI shape (256,256)@(256,560k) measures 37 TFLOP/s at the
same precision — this probe isolates what kills MFU at the 36-orbital pair
count: K/M alignment (1296 vs multiples of 128), precision tier, or the thin
Cholesky-factor shapes.
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import faulthandler; faulthandler.dump_traceback_later(300, repeat=True)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_enable_x64", True)  # match the library environment
import jax.numpy as jnp

K = 1296
N = 32 * 3163  # cb * m from the fe4s4 shape
rng = np.random.default_rng(0)
_ = float(jnp.sum(jnp.zeros(8)))
print("session up", flush=True)

def bench(name, f, *args, reps=4):
    jf = jax.jit(f)
    out = jf(*args)
    _ = float(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jf(*args)
        _ = float(out[(0,) * out.ndim])
    t = (time.perf_counter() - t0) / reps - 2 * 0.027
    flops = 0
    print(f"{name:42s}: {t*1e3:8.1f} ms", flush=True)
    return t

A = jnp.asarray(rng.normal(size=(K, K)).astype(np.float32))
B = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
Ap = jnp.pad(A, ((0, 112), (0, 112)))   # 1296 -> 1408 (11 x 128)
Bp = jnp.pad(B, ((0, 112), (0, 0)))
L = jnp.asarray(rng.normal(size=(128, K)).astype(np.float32))
Lp = jnp.pad(L, ((0, 0), (0, 112)))
gf = 2 * K * K * N / 1e9

with jax.default_matmul_precision("highest"):
    t = bench(f"HIGHEST {K}x{K} @ {K}x{N}", lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32), A, B)
    print(f"   -> {gf/t/1e3:.1f} TFLOP/s", flush=True)
    t = bench(f"HIGHEST padded 1408", lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32), Ap, Bp)
    print(f"   -> {2*1408*1408*N/1e9/t/1e3:.1f} TFLOP/s", flush=True)
    def chol2(l, b):
        tt = jnp.matmul(l, b, preferred_element_type=jnp.float32)
        return jnp.matmul(l.T, tt, preferred_element_type=jnp.float32)
    t = bench("HIGHEST chol X=128 (two thin matmuls)", chol2, L, B)
    print(f"   -> {2*2*128*K*N/1e9/t/1e3:.1f} TFLOP/s", flush=True)
    t = bench("HIGHEST chol padded K=1408", chol2, Lp, Bp)
    print(f"   -> {2*2*128*1408*N/1e9/t/1e3:.1f} TFLOP/s", flush=True)

t = bench(f"DEFAULT {K}x{K} @ {K}x{N}", lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32), A, B)
print(f"   -> {gf/t/1e3:.1f} TFLOP/s", flush=True)
Ab = A.astype(jnp.bfloat16); Bb = B.astype(jnp.bfloat16)
t = bench("bf16 inputs DEFAULT", lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32), Ab, Bb)
print(f"   -> {gf/t/1e3:.1f} TFLOP/s", flush=True)

# is it an N-size effect? same K at the production-like N
Bs = B[:, : 8 * 3163]
with jax.default_matmul_precision("highest"):
    t = bench(f"HIGHEST {K}x{K} @ {K}x{8*3163}",
              lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32), A, Bs)
    print(f"   -> {2*K*K*Bs.shape[1]/1e9/t/1e3:.1f} TFLOP/s", flush=True)
    # control at the production pair count (should reproduce ~37 TFLOP/s)
    A256 = A[:256, :256]
    B256 = jnp.asarray(rng.normal(size=(256, N)).astype(np.float32))
    t = bench(f"HIGHEST 256x256 @ 256x{N} (control)",
              lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32), A256, B256)
    print(f"   -> {2*256*256*N/1e9/t/1e3:.1f} TFLOP/s", flush=True)
    # intermediate pair counts: where does MFU fall off?  1280 = 10*128 is
    # the aligned size nearest 1296 — if it runs fast, alignment is the cliff
    for kk in (512, 768, 1024, 1280):
        Ak = A[:kk, :kk]
        Bk = jnp.asarray(rng.normal(size=(kk, N)).astype(np.float32))
        t = bench(f"HIGHEST {kk}x{kk} @ {kk}x{N}",
                  lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32), Ak, Bk)
        print(f"   -> {2*kk*kk*N/1e9/t/1e3:.1f} TFLOP/s", flush=True)
    # disambiguate M- vs K-alignment: pad ONE axis at a time
    Apk = jnp.pad(A, ((0, 0), (0, 112)))  # K -> 1408, M stays 1296
    t = bench("HIGHEST K-padded only (1296x1408 @ 1408xN)",
              lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32), Apk, Bp)
    print(f"   -> {2*1296*1408*N/1e9/t/1e3:.1f} TFLOP/s", flush=True)
    Apm = jnp.pad(A, ((0, 112), (0, 0)))  # M -> 1408, K stays 1296
    t = bench("HIGHEST M-padded only (1408x1296 @ 1296xN)",
              lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32), Apm, B)
    print(f"   -> {2*1408*1296*N/1e9/t/1e3:.1f} TFLOP/s", flush=True)
    # contraction order control: does (K,M)^T layout change the lowering?
    At = jnp.asarray(np.ascontiguousarray(np.asarray(A).T))
    t = bench("HIGHEST A^T layout (dot_general k-major lhs)",
              lambda a, b: jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                               preferred_element_type=jnp.float32), At, B)
    print(f"   -> {gf/t/1e3:.1f} TFLOP/s", flush=True)
print("OK", flush=True)
