# Probe: connected_table_pair vs connected_table_rank at d=5e7, 40 qubits.
# Run from /root/repo (no PYTHONPATH). One process at a time on the tunnel.
import time
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from sqd_tpu.ops import pauli_proj
from sqd_tpu.primitives import Pauli


def rand_packed(nq, d, seed):
    rng = np.random.default_rng(seed)
    w = (nq + 31) // 32
    words = rng.integers(0, 2**32, size=(d, w), dtype=np.uint64).astype(np.uint32)
    if nq % 32:
        words[:, -1] &= (1 << (nq % 32)) - 1
    order = np.lexsort(tuple(words[:, j] for j in range(w)))
    words = words[order]
    keep = np.ones(d, bool)
    keep[1:] = np.any(words[1:] != words[:-1], axis=1)
    return words[keep]


def main():
    nq, d = 40, 50_000_000
    packed = rand_packed(nq, d, 3)
    print("dim", packed.shape, flush=True)
    t0 = time.perf_counter()
    sp = jax.device_put(packed)
    float(jnp.sum(sp[:, 0] // jnp.uint32(2**31)))
    print(f"transfer+session {time.perf_counter()-t0:.1f}s", flush=True)
    px = Pauli.from_label("X" + "Z" * (nq - 1))
    zw, xw = pauli_proj.pauli_masks_to_packed(px.z, px.x)
    w = sp.shape[1]
    zd, xd = jnp.asarray(zw[:w]), jnp.asarray(xw[:w])
    for name, fn in (
        ("pair", pauli_proj.connected_table_pair),
        ("rank", pauli_proj.connected_table_rank),
    ):
        best, cs = float("inf"), None
        for _ in range(3):
            t0 = time.perf_counter()
            col, sign = fn(sp, zd, xd)
            cs = (int(jnp.sum(sign.astype(jnp.int32))),
                  int(jnp.sum((col < sp.shape[0]).astype(jnp.int32))))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.3f}s checksum(sign_sum, present)={cs}", flush=True)


if __name__ == "__main__":
    main()
