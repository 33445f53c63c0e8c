# Root conftest: force tests onto a virtual 8-device CPU mesh.
#
# The environment's sitecustomize registers the tunneled TPU ("axon") backend
# in every Python process and force-sets jax_platforms="axon,cpu" via
# jax.config — overriding the JAX_PLATFORMS env var. Tests must run on the
# virtual CPU mesh, so re-override through jax.config here (conftest runs
# before any test imports build arrays, hence before backends initialize).
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite compiles many (shape, dtype) solver
# buckets; caching them across runs cuts wall-clock dramatically.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():  # a stale axon backend set would pin devices()
    from jax.extend.backend import clear_backends

    clear_backends()
assert jax.devices()[0].platform == "cpu", jax.devices()
