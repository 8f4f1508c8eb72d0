"""Hard CPU isolation for ad-hoc scripts (import FIRST, before jax use).

`JAX_PLATFORMS=cpu` in the env is NOT enough on this box: the axon
sitecustomize registers the tunneled-TPU backend at interpreter start and
re-pins the platform list, so a "CPU" script silently runs (and compiles)
over the TPU tunnel — and a `timeout`-kill of such a script mid-execution
wedges the tunnel for ~15 minutes (observed 2026-08-20).  This mirrors
tests/conftest.py's isolation: drop the axon backend factory and re-pin
jax to CPU.  Usage:

    import scripts.cpu_env  # noqa: F401  (must precede first jax op)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax  # noqa: E402

try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
