"""Test configuration: CPU backend with 8 virtual devices (SURVEY.md 4.5).

Must set env BEFORE jax is imported anywhere.
"""

import os
import sys

# Opt-in escape hatch for the compiled-TPU kernel gates
# (tests/test_pallas_tpu.py): TPUKZG_TEST_TPU=1 keeps the real backend.
_WANT_TPU = os.environ.get("TPUKZG_TEST_TPU", "") == "1"

if not _WANT_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Persistent compilation cache: reruns skip XLA compiles entirely.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
# Committed SRS npz cache: setup fixtures load in ~0.1s instead of
# regenerating the dev SRS on-device (~65s/process, r5 measurement).
os.environ.setdefault("TPUKZG_CACHE_DIR", os.path.join(REPO, ".srs_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)

import random  # noqa: E402

import jax  # noqa: E402

# Big-stack thread for XLA compiles + executable (de)serialization — both
# overflow the default stack on the big modules (see utils/cachefix.py).
from tpukzg.utils import cachefix  # noqa: E402

cachefix.install()
cachefix.seed(REPO)  # committed cache entries -> fresh-clone warm start

# HARD-isolate tests from the tunneled TPU: the axon plugin's register()
# overrides jax_platforms to "axon,cpu" (sitecustomize), so env vars are
# not enough — drop its backend factory and re-pin the platform list.
# A wedged/slow tunnel must never be able to hang the CPU-only suite
# (observed 2026-08-17: axon init retries in a sleep loop for minutes).
if not _WANT_TPU:
    try:  # noqa: SIM105
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return random.Random(0x5EED)
