"""Multi-PROCESS distributed path (SURVEY.md section 4.5; VERDICT r2
item 9 / r3 next-round #6): two local processes coordinate through
`jax.distributed.initialize` (the DCN-path mechanism) and run the
sharded batch verifier across the process boundary.

The in-process 8-virtual-device tests (test_dist.py) cover the shard_map
programs; this covers the process-coordination layer itself.  It reuses
bench/scaling.py's worker entry point so the test and the scaling
harness exercise the same code.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_sharded_verify():
    # ~10-15 min on this 1-core host: each process compiles its own
    # cross-process SPMD executables (the persistent cache only covers
    # same-topology reruns).  Run with `pytest -m slow`.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # one device per process
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    env.setdefault("TPUKZG_CACHE_DIR", os.path.join(REPO, ".srs_cache"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench", "scaling.py"),
         "--processes", "2", "--k", "4", "--n", "64", "--port", "45911"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"kernel": "multiproc_batch_verify"' in r.stdout, (
        r.stdout[-500:], r.stderr[-1000:])
