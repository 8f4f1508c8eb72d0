"""Failure detection / recovery (SURVEY.md section 5.3; VERDICT r4 #8).

Three layers, matching the blueprint's honest scope for a stateless
verifier:

1. chunked-retry: a transient device-step failure inside one chunk of a
   large batch is retried and the run completes (fault injected by
   monkeypatching the underlying batch call to raise once).
2. startup health: a coordinator that never answers must produce a
   CLEAR timeout error quickly — not a hang (subprocess, 15 s budget).
3. kill-one-worker (slow-marked, like the healthy 2-process test it
   mirrors): SIGKILL one rank of the 2-process sharded run mid-flight;
   the surviving rank must exit with an error within the timeout — a
   stateless driver then simply relaunches (the recovery contract;
   test_dist_multiproc.py is the relaunch-succeeds half).
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_chunked_retry_recovers_from_transient_failure(monkeypatch):
    import tpukzg
    from tpukzg.kzg.blob import BlobKzg

    ts = tpukzg.generate_insecure_setup(0xDEADBEEF, 8)
    blobs = [bytes(32 * 8) for _ in range(4)]   # zero polynomial blobs
    cs = [tpukzg.blob_to_kzg_commitment(b, ts) for b in blobs]
    pfs = [tpukzg.compute_blob_kzg_proof(b, c, ts)
           for b, c in zip(blobs, cs)]

    calls = {"n": 0}
    real = BlobKzg.verify_blob_kzg_proof_batch

    def flaky(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 2:                      # second chunk, first try
            raise RuntimeError("injected transient device failure")
        return real(self, *a, **k)

    monkeypatch.setattr(BlobKzg, "verify_blob_kzg_proof_batch", flaky)
    ok = ts.blob.verify_blob_kzg_proof_batch_chunked(
        blobs, cs, pfs, chunk=2, retries=1)
    assert ok
    assert calls["n"] == 3                       # 2 chunks + 1 retry

    # retries exhausted -> the failure propagates (no silent False-pass)
    calls["n"] = 0

    def always_down(self, *a, **k):
        calls["n"] += 1
        raise RuntimeError("injected persistent failure")

    monkeypatch.setattr(BlobKzg, "verify_blob_kzg_proof_batch", always_down)
    with pytest.raises(RuntimeError, match="injected persistent"):
        ts.blob.verify_blob_kzg_proof_batch_chunked(
            blobs, cs, pfs, chunk=2, retries=1)
    assert calls["n"] == 2                       # first chunk tried twice


def test_startup_barrier_timeout_is_clear_and_fast():
    """jax.distributed.initialize against a dead coordinator must fail
    with a recognizable timeout error within its budget, not hang."""
    code = (
        "import jax, sys\n"
        "try:\n"
        "    jax.distributed.initialize(coordinator_address='127.0.0.1:1',"
        " num_processes=2, process_id=1, initialization_timeout=4)\n"
        "except Exception as e:\n"
        "    print('STARTUP_ERROR:', type(e).__name__, str(e)[:200])\n"
        "    sys.exit(7)\n"
        "sys.exit(0)\n")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=150)
    # jax surfaces the dead coordinator either as a Python exception
    # (our handler exits 7) or as an absl FATAL from the coordination
    # client (exit 1 with DEADLINE_EXCEEDED on stderr) — both are
    # clear, fast, nonzero exits, which is the §5.3 contract.
    assert r.returncode != 0, (r.returncode, r.stdout, r.stderr[-500:])
    blob = r.stdout + r.stderr
    assert ("STARTUP_ERROR:" in blob or "DEADLINE_EXCEEDED" in blob
            or "Deadline Exceeded" in blob), blob[-800:]
    assert time.time() - t0 < 145


@pytest.mark.slow
def test_kill_one_worker_fails_cleanly():
    """SIGKILL rank 1 of the 2-process sharded verify; rank 0 must exit
    nonzero (not hang) so a stateless driver can retry the chunk
    (SURVEY 5.3).  Slow: each process compiles its SPMD executables."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    env.setdefault("TPUKZG_CACHE_DIR", os.path.join(REPO, ".srs_cache"))
    # rank 0 + coordinator in one process; rank 1 as a child we can kill
    p0 = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench", "scaling.py"),
         "--worker", "0", "--processes", "2", "--port", "45913",
         "--k", "4", "--n", "64"], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    p1 = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench", "scaling.py"),
         "--worker", "1", "--processes", "2", "--port", "45913",
         "--k", "4", "--n", "64"], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        time.sleep(45)                 # both ranks well into startup
        p1.send_signal(signal.SIGKILL)
        out, _ = p0.communicate(timeout=900)
        assert p0.returncode != 0, out[-1000:]
    finally:
        for p in (p0, p1):
            if p.poll() is None:
                p.kill()
                p.wait()
