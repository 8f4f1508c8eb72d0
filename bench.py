"""Headline benchmark: batched KZG blob-proof verifications/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/target}

vs_baseline is measured against the driver's north-star target of 1e6
batched verifications/sec on a v5p-16 slice (BASELINE.json:5; the
reference publishes no numbers of its own — BASELINE.md).  This harness
runs on whatever single chip is visible.

Env knobs: TPUKZG_BENCH_N (blob size, default 4096),
           TPUKZG_BENCH_K (batch size, default 64),
           TPUKZG_BENCH_REPS (timed repetitions, default 3).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("TPUKZG_CACHE_DIR", os.path.join(REPO, ".srs_cache"))

# XLA executable serialization (cache writes) can blow the default 8 MB
# stack on the large verify executables; raise to the hard cap.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ImportError, ValueError, OSError):
    pass

TARGET = 1e6  # verifications/sec north star (BASELINE.json:5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    import numpy as np
    import tpukzg

    n = int(os.environ.get("TPUKZG_BENCH_N", "4096"))
    k = int(os.environ.get("TPUKZG_BENCH_K", "64"))
    reps = int(os.environ.get("TPUKZG_BENCH_REPS", "3"))
    log(f"[bench] devices={jax.devices()} n={n} k={k}")

    t0 = time.time()
    ts = tpukzg.generate_insecure_setup(0xDEADBEEF, n)
    log(f"[bench] setup ready in {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0x5EED)
    r_mod = (1 << 255)  # sample below 2^255 then clamp per element
    from tpukzg.field.mont import R_MOD

    def mkblob():
        vals = [int(rng.integers(0, 1 << 62)) | (int(rng.integers(0, 1 << 62)) << 62)
                for _ in range(n)]
        return b"".join((v % R_MOD).to_bytes(32, "big") for v in vals)

    t0 = time.time()
    blobs = [mkblob() for _ in range(k)]
    cs = [tpukzg.blob_to_kzg_commitment(b, ts) for b in blobs]
    pfs = [tpukzg.compute_blob_kzg_proof(b, c, ts) for b, c in zip(blobs, cs)]
    log(f"[bench] {k} commitments+proofs in {time.time() - t0:.1f}s")

    # warmup (compiles)
    t0 = time.time()
    ok = tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, ts)
    assert ok, "batch verification must pass on valid proofs"
    log(f"[bench] warmup verify in {time.time() - t0:.1f}s")

    times = []
    for _ in range(reps):
        t0 = time.time()
        ok = tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, ts)
        times.append(time.time() - t0)
        assert ok
    best = min(times)
    vps = k / best
    log(f"[bench] times={['%.3f' % t for t in times]} best={best:.3f}s "
        f"=> {vps:.1f} verifications/s")
    print(json.dumps({
        "metric": "batched_kzg_blob_verifications_per_sec",
        "value": round(vps, 2),
        "unit": f"verifications/s (k={k}, n={n}, 1 chip)",
        "vs_baseline": round(vps / TARGET, 6),
    }), flush=True)


if __name__ == "__main__":
    main()
