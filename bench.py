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

# Big-stack thread for XLA executable (de)serialization: the ~100 MB
# cached executables overflow the default 8 MB stack (utils/cachefix.py).
from tpukzg.utils import cachefix  # noqa: E402

cachefix.install()

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
    k = int(os.environ.get("TPUKZG_BENCH_K", "256"))
    reps = int(os.environ.get("TPUKZG_BENCH_REPS", "3"))
    # Batch verification's fixed costs (pairings, subgroup-check and MSM
    # ladders) amortize over k — k=256 is a realistic serving batch.
    distinct = min(k, int(os.environ.get("TPUKZG_BENCH_DISTINCT", "16")))
    log(f"[bench] devices={jax.devices()} n={n} k={k} distinct={distinct}")

    t0 = time.time()
    ts = tpukzg.generate_insecure_setup(0xDEADBEEF, n)
    log(f"[bench] setup ready in {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0x5EED)
    from tpukzg.field.mont import R_MOD

    def mkblob():
        vals = [int(rng.integers(0, 1 << 62)) | (int(rng.integers(0, 1 << 62)) << 62)
                for _ in range(n)]
        return b"".join((v % R_MOD).to_bytes(32, "big") for v in vals)

    # Proof GENERATION is setup, not the measured quantity: produce
    # `distinct` real (blob, commitment, proof) triples and tile to k.
    # Duplicated triples exercise identical verifier work (the rho^i
    # folding scalars differ per batch index either way).
    t0 = time.time()
    base_blobs = [mkblob() for _ in range(distinct)]
    base_cs = tpukzg.blob_to_kzg_commitment_batch(base_blobs, ts)
    base_pfs = tpukzg.compute_blob_kzg_proof_batch(base_blobs, base_cs, ts)
    blobs = [base_blobs[i % distinct] for i in range(k)]
    cs = [base_cs[i % distinct] for i in range(k)]
    pfs = [base_pfs[i % distinct] for i in range(k)]
    log(f"[bench] {distinct} commitments+proofs in {time.time() - t0:.1f}s")

    # warmup (compiles)
    t0 = time.time()
    ok = tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, ts)
    assert ok, "batch verification must pass on valid proofs"
    log(f"[bench] warmup verify in {time.time() - t0:.1f}s")

    # soundness sanity: one tampered proof must fail the whole batch
    bad = bytearray(pfs[k // 2])
    bad[13] ^= 0x04
    assert not tpukzg.verify_blob_kzg_proof_batch(
        blobs, cs, pfs[: k // 2] + [bytes(bad)] + pfs[k // 2 + 1:], ts), \
        "tampered proof must fail"

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
