"""Per-kernel benchmark harness with roofline comparison (SURVEY comp. 30).

Usage:  python bench/run.py [--kernels montmul,ecadd,msm,ntt,pairing,batch]
                            [--n 1048576] [--out bench/results.jsonl]

Each kernel is timed steady-state (warmup + best-of-R) on the default
device, and the record of SURVEY.md section 5.5 is appended to the JSONL
output (config, chips, wall_s, ops/s, %SoL).  bench.py at the repo root
stays the single-line headline wrapper; this file is the full sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("TPUKZG_CACHE_DIR", os.path.join(REPO, ".srs_cache"))


def _timeit(f, *args, reps=10):
    import jax
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_montmul(n):
    import jax, numpy as np
    from tpukzg.field.mont import FP
    from bench.roofline import V5E, sol_montmul_per_s, pct
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 16, size=(n, FP.L), dtype=np.uint32)
    b = rng.integers(0, 1 << 16, size=(n, FP.L), dtype=np.uint32)
    t = _timeit(FP.mul, a, b)
    rate = n / t
    return {"kernel": "montmul_fp", "n": n, "wall_s": t,
            "ops_per_s": rate, "pct_sol": pct(rate, sol_montmul_per_s(V5E, FP.L))}


def bench_ecadd(n):
    import numpy as np
    from tpukzg.curve.g1 import G1
    from bench.roofline import V5E, sol_ec_adds_per_s, pct
    p = G1.gen((n,))
    q = G1.double(p)
    t = _timeit(G1.add, p, q)
    rate = n / t
    return {"kernel": "g1_add_complete", "n": n, "wall_s": t,
            "ops_per_s": rate, "pct_sol": pct(rate, sol_ec_adds_per_s(V5E))}


def bench_msm(n, c=None):
    import numpy as np
    from tpukzg.field.mont import FR
    from tpukzg.curve.g1 import G1
    from tpukzg.msm.pippenger import Pippenger, default_window
    from bench.roofline import V5E, sol_msm_per_s, msm_ec_adds, sol_ec_adds_per_s, pct
    c = c or default_window(n)
    rng = np.random.default_rng(0)
    ks = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    ks[:, -1] &= 0x7FFF
    base = G1.gen((n,))  # same point n times; timing-equivalent to random
    pip = Pippenger(G1)
    t = _timeit(lambda p_, k_: pip._jit(p_, k_, c=c), base, ks, reps=5)
    adds = msm_ec_adds(n, c)
    return {"kernel": "pippenger_msm_g1", "n": n, "window": c, "wall_s": t,
            "msm_per_s": 1.0 / t, "point_adds_per_s": adds / t,
            "pct_sol": pct(1.0 / t, sol_msm_per_s(V5E, n, c))}


def bench_ntt(n):
    import numpy as np
    from tpukzg.field.mont import FR
    from tpukzg.ntt.ntt import get_plan
    from bench.roofline import V5E, sol_montmul_per_s, pct
    plan = get_plan(n)
    rng = np.random.default_rng(0)
    v = rng.integers(0, 1 << 14, size=(n, 16), dtype=np.uint32)
    t = _timeit(plan.ntt, v)
    muls = n // 2 * (n.bit_length() - 1)
    return {"kernel": "ntt_fr", "n": n, "wall_s": t, "ntt_per_s": 1.0 / t,
            "pct_sol": pct(muls / t, sol_montmul_per_s(V5E, 16))}


def bench_pairing():
    import numpy as np
    from tpukzg.curve.g1 import G1
    from tpukzg.curve.g2 import G2
    from tpukzg.pairing.check import pairing
    t = _timeit(pairing, G1.gen(), G2.gen(), reps=5)
    return {"kernel": "pairing", "wall_s": t, "pairings_per_s": 1.0 / t}


def bench_batch(k=64, n=4096):
    import tpukzg, numpy as np
    from tpukzg.field.mont import R_MOD
    ts = tpukzg.generate_insecure_setup(0xDEADBEEF, n)
    rng = np.random.default_rng(1)
    blobs = [b"".join(int(x % R_MOD).to_bytes(32, "big")
                      for x in rng.integers(0, 1 << 62, size=n))
             for _ in range(k)]
    cs = [tpukzg.blob_to_kzg_commitment(b, ts) for b in blobs]
    pfs = [tpukzg.compute_blob_kzg_proof(b, c, ts) for b, c in zip(blobs, cs)]
    t = _timeit(lambda: tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, ts),
                reps=3)
    return {"kernel": "verify_blob_kzg_proof_batch", "k": k, "n": n,
            "wall_s": t, "verifications_per_s": k / t}


KERNELS = {"montmul": lambda a: bench_montmul(a.n),
           "ecadd": lambda a: bench_ecadd(a.n),
           "msm": lambda a: bench_msm(a.n),
           "ntt": lambda a: bench_ntt(min(a.n, 1 << 18)),
           "pairing": lambda a: bench_pairing(),
           "batch": lambda a: bench_batch()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernels", default="montmul,ecadd,msm,ntt,pairing")
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--out", default=os.path.join(REPO, "bench", "results.jsonl"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    meta = {"device": str(jax.devices()[0]), "ts": time.time()}
    for name in args.kernels.split(","):
        rec = KERNELS[name.strip()](args)
        rec.update(meta)
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
