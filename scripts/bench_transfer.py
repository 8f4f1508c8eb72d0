"""Host->device transfer microbench over the axon tunnel (r4 profile:
the 32 MB blob upload is 0.88s of a 1.8s rep — is 36 MB/s the relay's
real ceiling, and is it fixed-cost or linear?).

Measures device_put wall time vs payload size, one big array vs chunked,
and chunked-with-threads (the relay multiplexes TCP connections; jax may
or may not parallelize the stream).  Appends rows to bench/results.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

from tpukzg.utils import cachefix  # noqa: E402

cachefix.install()

import numpy as np  # noqa: E402
import jax  # noqa: E402


def log(*a):
    print("[xfer]", *a, file=sys.stderr, flush=True)


def timeit(fn, reps=3):
    jax.block_until_ready(fn())  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dev = jax.devices()[0]
    log("device", dev)
    rows = []
    rng = np.random.default_rng(0)
    for mb in (1, 4, 8, 16, 32, 64):
        a = rng.integers(0, 255, size=(mb << 20,), dtype=np.uint8)
        t = timeit(lambda a=a: jax.device_put(a, dev))
        rows.append({"kernel": "xfer_single", "mb": mb, "wall_s": t,
                     "mb_per_s": mb / t})
        log(f"single {mb:3d} MB: {t:.3f}s  {mb / t:6.1f} MB/s")
    # chunked sequential dispatch (async queueing, one stream)
    a = rng.integers(0, 255, size=(32 << 20,), dtype=np.uint8)
    for nch in (2, 4, 8):
        chunks = np.split(a, nch)
        t = timeit(lambda: [jax.device_put(c, dev) for c in chunks])
        rows.append({"kernel": "xfer_chunked", "mb": 32, "chunks": nch,
                     "wall_s": t, "mb_per_s": 32 / t})
        log(f"chunk x{nch} 32 MB: {t:.3f}s  {32 / t:6.1f} MB/s")
    # threaded parallel device_put
    import concurrent.futures as cf
    for nth in (2, 4):
        chunks = np.split(a, nth)
        ex = cf.ThreadPoolExecutor(nth)

        def par():
            futs = [ex.submit(jax.device_put, c, dev) for c in chunks]
            return [f.result() for f in futs]

        t = timeit(par)
        rows.append({"kernel": "xfer_threaded", "mb": 32, "threads": nth,
                     "wall_s": t, "mb_per_s": 32 / t})
        log(f"thread x{nth} 32 MB: {t:.3f}s  {32 / t:6.1f} MB/s")
    out = os.path.join(REPO, "bench", "results.jsonl")
    with open(out, "a") as f:
        for r in rows:
            r["device"] = str(dev)
            r["ts"] = time.time()
            f.write(json.dumps(r) + "\n")
    log(f"appended {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
