"""Generate committed bench fixtures: (commitment, proof) bytes for the
deterministic blobs of bench.py:gen_blobs.

Run once per (n, distinct) on a machine with the SRS cache warm:
    python bench/make_fixtures.py [n] [distinct]

The blobs themselves are NOT stored (distinct * n * 32 bytes); they
regenerate from the seed.  bench.py then never pays the prove path
(round 1's driver bench died inside it: 289 s warm for 16 proofs).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("TPUKZG_CACHE_DIR", os.path.join(REPO, ".srs_cache"))

from tpukzg.utils import cachefix  # noqa: E402

cachefix.install()

SEED = 0x5EED


def main():
    import numpy as np
    import tpukzg
    from bench_blobs_shim import gen_blobs  # noqa: F401 (see below)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    distinct = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    ts = tpukzg.generate_insecure_setup(0xDEADBEEF, n)
    blobs = gen_blobs(n, distinct, SEED)
    print(f"[fixtures] proving {distinct} blobs (n={n})...", flush=True)
    cs = tpukzg.blob_to_kzg_commitment_batch(blobs, ts)
    pfs = tpukzg.compute_blob_kzg_proof_batch(blobs, cs, ts)
    ok = tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, ts)
    assert ok, "generated fixtures must verify"

    out = os.path.join(REPO, "bench", "fixtures",
                       f"triples_n{n}_d{distinct}.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        seed=np.asarray(SEED),
        commitments=np.stack([np.frombuffer(c, np.uint8) for c in cs]),
        proofs=np.stack([np.frombuffer(p, np.uint8) for p in pfs]))
    print(f"[fixtures] wrote {out}", flush=True)


# bench.py owns the canonical gen_blobs; import it without a package.
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location("bench_blobs_shim",
                                     os.path.join(REPO, "bench.py"))
bench_blobs_shim = _ilu.module_from_spec(_spec)
sys.modules["bench_blobs_shim"] = bench_blobs_shim
_spec.loader.exec_module(bench_blobs_shim)

if __name__ == "__main__":
    main()
