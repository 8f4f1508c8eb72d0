"""Phase-level profile of the headline batch-verify path (VERDICT r3 #1).

Times each device phase of `verify_blob_kzg_proof_batch` separately at the
production shape (k=256, n=4096 by default), steady-state (warmup + best of
R), so optimization effort goes where the wall time actually is:

  decompress   g1.decompress_batch over 2k compressed points
  stage_eval   blob bytes upload + staging + batched barycentric eval
  vb_msm       the 3k+1-point grouped MSM fold (ScanConfig-selected impl)
  vb_pair      2 Miller loops + final exp
  host_fs      host-side Fiat-Shamir hashing (z challenges + rho powers)
  e2e          the full public verify_blob_kzg_proof_batch call

Usage: python scripts/profile_phases.py [--k 256] [--n 4096] [--reps 3]
       [--out bench/results.jsonl] [--phases all|decompress,stage_eval,...]
Appends one JSONL record per phase (utils/obs schema) and prints them.
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

from tpukzg.utils import cachefix  # noqa: E402

cachefix.install()

if os.environ.get("TPUKZG_PROFILE_TRACEDUMP"):
    import faulthandler
    faulthandler.dump_traceback_later(90, repeat=True, file=sys.stderr)


def log(*a):
    print("[profile]", *a, file=sys.stderr, flush=True)


def _timeit(fn, reps):
    import jax
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    warm = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return warm, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--phases", default="all")
    ap.add_argument("--out", default=os.path.join(REPO, "bench", "results.jsonl"))
    args = ap.parse_args()
    want = (None if args.phases == "all"
            else set(args.phases.split(",")))

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    import numpy as np
    import tpukzg
    from tpukzg.field.mont import FR
    from tpukzg.kzg import transcript
    from tpukzg.curve import g1 as g1m
    from tpukzg.utils.obs import metric_record, dump_jsonl
    from tpukzg.utils.config import (ScanConfig, NttConfig, FieldImplConfig,
                                     FieldConfig, as_json_dict)

    k, n = args.k, args.n
    log(f"devices={jax.devices()} k={k} n={n} "
        f"scan={ScanConfig.from_env().impl} "
        f"montmul={FieldImplConfig.from_env().montmul}")
    t0 = time.time()
    ts = tpukzg.generate_insecure_setup(0xDEADBEEF, n)
    log(f"setup {time.time() - t0:.1f}s")

    # fixtures (same deterministic generator as bench.py's gen_blobs)
    fx = os.path.join(REPO, "bench", "fixtures", f"triples_n{n}_d16.npz")
    if not os.path.exists(fx):
        raise SystemExit(f"no fixtures at {fx}; run bench/make_fixtures.py")
    z = np.load(fx)
    seed = int(z["seed"])
    exec_globals = {"__file__": os.path.join(REPO, "bench.py")}
    src = open(os.path.join(REPO, "bench.py")).read()
    exec(compile(src.split("def main()")[0], "bench.py", "exec"), exec_globals)
    base_blobs = exec_globals["gen_blobs"](n, 16, seed)
    base_cs = [z["commitments"][i].tobytes() for i in range(16)]
    base_pfs = [z["proofs"][i].tobytes() for i in range(16)]
    log("fixtures loaded")
    blobs = [base_blobs[i % 16] for i in range(k)]
    cs = [base_cs[i % 16] for i in range(k)]
    pfs = [base_pfs[i % 16] for i in range(k)]

    bk = ts.blob  # BlobKzg engine
    kzg = bk.kzg

    # ---- materialized intermediates for isolated phase timing ----
    c_pts, pi_pts, _ok = bk._decompress_g1_two_async(cs, pfs)
    c_pts = tuple(np.asarray(x) for x in c_pts)
    pi_pts = tuple(np.asarray(x) for x in pi_pts)
    zs = [transcript.compute_challenge(blobs[i], cs[i], n) for i in range(k)]
    z_can = np.asarray(FR.from_int(zs)).reshape(k, 16)
    raw = np.stack([np.frombuffer(b, dtype=np.uint8).reshape(n, 32)
                    for b in blobs])
    if bk._stage_eval is None:
        bk._stage_eval = bk._build_stage_eval()
    z_mont_np = np.asarray(FR.to_mont(z_can))
    y_dev, _okr = bk._stage_eval(raw, z_mont_np)
    y_can = np.asarray(y_dev)
    from tpukzg.kzg.blob import fr_ints_from_limbs
    ys = fr_ints_from_limbs(y_can)
    _, rho_powers = transcript.compute_r_powers(cs, zs, ys, pfs, n)
    rho_can = np.asarray(FR.from_int(rho_powers)).reshape(k, 16)

    z_mont_dev = jax.device_put(z_mont_np)
    evals_mont = bk._stage(raw)[0]
    from tpukzg.poly.poly import barycentric_eval
    eval_jit = jax.jit(lambda e, z: barycentric_eval(kzg.plan, e, z))

    from tpukzg.msm.pippenger import default_window
    c_win = default_window(3 * k + 1)
    pts_g2 = tuple(np.concatenate([c, p, p], axis=0)[: 2 * k + 1]
                   for c, p in zip(c_pts, pi_pts))
    scal_g1 = rho_can
    scal_g2 = np.concatenate([rho_can, rho_can], axis=0)[: 2 * k + 1]

    phases = {
        "decompress": lambda: g1m.decompress_batch(list(cs) + list(pfs))[0],
        "stage_eval": lambda: bk._stage_eval(raw, z_mont_np),
        "stage_body": lambda: bk._stage(raw),
        "eval_only": lambda: eval_jit(evals_mont, z_mont_dev),
        "front_half": lambda: bk._stage_eval(raw, z_mont_np)[0],
        "msm_grp_k": lambda: kzg.pip._jit(pi_pts, scal_g1, c=c_win),
        "msm_grp_2k1": lambda: kzg.pip._jit(pts_g2, scal_g2, c=c_win),
        "vb_msm": lambda: kzg._vb_msm(c_pts, z_can, y_can, pi_pts, rho_can),
        "vb_pair": (lambda agg=kzg._vb_msm(c_pts, z_can, y_can, pi_pts,
                                           rho_can):
                    kzg._vb_pair(*agg)),
        "host_fs": lambda: (
            [transcript.compute_challenge(blobs[i], cs[i], n)
             for i in range(k)],
            transcript.compute_r_powers(cs, zs, ys, pfs, n)),
        "host_stack": lambda: np.stack(
            [np.frombuffer(b, dtype=np.uint8).reshape(n, 32) for b in blobs]),
        "e2e": lambda: tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, ts),
        "pipelined3": lambda: [
            r() for r in [tpukzg.verify_blob_kzg_proof_batch_async(
                blobs, cs, pfs, ts) for _ in range(3)]],
    }

    meta = {"device": str(jax.devices()[0]), "ts": time.time(), "k": k, "n": n}
    cfgs = as_json_dict(ScanConfig.from_env(), NttConfig.from_env(),
                        FieldImplConfig.from_env(), FieldConfig.from_env())
    cfgs["fold_carry"] = os.environ.get("TPUKZG_FOLD_CARRY", "scan")
    for name, fn in phases.items():
        if want is not None and name not in want:
            continue
        log(f"--- {name} ---")
        warm, best = _timeit(fn, args.reps)
        rec = {"kernel": f"phase_{name}", **meta,
               **metric_record(config=cfgs, chips=1, hosts=1, wall_s=best),
               "warm_s": round(warm, 3)}
        print(json.dumps(rec), flush=True)
        dump_jsonl(args.out, rec)
        log(f"{name}: warm={warm:.3f}s best={best:.3f}s")


if __name__ == "__main__":
    main()
