"""Per-kernel benchmark harness with roofline comparison (SURVEY comp. 30).

Usage:  python bench/run.py [--kernels montmul,ecadd,msm,ntt,pairing,pipeline,batch]
                            [--n 1048576] [--out bench/results.jsonl]

Named BASELINE.json acceptance configs:
  * config 3 (BASELINE.json:9):  ``--kernels msm --n 1048576`` — 2^20-point
    G1 Pippenger through the production limb-major path, point-adds/s/chip.
  * config 4 (BASELINE.json:10): ``--kernels pipeline`` — 2^18-coeff
    NTT -> barycentric eval -> quotient -> commit MSM, one jitted program.

Each kernel is timed steady-state (warmup + best-of-R) on the default
device; records follow the utils/obs.metric_record schema (SURVEY 5.5)
with the utils/config dataclasses embedded, appended to JSONL.  RESULTS.md
tables regenerate from that JSONL via bench/report.py — no hand-edited
numbers.  bench.py at the repo root stays the single-line headline wrapper.
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

from tpukzg.utils.obs import get_logger, metric_record, trace, dump_jsonl  # noqa: E402
from tpukzg.utils.config import (FieldConfig, MsmConfig, ScanConfig,  # noqa: E402
                                 NttConfig, as_json_dict)

LOG = get_logger("bench")


def _timeit(f, *args, reps=10, name="kernel"):
    import jax
    with trace(f"warmup/{name}", LOG):
        out = f(*args)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        with trace(name, LOG):
            out = f(*args)
            jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _configs():
    import os
    d = as_json_dict(FieldConfig.from_env(), MsmConfig.from_env(),
                     ScanConfig.from_env(), NttConfig.from_env())
    d["fold_carry"] = os.environ.get("TPUKZG_FOLD_CARRY", "scan")
    d["eval_impl"] = os.environ.get("TPUKZG_EVAL_IMPL", "(default)")
    return d


def _g1_expected_multiple(got_pt, k_int):
    """check bit: does `got_pt` (projective G1 tuple) equal [k_int]G1?
    One device scalar-mul + normalized compare (VERDICT r4 #4: a bench
    row without a pass/fail bit is half an artifact)."""
    import numpy as np
    from tpukzg.field.mont import FR
    from tpukzg.curve.g1 import G1
    expect = G1.scalar_mul(G1.gen(), np.asarray(FR.from_int(k_int)))
    xa, ya, ia = (np.asarray(v) for v in G1.normalize(got_pt))
    xb, yb, ib = (np.asarray(v) for v in G1.normalize(expect))
    if bool(ia) or bool(ib):
        return bool(ia) == bool(ib)
    return bool(np.array_equal(xa, xb) and np.array_equal(ya, yb))


CHAIN = 16  # dependent-op chain length for the micro benches


def _rand_canonical(rng, n, params):
    """(n, L) canonical residues < p (host bignum mod) — differential
    check bits need in-range inputs: for x >= p the XLA and Pallas
    REDC paths may return different (both correct) representatives."""
    import numpy as np
    ints = [int.from_bytes(rng.bytes(params.L * 2), "big") % params.modulus
            for _ in range(n)]
    return np.asarray(params.from_int(ints), np.uint32)


def bench_montmul(n):
    """Chained jitted montmul: x <- x*b, CHAIN times, on DEVICE-resident
    inputs.  One rep of the r4 version re-uploaded both numpy operands
    through the tunnel (measured 0.73 s/call under load, pure transfer)
    and a single dispatch is also exposed to the experimental axon
    client's identical-call fast path (see bench_ecadd) — a dependent
    chain on device buffers measures the kernel."""
    import jax
    import numpy as np
    from tpukzg.field.mont import FP
    from bench.roofline import V5E, sol_montmul_per_s, pct
    rng = np.random.default_rng(0)
    a = jax.device_put(_rand_canonical(rng, n, FP))
    b = jax.device_put(_rand_canonical(rng, n, FP))

    @jax.jit
    def chain(x, y):
        return jax.lax.fori_loop(0, CHAIN, lambda i, acc: FP._mul(acc, y), x)

    t = _timeit(chain, a, b, name="montmul")
    rate = n * CHAIN / t
    return {"kernel": "montmul_fp", "n": n, "chain": CHAIN,
            "ops_per_s": rate,
            **metric_record(config=_configs(), chips=1, hosts=1, wall_s=t,
                            sol_flop=pct(rate, sol_montmul_per_s(V5E, FP.L)))}


def bench_montmul_mxu(n):
    """MXU-REDC montmul prototype (field/mxu.py) vs the VPU path."""
    import jax
    import numpy as np
    from tpukzg.field.mont import FP
    from tpukzg.field.mxu import montmul_mxu
    from bench.roofline import V5E, sol_montmul_per_s, pct
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 16, size=(n, FP.L), dtype=np.uint32)
    b = rng.integers(0, 1 << 16, size=(n, FP.L), dtype=np.uint32)
    f = jax.jit(lambda x, y: montmul_mxu(x, y, FP))
    t = _timeit(f, a, b, name="montmul_mxu")
    rate = n / t
    return {"kernel": "montmul_fp_mxu", "n": n, "ops_per_s": rate,
            **metric_record(config=_configs(), chips=1, hosts=1, wall_s=t,
                            sol_flop=pct(rate, sol_montmul_per_s(V5E, FP.L)))}


def bench_ecadd(n):
    """Chained complete adds: acc <- acc + [2]G, CHAIN times, jitted as
    one fori_loop.  A single G1.add dispatch measured 42 us (5319% of
    speed-of-light — impossible): the experimental axon tunnel client
    short-circuits a repeated identical (executable, buffers) call, so
    single-dispatch timings on device-resident args are invalid.  The
    dependent chain defeats that and amortizes dispatch."""
    import jax
    from tpukzg.curve.g1 import G1
    from bench.roofline import V5E, sol_ec_adds_per_s, pct
    p = G1.gen((n,))
    q = G1.double(p)

    @jax.jit
    def chain(acc, step):
        return jax.lax.fori_loop(
            0, CHAIN, lambda i, a: G1._add(a, step), acc)

    t = _timeit(chain, p, q, name="ecadd")
    # check bit: G + CHAIN * [2]G = [2*CHAIN + 1]G in every lane
    out = chain(p, q)
    ok = _g1_expected_multiple(tuple(c[0] for c in out), 2 * CHAIN + 1)
    assert ok, "chained G + k[2]G != [2k+1]G"
    rate = n * CHAIN / t
    return {"kernel": "g1_add_complete", "n": n, "chain": CHAIN,
            "ops_per_s": rate,
            "check": "pass" if ok else "FAIL",
            **metric_record(config=_configs(), chips=1, hosts=1, wall_s=t,
                            sol_flop=pct(rate, sol_ec_adds_per_s(V5E)))}


def bench_msm(n, c=None):
    """BASELINE config 3 at n=2^20: production limb-major Pippenger."""
    import numpy as np
    from tpukzg.curve.g1 import G1
    from tpukzg.msm.pippenger import default_window
    from tpukzg.msm.pippenger_lm import PippengerLM
    from bench.roofline import V5E, sol_msm_per_s, msm_ec_adds, pct
    mc = MsmConfig.from_env()
    c = c or mc.window or default_window(n)
    rng = np.random.default_rng(0)
    ks = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    ks[:, -1] &= 0x7FFF
    base = G1.gen((n,))  # same point n times; timing-equivalent to random
    pip = PippengerLM(window=mc.window, window_chunk=mc.window_chunk)
    reps = int(os.environ.get("TPUKZG_BENCH_MSM_REPS", "3"))
    t = _timeit(lambda p_, k_: pip.msm(p_, k_, c=c), base, ks, reps=reps,
                name="msm")
    # correctness bit: all points are G, so MSM == [sum k_i mod r] G
    from tpukzg.field.mont import R_MOD
    col = [int(ks[:, j].astype(np.uint64).sum()) for j in range(16)]
    k_sum = sum(v << (16 * j) for j, v in enumerate(col)) % R_MOD
    ok = _g1_expected_multiple(pip.msm(base, ks, c=c), k_sum)
    assert ok, "MSM result != [sum k_i]G"
    adds = msm_ec_adds(n, c)
    return {"kernel": "pippenger_msm_g1_lm", "n": n, "window": c,
            "msm_per_s": 1.0 / t, "check": "pass" if ok else "FAIL",
            **metric_record(config=_configs(), chips=1, hosts=1, wall_s=t,
                            point_adds_per_s_chip=adds / t,
                            sol_flop=pct(1.0 / t, sol_msm_per_s(V5E, n, c)))}


def bench_ntt(n):
    import numpy as np
    from tpukzg.ntt.ntt import get_plan
    from bench.roofline import V5E, sol_montmul_per_s, pct
    plan = get_plan(n)
    rng = np.random.default_rng(0)
    v = rng.integers(0, 1 << 14, size=(n, 16), dtype=np.uint32)
    t = _timeit(plan.ntt, v, name="ntt")
    # check bits: (a) eval at w^0 = 1 is the coefficient sum (host bignum),
    # (b) intt(ntt(v)) round-trips exactly.
    from tpukzg.field.mont import FR, R_MOD
    ev = plan.ntt(v)
    coeff_sum = sum(FR.to_int(row) for row in np.asarray(FR.from_mont(v))) \
        % R_MOD
    ok = FR.to_int(np.asarray(FR.from_mont(ev))[0]) == coeff_sum
    ok &= bool(np.array_equal(np.asarray(plan.intt(ev)), np.asarray(v)))
    assert ok, "ntt failed p(1)=sum(coeffs) or intt round-trip"
    muls = n // 2 * (n.bit_length() - 1)
    return {"kernel": "ntt_fr", "n": n, "ntt_per_s": 1.0 / t,
            "impl": NttConfig.from_env().impl,
            "check": "pass" if ok else "FAIL",
            **metric_record(config=_configs(), chips=1, hosts=1, wall_s=t,
                            sol_flop=pct(muls / t, sol_montmul_per_s(V5E, 16)))}


def bench_pairing():
    import numpy as np
    from tpukzg.field.mont import FR
    from tpukzg.curve.g1 import G1
    from tpukzg.curve.g2 import G2
    from tpukzg.pairing.check import pairing
    t = _timeit(pairing, G1.gen(), G2.gen(), reps=5, name="pairing")
    # check bit: bilinearity e([2]G1, G2) == e(G1, [2]G2) — a broken
    # Miller loop / final exp cannot satisfy this by accident
    two = np.asarray(FR.from_int(2))
    lhs = pairing(G1.scalar_mul(G1.gen(), two), G2.gen())
    rhs = pairing(G1.gen(), G2.scalar_mul(G2.gen(), two))
    ok = bool(np.array_equal(np.asarray(lhs), np.asarray(rhs)))
    assert ok, "pairing bilinearity e([2]P,Q) == e(P,[2]Q) failed"
    return {"kernel": "pairing", "pairings_per_s": 1.0 / t,
            "check": "pass" if ok else "FAIL",
            **metric_record(config=_configs(), chips=1, hosts=1, wall_s=t)}


def bench_pipeline(n=1 << 18):
    """BASELINE config 4 (BASELINE.json:10): full coefficient-form open —
    2^18-coeff NTT to evaluation form + barycentric eval + evaluation-form
    quotient + commit MSM, ONE jitted program.  The SRS basis is the
    generator broadcast n times: timing-equivalent to a real SRS (MSM cost
    is independent of point values) without a 2^18 trusted-setup build."""
    import jax
    import numpy as np
    from tpukzg.field.mont import FR
    from tpukzg.curve.g1 import G1
    from tpukzg.ntt.ntt import get_plan
    from tpukzg.poly.poly import barycentric_eval, eval_form_quotient
    from tpukzg.msm.pippenger import default_window
    from tpukzg.msm.pippenger_lm import PippengerLM
    from bench.roofline import V5E, sol_msm_per_s, msm_ec_adds, pct

    mc = MsmConfig.from_env()
    c = mc.window or default_window(n)
    plan = get_plan(n)
    pip = PippengerLM(window=mc.window, window_chunk=mc.window_chunk)
    pts = G1.gen((n,))

    def quotient_part(coeffs_mont, z_mont):
        evals = plan._ntt(coeffs_mont)
        y = barycentric_eval(plan, evals, z_mont)
        q = eval_form_quotient(plan, evals, z_mont, y)
        return FR.from_mont(q), y

    # Two chained dispatches: the fused single program at 2^18 exceeds
    # device memory at runtime (the MSM scan holds ~30 live (L, 1, n)
    # intermediates); the MSM half runs through the point-chunked path.
    jfn = jax.jit(quotient_part)

    def open_coeff(points, coeffs_mont, z_mont):
        q_can, y = jfn(coeffs_mont, z_mont)
        return pip.msm(points, q_can, c=c), y

    rng = np.random.default_rng(0)
    coeffs = rng.integers(0, 1 << 14, size=(n, 16), dtype=np.uint32)
    z = np.asarray(FR.to_mont_host(0x5EED5EED))
    reps_p = int(os.environ.get("TPUKZG_BENCH_MSM_REPS", "3"))
    t = _timeit(open_coeff, pts, coeffs, z, reps=reps_p, name="pipeline")
    # correctness bit: the SRS base is G repeated, so the commit MSM must
    # equal [sum q_i mod r] G for the quotient q the device computed.
    from tpukzg.field.mont import R_MOD
    (pi, _y) = open_coeff(pts, coeffs, z)
    q_can, _ = jfn(coeffs, z)
    qc = np.asarray(q_can)
    col = [int(qc[:, j].astype(np.uint64).sum()) for j in range(16)]
    q_sum = sum(v << (16 * j) for j, v in enumerate(col)) % R_MOD
    ok = _g1_expected_multiple(pi, q_sum)
    assert ok, "pipeline commit != [sum q_i]G"
    adds = msm_ec_adds(n, c)
    return {"kernel": "open_coeff_pipeline", "n": n, "window": c,
            "opens_per_s": 1.0 / t, "check": "pass" if ok else "FAIL",
            **metric_record(config=_configs(), chips=1, hosts=1, wall_s=t,
                            point_adds_per_s_chip=adds / t,
                            sol_flop=pct(1.0 / t, sol_msm_per_s(V5E, n, c)))}


def bench_eval(k=256, n=4096):
    """Batched barycentric eval at the production verify shape — the
    phase VERDICT r4 #3 targets (<= 0.10 s).  Lowering selected by
    TPUKZG_EVAL_IMPL (xla | pallas fraction-tree kernel); correctness
    pinned against the pure-bignum golden barycentric formula."""
    import jax
    import numpy as np
    import golden.model as gold
    from tpukzg.field.mont import FR
    from tpukzg.ntt.ntt import get_plan
    from tpukzg.poly.poly import barycentric_eval
    from bench.roofline import V5E, sol_montmul_per_s, pct

    plan = get_plan(n)
    rng = np.random.default_rng(7)
    ev_int = rng.integers(0, 1 << 62, size=(k, n))
    evals = np.stack([FR.to_mont_host([int(v) for v in row])
                      for row in ev_int])
    z_int = [int(v) for v in rng.integers(1, 1 << 62, size=k)]
    z = np.stack([FR.to_mont_host(v) for v in z_int])
    f = jax.jit(lambda e, zz: barycentric_eval(plan, e, zz))
    t = _timeit(f, evals, z, name="eval")
    got = [FR.to_int(r) for r in np.asarray(FR.from_mont(f(evals, z)))[:2]]
    R = gold.R
    ok = True
    for i in range(2):
        s = sum(e * w % R * pow((z_int[i] - w) % R, -1, R)
                for e, w in zip(ev_int[i].tolist(), plan.roots_int)) % R
        expect = s * (pow(z_int[i], n, R) - 1) % R * pow(n, -1, R) % R
        ok &= got[i] == expect
    assert ok, "eval != golden barycentric"
    muls = 4 * n * k  # fraction-tree montmul count
    return {"kernel": "barycentric_eval", "n": n, "k": k,
            "evals_per_s": k / t, "check": "pass" if ok else "FAIL",
            **metric_record(config=_configs(), chips=1, hosts=1, wall_s=t,
                            sol_flop=pct(muls / t, sol_montmul_per_s(V5E, 16)))}


def bench_montmul_pallas(n):
    """The limb-major Pallas montmul kernel itself (SURVEY comp. 4) —
    the r1 'microbench ~67 M/s' claim as a committed row with a check
    bit (VERDICT r4 #7).  Inputs are CANONICAL residues (< p): for
    x >= p the Pallas and XLA REDC paths may return different — both
    correct — representatives, which is a bench artifact, not a kernel
    bug.  Chained + device-resident for the same reasons as
    bench_montmul/bench_ecadd."""
    import jax
    import numpy as np
    from tpukzg.field.mont import FP
    from tpukzg.pallas.montmul import montmul_lm_pallas
    from bench.roofline import V5E, sol_montmul_per_s, pct
    rng = np.random.default_rng(0)
    a = jax.device_put(np.ascontiguousarray(_rand_canonical(rng, n, FP).T))
    b = jax.device_put(np.ascontiguousarray(_rand_canonical(rng, n, FP).T))

    @jax.jit
    def chain(x, y):
        return jax.lax.fori_loop(
            0, CHAIN, lambda i, acc: montmul_lm_pallas(acc, y, FP), x)

    t = _timeit(chain, a, b, name="montmul_pallas")
    got = np.asarray(chain(a, b))

    @jax.jit
    def chain_xla(x, y):  # jitted reference: eager op chains are unsound
        return jax.lax.fori_loop(   # over the axon tunnel (see pairing())
            0, CHAIN, lambda i, acc: FP._mul(acc.T, y.T).T, x)

    ref = np.asarray(chain_xla(a, b))
    ok = bool(np.array_equal(got, ref))
    assert ok, "pallas montmul chain != FieldParams.mul chain"
    rate = n * CHAIN / t
    return {"kernel": "montmul_fp_pallas", "n": n, "chain": CHAIN,
            "ops_per_s": rate,
            "check": "pass" if ok else "FAIL",
            **metric_record(config=_configs(), chips=1, hosts=1, wall_s=t,
                            sol_flop=pct(rate, sol_montmul_per_s(V5E, FP.L)))}


def bench_batch(k=64, n=4096):
    import tpukzg
    import numpy as np
    from tpukzg.field.mont import R_MOD
    ts = tpukzg.generate_insecure_setup(0xDEADBEEF, n)
    rng = np.random.default_rng(1)
    blobs = [b"".join(int(x % R_MOD).to_bytes(32, "big")
                      for x in rng.integers(0, 1 << 62, size=n))
             for _ in range(k)]
    cs = tpukzg.blob_to_kzg_commitment_batch(blobs, ts)
    pfs = tpukzg.compute_blob_kzg_proof_batch(blobs, cs, ts)
    t = _timeit(lambda: tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, ts),
                reps=3, name="batch")
    return {"kernel": "verify_blob_kzg_proof_batch", "k": k, "n": n,
            **metric_record(config=_configs(), chips=1, hosts=1, wall_s=t,
                            verifications_per_s=k / t)}


KERNELS = {"montmul": lambda a: bench_montmul(a.n),
           "montmul_mxu": lambda a: bench_montmul_mxu(a.n),
           "montmul_pallas": lambda a: bench_montmul_pallas(a.n),
           "ecadd": lambda a: bench_ecadd(a.n),
           "msm": lambda a: bench_msm(a.n),
           "ntt": lambda a: bench_ntt(min(a.n, 1 << 18)),
           "eval": lambda a: bench_eval(),
           "pairing": lambda a: bench_pairing(),
           "pipeline": lambda a: bench_pipeline(),
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
        dump_jsonl(args.out, rec)


if __name__ == "__main__":
    main()
