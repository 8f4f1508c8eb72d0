"""Headline benchmark: batched KZG blob-proof verifications/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/target}

vs_baseline is measured against the driver's north-star target of 1e6
batched verifications/sec on a v5p-16 slice (BASELINE.json:5; the
reference publishes no numbers of its own — BASELINE.md).  This harness
runs on whatever single chip is visible.

Designed to finish COLD within a tight driver budget (round 1 timed out):
* `Setup.load` is pure numpy — the SRS npz (committed, .srs_cache/)
  carries the Miller-line precompute, so setup costs no device compile.
* Proof generation is NOT paid here: pre-generated (commitment, proof)
  fixtures are committed (bench/fixtures/, see bench/make_fixtures.py);
  blobs regenerate deterministically from the seed in the fixture.
* The JSON line is emitted right after the first timed rep and also from
  a SIGTERM/SIGINT handler, so even a run killed by the driver's timeout
  still reports whatever it measured.

Env knobs: TPUKZG_BENCH_N (blob size, default 4096),
           TPUKZG_BENCH_K (batch size, default 256),
           TPUKZG_BENCH_REPS (timed repetitions, default 10),
           TPUKZG_BENCH_BUDGET (soft wall-clock budget secs, default 480).
"""

import json
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("TPUKZG_CACHE_DIR", os.path.join(REPO, ".srs_cache"))
# Kernel lowering defaults (Fp KS carries, KS fold chain, Pallas bucket
# scan, Pallas fraction-tree eval on TPU; scan/loop/xla on CPU) are the
# LIBRARY's earned per-backend defaults as of round 5 — utils/config.py
# and field/mont.py resolve them from the active backend, so the bench
# needs no env pinning and the CPU-fallback path automatically gets the
# compile-lean lowerings.  TPUKZG_* env vars still override.

# Big-stack thread for XLA compile + executable (de)serialization: both
# overflow the default 8 MB stack on this library's large modules
# (utils/cachefix.py).
from tpukzg.utils import cachefix  # noqa: E402

cachefix.install()
cachefix.seed(REPO)  # committed cache entries -> fresh-clone warm start

TARGET = 1e6  # verifications/sec north star (BASELINE.json:5)
_T0 = time.time()

_state = {"emitted": False, "best": None, "k": 0, "n": 0, "phase": "init",
          "plat": "1 chip"}


def log(*a):
    print(f"[bench {time.time() - _T0:7.1f}s]", *a, file=sys.stderr, flush=True)


def emit(value_vps):
    """Print the single JSON result line (idempotent)."""
    if _state["emitted"]:
        return
    _state["emitted"] = True
    print(json.dumps({
        "metric": "batched_kzg_blob_verifications_per_sec",
        "value": round(value_vps, 2),
        "unit": (f"verifications/s (k={_state['k']}, n={_state['n']}, "
                 f"{_state['plat']})"),
        "vs_baseline": round(value_vps / TARGET, 6),
    }), flush=True)


def _on_signal(signum, frame):
    # Killed by the driver's timeout: report what we have, if anything.
    if _state["best"]:
        emit(_state["k"] / _state["best"])
        log(f"killed by signal {signum} during {_state['phase']}; "
            "emitted partial result")
    else:
        log(f"killed by signal {signum} during {_state['phase']}; no result yet")
    sys.exit(1 if not _state["best"] else 0)


for _sig in (signal.SIGTERM, signal.SIGINT):
    signal.signal(_sig, _on_signal)


def gen_blobs(n: int, d: int, seed: int) -> list[bytes]:
    """d deterministic pseudo-random blobs (n 32-byte BE Fr elements each).
    Top 16-bit limb masked to 14 bits => every element < 2^254 < r.
    Must match bench/make_fixtures.py exactly."""
    import numpy as np
    rng = np.random.default_rng(seed)
    limbs = rng.integers(0, 1 << 16, size=(d, n, 16), dtype=np.uint32)
    limbs[..., 0] &= 0x3FFF
    b = np.empty((d, n, 32), np.uint8)
    b[..., 0::2] = (limbs >> 8).astype(np.uint8)
    b[..., 1::2] = (limbs & 0xFF).astype(np.uint8)
    return [b[i].tobytes() for i in range(d)]


def fixture_path(n: int, distinct: int) -> str:
    return os.path.join(REPO, "bench", "fixtures",
                        f"triples_n{n}_d{distinct}.npz")


def _tpu_alive(probe_timeout_s: int) -> bool:
    """Probe the tunneled TPU in a SUBPROCESS: a wedged tunnel hangs
    jax backend init indefinitely (observed 2026-08-17), and that must
    not take the bench down with rc=124 and no output."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            timeout=probe_timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    probe_s = int(os.environ.get("TPUKZG_BENCH_TPU_PROBE_S", "240"))
    on_tpu = _tpu_alive(probe_s)
    if not on_tpu:
        log(f"TPU tunnel unavailable after {probe_s}s probe — "
            "falling back to CPU so a result line still emits")
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if not on_tpu:
        try:
            from jax._src import xla_bridge as _xb
            _xb._backend_factories.pop("axon", None)
        except Exception:
            pass
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    import numpy as np
    import tpukzg

    n = int(os.environ.get("TPUKZG_BENCH_N", "4096"))
    k = int(os.environ.get("TPUKZG_BENCH_K", "256"))
    reps = int(os.environ.get("TPUKZG_BENCH_REPS", "10"))
    budget = float(os.environ.get("TPUKZG_BENCH_BUDGET", "480"))
    distinct = min(k, int(os.environ.get("TPUKZG_BENCH_DISTINCT", "16")))
    _state.update(k=k, n=n,
                  plat="1 chip" if on_tpu else "CPU FALLBACK, tunnel down")
    log(f"devices={jax.devices()} n={n} k={k} distinct={distinct}")

    _state["phase"] = "setup-load"
    ts = tpukzg.generate_insecure_setup(0xDEADBEEF, n)
    log("setup ready")

    # --- fixtures: pre-generated (blob, commitment, proof) triples ---
    _state["phase"] = "fixtures"
    fp = fixture_path(n, distinct)
    if os.path.exists(fp):
        z = np.load(fp)
        seed = int(z["seed"])
        base_blobs = gen_blobs(n, distinct, seed)
        base_cs = [z["commitments"][i].tobytes() for i in range(distinct)]
        base_pfs = [z["proofs"][i].tobytes() for i in range(distinct)]
        log(f"fixtures loaded from {os.path.relpath(fp, REPO)}")
    else:
        log(f"NO fixtures at {fp}; generating on device (slow path)")
        base_blobs = gen_blobs(n, distinct, 0x5EED)
        base_cs = tpukzg.blob_to_kzg_commitment_batch(base_blobs, ts)
        base_pfs = tpukzg.compute_blob_kzg_proof_batch(base_blobs, base_cs, ts)
    blobs = [base_blobs[i % distinct] for i in range(k)]
    cs = [base_cs[i % distinct] for i in range(k)]
    pfs = [base_pfs[i % distinct] for i in range(k)]

    # --- micro-warmup: k=8 first (VERDICT r3 next-round #8) ---
    # Compiles shape-specialized k=8 programs in seconds and, crucially,
    # gives the SIGTERM handler a nonzero verifications/s lower bound
    # BEFORE the expensive k=256 warmup compiles start — a driver
    # timeout at any point after this still yields parsed != null.
    _state["phase"] = "micro-warmup"
    km = min(8, k)
    t0 = time.time()
    ok = tpukzg.verify_blob_kzg_proof_batch(blobs[:km], cs[:km], pfs[:km], ts)
    assert ok, "micro batch verification must pass on valid proofs"
    micro = time.time() - t0
    _state["best"], _state["k"] = micro, km     # pessimistic lower bound
    log(f"micro-warmup (k={km}) in {micro:.1f}s")

    # --- warmup (compiles the full-k verify pipeline) ---
    _state["phase"] = "warmup-verify"
    t0 = time.time()
    ok = tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, ts)
    assert ok, "batch verification must pass on valid proofs"
    warm = time.time() - t0
    log(f"warmup verify in {warm:.1f}s")
    # even the warmup run is a legal (pessimistic) measurement
    _state["best"], _state["k"] = warm, k

    # --- timed reps: 3-stage software-pipelined steady state ---
    # Schedule (kzg/blob.py _PendingBatch): at step i, dispatch batch
    # i+1's upload-bound front half, then batch i's y-sync + verify
    # dispatch (stage2, non-blocking), then sync batch i-1's verdict
    # (long since computed).  The device queue never drains; sustained
    # serving throughput is the metric BASELINE.json:2 names.  Per-rep
    # stage2-blocking times are logged too for comparison.
    times = []
    done_reps = 0
    t_pipe0 = time.time()
    pend = [tpukzg.verify_blob_kzg_proof_batch_pipeline(blobs, cs, pfs, ts)]
    stop_at = reps
    i = 0
    while i < stop_at:
        _state["phase"] = f"rep-{i}"
        t0 = time.time()
        if i + 1 < stop_at:
            pend.append(tpukzg.verify_blob_kzg_proof_batch_pipeline(
                blobs, cs, pfs, ts))
        pend[i].stage2()
        if i > 0:
            assert pend[i - 1].result()
            done_reps = i
            _state["best"] = (time.time() - t_pipe0) / done_reps
        times.append(time.time() - t0)
        log(f"rep {i}: step {times[-1]:.3f}s, "
            f"sustained {_state['best']:.3f}s/rep" if i > 0 else
            f"rep {i}: step {times[-1]:.3f}s (pipeline fill)")
        # The wall budget is for the COLD-compile phases; steady-state
        # reps cost ~a second each and the pipelined rate only converges
        # with >= 3 reps — allow a measurement window past the budget.
        if (time.time() - _T0 > budget
                and time.time() - t_pipe0 > 5 * max(times)
                and i + 1 < stop_at):
            log("budget reached; stopping reps early")
            stop_at = i + 2  # one more front already dispatched: drain it
        i += 1
    # drain the tail of the pipeline
    assert pend[-1].result()
    done_reps = len(pend)
    # honest sustained rate: total wall INCLUDING every dispatch and the
    # pipeline fill/drain edges, divided by completed reps
    _state["best"] = (time.time() - t_pipe0) / done_reps

    # soundness sanity: one tampered proof must fail the whole batch
    # (after the reps so a tight budget still yields a perf number first)
    if time.time() - _T0 < budget:
        _state["phase"] = "tamper-check"
        bad = bytearray(pfs[k // 2])
        bad[13] ^= 0x04
        assert not tpukzg.verify_blob_kzg_proof_batch(
            blobs, cs, pfs[: k // 2] + [bytes(bad)] + pfs[k // 2 + 1:], ts), \
            "tampered proof must fail"
        log("tamper check ok")

    best = _state["best"] if times else warm
    vps = k / best
    log(f"block_times={['%.3f' % t for t in times]} sustained={best:.3f}s "
        f"=> {vps:.1f} verifications/s")
    emit(vps)


if __name__ == "__main__":
    main()
