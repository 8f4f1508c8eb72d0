"""Scaling-efficiency harness: 1 chip -> N chips -> multi-process
(BASELINE.json:2 third metric; SURVEY.md component 30 / section 4.5).

Single-process mode (default) times the sharded batch-verify and sharded
MSM on meshes of 1/2/4/8 devices and reports
    scaling_eff(N) = T(1) / (N * T(N))
as metric_record rows in bench/results.jsonl.  On real TPU slices the
devices are chips and the numbers are meaningful; on this box the mesh is
8 virtual CPU devices sharing one core (XLA_FLAGS forced below), which
validates the harness + sharded programs, and the rows are tagged
platform=cpu so bench/report.py keeps them apart from chip rows.

Multi-process mode (``--processes N``) spawns N local processes that meet
through `jax.distributed.initialize` (the DCN-path coordination SURVEY
section 4.5 calls for) and run the same sharded verify across process
boundaries; the parent records one row with hosts=N.

Usage:
    python bench/scaling.py [--devices 8] [--k 16] [--n 64]
    python bench/scaling.py --processes 2          # multi-process smoke
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)


def _env_setup(n_virtual: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_virtual}").strip()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    os.environ.setdefault("TPUKZG_CACHE_DIR", os.path.join(REPO, ".srs_cache"))


def _isolate_cpu():
    import jax
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


def _example(setup, k: int):
    import numpy as np
    from tpukzg.field.mont import FR
    rng = np.random.default_rng(0)
    lim = lambda s: rng.integers(0, 1 << 15, size=s + (16,), dtype=np.uint32)
    c_pts = tuple(np.asarray(c)[:1].repeat(k, axis=0) for c in setup.lagrange_g1)
    pi_pts = tuple(np.asarray(c)[:1].repeat(k, axis=0) for c in setup.monomial_g1)
    rho = np.asarray(FR.from_int([pow(5, i, FR.modulus) for i in range(k)]))
    return c_pts, lim((k,)), lim((k,)), pi_pts, rho


def _time_best(fn, reps=3):
    import jax
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def run_single_process(max_devices: int, k: int, n: int, out_path: str):
    _env_setup(max_devices)
    _isolate_cpu()
    import jax
    from tpukzg.utils import cachefix
    cachefix.install()
    from tpukzg.utils.obs import metric_record, dump_jsonl
    from tpukzg.kzg.setup import Setup
    from tpukzg.dist import MeshConfig, ShardedBatchVerifier

    setup = Setup.generate_insecure(0xDEADBEEF, n)
    base_t = None
    sizes = [d for d in (1, 2, 4, 8) if d <= max_devices]
    for nd in sizes:
        cfg = MeshConfig(n_devices=nd)
        mesh = cfg.build(jax.devices("cpu"))
        sbv = ShardedBatchVerifier(setup, cfg, mesh=mesh)
        args = _example(setup, k)
        t = _time_best(lambda: sbv.verify_batch(*args))
        if base_t is None:
            base_t = t
        eff = base_t / (nd * t)
        # harness-validation rows (VERDICT r4 #10): nd virtual devices
        # CONTEND for one CPU core, so scaling_eff here validates the
        # sharded programs, not hardware scaling — tagged so report
        # readers cannot mistake 0.04 for a measurement.
        rec = {"kernel": "sharded_batch_verify", "k": k, "n": n,
               "device": str(jax.devices("cpu")[0]),
               "ts": time.time(), "platform": "cpu", "contended": True,
               "row_kind": "harness-validation",
               **metric_record(config={"n_devices": nd}, chips=nd, hosts=1,
                               wall_s=t, verifications_per_s=k / t,
                               scaling_eff=eff)}
        print(json.dumps(rec), flush=True)
        dump_jsonl(out_path, rec)


def _worker(rank: int, nproc: int, port: int, k: int, n: int):
    """One jax.distributed process; rank 0 prints the verdict wall time."""
    _env_setup(1)
    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=rank)
    _isolate_cpu()
    from tpukzg.utils import cachefix
    cachefix.install()
    from tpukzg.kzg.setup import Setup
    from tpukzg.dist import MeshConfig, ShardedBatchVerifier

    setup = Setup.generate_insecure(0xDEADBEEF, n)
    cfg = MeshConfig(n_devices=nproc)
    mesh = cfg.build(jax.devices())          # one CPU device per process
    sbv = ShardedBatchVerifier(setup, cfg, mesh=mesh)
    args = _example(setup, k)
    # AOT-compile BEFORE the cross-process barrier: on a 1-core host the
    # two processes' compiles skew by minutes, and gloo's first
    # collective only waits ~30s for its peer (observed
    # DEADLINE_EXCEEDED).  Compile (no collectives), sync through the
    # coordination service, then execute together.
    from tpukzg.msm.pippenger import default_window
    c_win = default_window(3 * (k // nproc) + 1)
    fn = sbv._cache.setdefault(c_win, sbv._build(c_win))
    c_pts, z_can, y_can, pi_pts, rho_can = args
    compiled = fn.lower(c_pts, pi_pts, z_can, y_can, rho_can).compile()
    from jax._src import distributed
    # long-timeout barrier: under 1-core contention the peer's compile
    # can lag by many minutes, far past sync_global_devices' default
    distributed.global_state.client.wait_at_barrier(
        "tpukzg-scaling-compiled", timeout_in_ms=30 * 60 * 1000)
    t0 = time.perf_counter()
    ok = compiled(c_pts, pi_pts, z_can, y_can, rho_can)
    jax.block_until_ready(ok)
    if rank == 0:
        print(json.dumps({"kernel": "multiproc_batch_verify",
                          "hosts": nproc, "k": k, "n": n,
                          "platform": "cpu", "contended": True,
                          "row_kind": "harness-validation",
                          "wall_s": time.perf_counter() - t0}), flush=True)


def run_multi_process(nproc: int, k: int, n: int, out_path: str):
    port = 45677
    procs = []
    for r in range(1, nproc):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--worker", str(r),
             "--processes", str(nproc), "--port", str(port),
             "--k", str(k), "--n", str(n)]))
    try:
        _worker(0, nproc, port, k, n)
    finally:
        for p_ in procs:
            p_.wait(timeout=600)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--processes", type=int, default=0)
    ap.add_argument("--worker", type=int, default=-1)
    ap.add_argument("--port", type=int, default=45677)
    ap.add_argument("--out", default=os.path.join(REPO, "bench", "results.jsonl"))
    args = ap.parse_args()
    if args.worker >= 0:
        _worker(args.worker, args.processes, args.port, args.k, args.n)
    elif args.processes > 1:
        run_multi_process(args.processes, args.k, args.n, args.out)
    else:
        run_single_process(args.devices, args.k, args.n, args.out)


if __name__ == "__main__":
    main()
