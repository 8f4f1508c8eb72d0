"""CLI: ``python -m tpukzg.cli <cmd>`` (SURVEY.md component 27).

Commands:
  gen-setup  --tau T --n N --out FILE     write an insecure dev SRS (.npz)
  selftest   [--n N]                      tiny end-to-end round trip
  bench      [--n N --k K --reps R]       headline benchmark JSON line
  verify     --setup FILE --blob FILE --commitment HEX --proof HEX
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _cmd_gen_setup(args):
    from tpukzg.kzg.setup import Setup
    from tpukzg.utils.config import KzgConfig

    n = args.n if args.n is not None else KzgConfig.from_env().degree
    s = Setup.generate_insecure(int(args.tau, 0), n)
    s.save(args.out)
    print(f"wrote n={n} SRS to {args.out}")


def _cmd_selftest(args):
    import random
    import tpukzg

    n = args.n
    t0 = time.time()
    ts = tpukzg.generate_insecure_setup(0xDEADBEEF, n)
    rng = random.Random(0x5EED)
    r = __import__("tpukzg.field.mont", fromlist=["R_MOD"]).R_MOD
    blobs = [b"".join(rng.randrange(r).to_bytes(32, "big") for _ in range(n))
             for _ in range(2)]
    cs = [tpukzg.blob_to_kzg_commitment(b, ts) for b in blobs]
    pfs = [tpukzg.compute_blob_kzg_proof(b, c, ts) for b, c in zip(blobs, cs)]
    assert tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, ts)
    assert not tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs[::-1], ts)
    print(f"selftest OK (n={n}, {time.time() - t0:.1f}s)")


def _cmd_bench(args):
    os.environ["TPUKZG_BENCH_N"] = str(args.n)
    os.environ["TPUKZG_BENCH_K"] = str(args.k)
    os.environ["TPUKZG_BENCH_REPS"] = str(args.reps)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, repo)
    import bench

    bench.main()


def _cmd_verify(args):
    import tpukzg

    ts = tpukzg.load_setup_file(args.setup)
    blob = open(args.blob, "rb").read()
    ok = tpukzg.verify_blob_kzg_proof(
        blob, bytes.fromhex(args.commitment), bytes.fromhex(args.proof), ts)
    print(json.dumps({"valid": bool(ok)}))
    sys.exit(0 if ok else 1)


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpukzg")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-setup", help="generate insecure dev SRS")
    g.add_argument("--tau", default="0xDEADBEEF")
    g.add_argument("--n", type=int, default=None,
                   help="degree; default from KzgConfig (TPUKZG_DEGREE)")
    g.add_argument("--out", required=True)
    g.set_defaults(fn=_cmd_gen_setup)

    s = sub.add_parser("selftest", help="tiny end-to-end round trip")
    s.add_argument("--n", type=int, default=16)
    s.set_defaults(fn=_cmd_selftest)

    b = sub.add_parser("bench", help="headline benchmark")
    b.add_argument("--n", type=int, default=4096)
    b.add_argument("--k", type=int, default=64)
    b.add_argument("--reps", type=int, default=3)
    b.set_defaults(fn=_cmd_bench)

    v = sub.add_parser("verify", help="verify one blob proof")
    v.add_argument("--setup", required=True)
    v.add_argument("--blob", required=True)
    v.add_argument("--commitment", required=True)
    v.add_argument("--proof", required=True)
    v.set_defaults(fn=_cmd_verify)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
