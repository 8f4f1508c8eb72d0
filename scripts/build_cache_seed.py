"""Build the committed XLA-cache seed (.jax_cache_seed/) from a cache
directory populated by COLD runs on THIS host (VERDICT r3 next-round #7:
the previous seed shipped without MANIFEST.json, so cachefix.seed()
correctly refused to copy anything and the multichip dryrun paid two
~6-minute compiles every round).

Usage:
    python scripts/build_cache_seed.py --src /tmp/seedcache \
        [--backend cpu] [--max-mb 200]

Writes every entry (small-first until the size budget) plus
MANIFEST.json = {jaxlib, cpu_features (this host's /proc/cpuinfo flags),
entries: {name: backend}} — matching the gating contract in
utils/cachefix.py:seed().  Entries compiled on this host are by
construction runnable on any host whose CPU features are a superset.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))

from tpukzg.utils.cachefix import _host_cpu_flags  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--backend", default="cpu",
                    help="backend label recorded for every entry in --src")
    ap.add_argument("--max-mb", type=float, default=200.0)
    ap.add_argument("--dst", default=os.path.join(REPO, ".jax_cache_seed"))
    ap.add_argument("--merge", action="store_true",
                    help="keep existing seed entries (union); default wipes")
    args = ap.parse_args()

    import jaxlib.version

    entries = {}
    if args.merge and os.path.exists(os.path.join(args.dst, "MANIFEST.json")):
        with open(os.path.join(args.dst, "MANIFEST.json")) as f:
            old = json.load(f)
        if old.get("jaxlib") == jaxlib.version.__version__:
            entries = old.get("entries", {})
    elif os.path.isdir(args.dst):
        shutil.rmtree(args.dst)
    os.makedirs(args.dst, exist_ok=True)

    cand = [(os.path.getsize(os.path.join(args.src, n)), n)
            for n in os.listdir(args.src)
            if n != "MANIFEST.json"
            and os.path.isfile(os.path.join(args.src, n))]
    cand.sort()  # small first: many cheap programs beat one giant one
    budget = int(args.max_mb * (1 << 20))
    used = sum(os.path.getsize(os.path.join(args.dst, n))
               for n in entries if os.path.exists(os.path.join(args.dst, n)))
    copied = 0
    for size, name in cand:
        if used + size > budget:
            continue
        shutil.copy2(os.path.join(args.src, name),
                     os.path.join(args.dst, name))
        entries[name] = args.backend
        used += size
        copied += 1

    manifest = {"jaxlib": jaxlib.version.__version__,
                "cpu_features": sorted(_host_cpu_flags()),
                "entries": entries}
    with open(os.path.join(args.dst, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=0)
    print(f"seed: {copied} new entries, {len(entries)} total, "
          f"{used / (1 << 20):.1f} MB, jaxlib {manifest['jaxlib']}")


if __name__ == "__main__":
    main()
