"""Regenerate the measured tables in RESULTS.md from bench/results.jsonl.

Usage: python bench/report.py [--jsonl bench/results.jsonl] [--md RESULTS.md]

RESULTS.md keeps its hand-written narrative; everything between the
``<!-- BEGIN GENERATED ... -->`` / ``<!-- END GENERATED -->`` markers is
owned by this script (SURVEY.md section 5.5: "RESULTS.md table regenerated
from JSON") and rewritten in place from the newest record per
(kernel, n, device-platform) key.  Pure stdlib — no JAX import.
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN GENERATED (bench/report.py; do not hand-edit) -->"
END = "<!-- END GENERATED -->"

RATE_FIELDS = ("verifications_per_s", "point_adds_per_s_chip", "ops_per_s",
               "msm_per_s", "ntt_per_s", "pairings_per_s", "opens_per_s")


def _fmt(v) -> str:
    if isinstance(v, float):
        if v == 0:
            return "0"
        if abs(v) >= 1e5 or abs(v) < 1e-3:
            return f"{v:.3g}"
        return f"{v:,.2f}".rstrip("0").rstrip(".")
    return str(v)


def _platform(rec: dict) -> str:
    d = rec.get("device", "")
    return "cpu" if "cpu" in d.lower() else "tpu"


def load_latest(path: str) -> list[dict]:
    """Newest record per (kernel, n, platform), insertion-ordered."""
    latest: dict = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            key = (rec.get("kernel"), rec.get("n"), _platform(rec))
            latest[key] = rec
    return list(latest.values())


def render(records: list[dict]) -> str:
    lines = [BEGIN, "",
             f"_Regenerated {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())} "
             f"from bench/results.jsonl ({len(records)} current rows)._", ""]
    lines += ["| kernel | n | platform | wall s | rate | %SoL (VPU) | extras |",
              "|---|---|---|---|---|---|---|"]
    for r in records:
        rate = ""
        for f_ in RATE_FIELDS:
            if f_ in r:
                rate = f"{_fmt(r[f_])} {f_.replace('_per_s', '')}/s"
                break
        extras = []
        for k in ("window", "k", "chips", "hosts", "scaling_eff"):
            if k in r and r[k] not in (1, None):
                extras.append(f"{k}={_fmt(r[k])}")
        sol = r.get("pct_sol_flop", r.get("pct_sol"))
        lines.append(
            f"| {r.get('kernel')} | {r.get('n', '')} | {_platform(r)} "
            f"| {_fmt(r.get('wall_s', ''))} | {rate} "
            f"| {_fmt(sol) if sol is not None else ''} "
            f"| {', '.join(extras)} |")
    lines += ["", END]
    return "\n".join(lines)


def splice(md_path: str, generated: str) -> None:
    with open(md_path) as f:
        text = f.read()
    if BEGIN in text and END in text:
        head = text[: text.index(BEGIN)]
        tail = text[text.index(END) + len(END):]
        text = head + generated + tail
    else:
        # first run: insert after the intro paragraph (first blank-blank gap)
        text = text.rstrip() + "\n\n## Measured (auto-generated)\n\n" + generated + "\n"
    with open(md_path, "w") as f:
        f.write(text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default=os.path.join(REPO, "bench", "results.jsonl"))
    ap.add_argument("--md", default=os.path.join(REPO, "RESULTS.md"))
    args = ap.parse_args()
    records = load_latest(args.jsonl)
    splice(args.md, render(records))
    print(f"[report] wrote {len(records)} rows into {args.md}")


if __name__ == "__main__":
    main()
