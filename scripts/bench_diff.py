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
    ap.add_argument(
        "--normalize-cores",
        action="store_true",
        help="ADVISORY cross-epoch view: scale the old side by "
        "ec_old/ec_new before diffing (core-seconds, not wall).  Never "
        "gates -- a normalized 'regression' is a hint to re-measure "
        "within one epoch, not evidence of plan drift (per-query "
        "parallelism varies, so the scaling is approximate).",
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
    scale = 1.0
    if args.normalize_cores:
        if ec_new is None or ec_old is None or not ec_new:
            print("# --normalize-cores needs effective_cores on both sides")
            return 2
        scale = ec_old / ec_new
        print(
            f"# ADVISORY core-normalized view: old side scaled x{scale:.3f} "
            f"(ec {ec_old} -> {ec_new}); findings here are hints to "
            "re-measure within one epoch, never gate-able evidence"
        )
    if ec_new is not None and ec_old is not None and not args.normalize_cores:
        ratio = ec_new / ec_old if ec_old else 0.0
        if not 0.8 <= ratio <= 1.25:
            print(
                f"# NOT COMPARABLE: effective_cores {ec_old} -> {ec_new} "
                f"(ratio {ratio:.2f} outside [0.8, 1.25]) -- the delta is "
                "ENVIRONMENTAL; re-run on a box with matching parallel "
                "throughput, pass --force to diff anyway, or "
                "--normalize-cores for an advisory cross-epoch view"
            )
            if not args.force:
                return 2
    elif (ec_new is None) != (ec_old is None):
        # r14: one side carries throughput evidence and the other does
        # not (a pre-r13 artifact) -- proceeding would silently diff
        # across an unverifiable environment change (found live: the
        # epoch-1 blessed pass vs any epoch-2 artifact naively shows
        # +150% "regressions").  Missing evidence is not comparability.
        print(
            "# NOT COMPARABLE: effective_cores present on one side only "
            "-- the other is a pre-calibration artifact; re-bless it or "
            "pass --force to diff anyway"
        )
        if not args.force:
            return 2
    elif ec_new is None and ec_old is None:
        print(
            "# note: effective_cores missing on both sides -- "
            "comparability unverified (pre-r13 artifacts)"
        )
    nq, oq = new["queries"], old["queries"]
    if scale != 1.0:
        oq = {k: v * scale for k, v in oq.items()}
    regressions = []
    old_total = old.get("value")
    if scale != 1.0 and isinstance(old_total, (int, float)):
        old_total = round(old_total * scale, 3)
    print(f"# diff vs {os.path.basename(old_path)} "
          f"(old total {old_total}s -> new total {new.get('value')}s)")
    for name in nq:
        if name not in oq:
            print(f"  {name:24s} NEW       {nq[name]:7.3f}s")
            continue
        o, n = oq[name], nq[name]
        delta = (n - o) / o if o else 0.0
        marker = ""
        if delta > args.threshold and (n - o) > args.abs_floor:
            marker = ("  << drift? (advisory)" if args.normalize_cores
                      else "  << REGRESSION")
            regressions.append((name, o, n, delta))
        elif delta < -args.threshold:
            marker = "  (improved)"
        print(f"  {name:24s} {o:7.3f}s -> {n:7.3f}s  {delta:+6.1%}{marker}")
    for name in oq:
        if name not in nq:
            print(f"  {name:24s} REMOVED")
    if regressions:
        if args.normalize_cores:
            print(f"\n{len(regressions)} normalized drift hint(s) past "
                  f"{args.threshold:.0%}+{args.abs_floor}s -- advisory "
                  "only; re-measure within one epoch before concluding:")
            for name, o, n, d in regressions:
                print(f"  {name}: {o:.3f}s* -> {n:.3f}s ({d:+.1%})")
            return 0
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
