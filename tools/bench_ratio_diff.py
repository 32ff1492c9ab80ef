"""Adjudicate a medians run against the previous round by CALIBRATION
RATIOS, not seconds (VERDICT r7 item 8 / the bench-noise protocol):
the box drifts +-20% between runs, so per-entry medians are compared
as (entry_median / calibration_total) ratios; only entries whose
RATIO moves beyond the threshold deserve a code A/B.

Usage: python tools/bench_ratio_diff.py OLD.json NEW.json [--thresh 0.15]
Prints a markdown table of movers plus summary stats.
"""

from __future__ import annotations

import argparse
import json


def _ratios(doc: dict) -> dict:
    r = doc.get("queries_rel_calibration")
    if r:
        return r
    # fall back to deriving from raw medians + calibration total
    cal = doc.get("calibration") or {}
    total = sum(cal.values()) or None
    qs = doc.get("queries") or {}
    if total is None:
        raise SystemExit("no calibration data in this bench doc")
    return {k: v / total for k, v in qs.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--thresh", type=float, default=0.15)
    args = ap.parse_args()
    old = _ratios(json.load(open(args.old)))
    new = _ratios(json.load(open(args.new)))
    shared = sorted(set(old) & set(new))
    moves = []
    for k in shared:
        if old[k] <= 0:
            continue
        moves.append((new[k] / old[k], k))
    moves.sort()
    import statistics

    med = statistics.median(m for m, _ in moves)
    print(f"shared entries: {len(shared)}; median ratio-of-ratios: "
          f"{med:.3f}")
    out = [
        (m, k) for m, k in moves if abs(m - 1.0) > args.thresh
    ]
    print(f"movers beyond +-{args.thresh:.0%}: {len(out)}")
    print("| entry | old rel | new rel | ratio |")
    print("|---|---|---|---|")
    for m, k in out:
        print(f"| {k} | {old[k]:.3f} | {new[k]:.3f} | {m:.2f}x |")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new entries (no prior): {only_new}")


if __name__ == "__main__":
    main()
