"""Compare two BENCH_FULL-style artifacts per query.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--top N]

Prints: headline + value_full (raw and, when present, throttle-
normalized), and the N largest per-query regressions/improvements on
the common query set. The normalized columns divide each side's
medians by its own throttle_factor, so environment drift (measured by
the calibration probe, round-10 VERDICT task 2) is factored out of
the comparison instead of argued about.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    to = old.get("throttle_factor") or 1.0
    tn = new.get("throttle_factor") or 1.0
    print(
        f"headline: {old.get('value')} -> {new.get('value')} "
        f"(normalized: {old.get('value_normalized')} -> "
        f"{new.get('value_normalized')})"
    )
    print(
        f"value_full: {old.get('value_full')} -> {new.get('value_full')} "
        f"| throttle {to} -> {tn}"
    )
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    print(f"common queries: {len(common)} "
          f"(old-only {len(set(qo) - set(qn))}, "
          f"new-only {len(set(qn) - set(qo))})")
    rows = []
    for q in common:
        a, b = qo[q] / to, qn[q] / tn
        if a > 0:
            rows.append((b / a, q, qo[q], qn[q], round(a, 3), round(b, 3)))
    rows.sort(reverse=True)
    print(f"\nworst {args.top} normalized regressions (ratio, query, "
          "raw old->new, norm old->new):")
    for r, q, ro, rn, no_, nn in rows[: args.top]:
        print(f"  {r:5.2f}x  {q}: {ro} -> {rn}  (norm {no_} -> {nn})")
    print(f"\nbest {args.top} improvements:")
    for r, q, ro, rn, no_, nn in rows[-args.top:][::-1]:
        print(f"  {r:5.2f}x  {q}: {ro} -> {rn}  (norm {no_} -> {nn})")
    slow = sorted(common, key=lambda q: -qn[q])[: args.top]
    print(f"\nslowest {args.top} at new HEAD:")
    for q in slow:
        print(f"  {qn[q]:6.2f}s  {q}")


if __name__ == "__main__":
    main()
