#!/usr/bin/env python3
"""Build the per-query sf1 → sf10 scaling table for SCALE.md.

Usage: python3 tools/scale_table.py BENCH_DETAIL_sf1.json BENCH_DETAIL_sf10.json

Reads two Bench detail files (same battery, different scale), prints a
markdown table of per-query medians (total and fixture-subtracted
`measured` where available) plus the sf1→sf10 ratio for 10× data, sorted
by descending sf10 measured time, and a footer of battery-level totals.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    med = d.get("medians") or d.get("queries") or {}
    fs = d.get("fixture_split", {})
    measured = {}
    for q, m in med.items():
        measured[q] = max(0.0, fs[q]["measured"]) if q in fs else m
    return med, measured


def main(p1, p10):
    med1, mea1 = load(p1)
    med10, mea10 = load(p10)
    qs = sorted(set(med1) & set(med10), key=lambda q: -mea10.get(q, 0.0))
    missing = sorted(set(med1) ^ set(med10))
    if missing:
        print(f"<!-- queries only in one battery: {', '.join(missing)} -->")
    print("| query | sf1 measured (s) | sf10 measured (s) | ratio for 10× data |")
    print("|---|---|---|---|")
    t1 = t10 = 0.0
    for q in qs:
        a, b = mea1[q], mea10[q]
        t1 += a
        t10 += b
        ratio = f"{b / a:.1f}×" if a > 0.05 else "—"
        print(f"| {q} | {a:.2f} | {b:.2f} | {ratio} |")
    print(f"\nBattery totals (fixture-subtracted): sf1 {t1:.1f} s, "
          f"sf10 {t10:.1f} s → {t10 / t1:.2f}× for 10× data across "
          f"{len(qs)} queries.")
    w1 = sum(med1[q] for q in qs)
    w10 = sum(med10[q] for q in qs)
    print(f"Battery totals (wall, incl. fixtures): sf1 {w1:.1f} s, "
          f"sf10 {w10:.1f} s → {w10 / w1:.2f}×.")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
