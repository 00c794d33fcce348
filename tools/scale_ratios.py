#!/usr/bin/env python3
"""Per-query scaling-ratio table: sf0.1 -> sf1 wall-time ratios.

Usage: scale_ratios.py <sf01_cold.json> <sf01_warm.json> \
                       <sf1_cold.json> <sf1_warm.json> [threshold]

Reads the per-query profile maps graft.Bench writes (cold = median of
2 passes, warm = median of 3), prints a markdown table sorted by warm
ratio descending, and lists queries whose warm ratio exceeds the
super-linear threshold (default 15x on 10x data — the round-7 gate).
Sub-100ms sf0.1 warm times are floored to 100ms for the ratio (a 40ms
query "growing" to 400ms is fixed-overhead noise, not a scaling law).
"""
import json
import sys

def main():
    c01 = json.load(open(sys.argv[1]))
    w01 = json.load(open(sys.argv[2]))
    c1 = json.load(open(sys.argv[3]))
    w1 = json.load(open(sys.argv[4]))
    thr = float(sys.argv[5]) if len(sys.argv) > 5 else 15.0
    rows = []
    failed = []
    for q in sorted(c01):
        if q not in c1:
            continue
        if min(c01[q], w01[q], c1[q], w1[q]) < 0:
            failed.append(q)
            continue
        cr = c1[q] / max(c01[q], 0.1)
        wr = w1[q] / max(w01[q], 0.1)
        rows.append((wr, q, c01[q], c1[q], cr, w01[q], w1[q], wr))
    rows.sort(reverse=True)
    print("| query | cold 0.1 | cold 1 | x | warm 0.1 | warm 1 | x |")
    print("|---|---|---|---|---|---|---|")
    for _, q, a, b, cr, c, d, wr in rows:
        print(f"| {q} | {a:.2f} | {b:.2f} | {cr:.1f} | "
              f"{c:.2f} | {d:.2f} | {wr:.1f} |")
    for q in failed:
        print(f"| {q} | FAILED | FAILED | - | FAILED | FAILED | - |")
    bad = [(q, wr) for wr, q, *_ in rows if wr > thr]
    tc01 = sum(v for v in c01.values() if v >= 0)
    tc1 = sum(v for v in c1.values() if v >= 0)
    tw01 = sum(v for v in w01.values() if v >= 0)
    tw1 = sum(v for v in w1.values() if v >= 0)
    def ratio(num, den):
        return f"{num/den:.1f}x" if den > 0 else "n/a"
    print(f"\ntotals: cold {tc01:.1f}s -> {tc1:.1f}s ({ratio(tc1, tc01)}), "
          f"warm {tw01:.1f}s -> {tw1:.1f}s ({ratio(tw1, tw01)})")
    if failed:
        print(f"\nFAILED queries (negative time in some profile): "
              f"{', '.join(failed)}")
    if bad:
        print(f"\nSUPER-LINEAR (> {thr}x warm on 10x data):")
        for q, wr in bad:
            print(f"  {q}: {wr:.1f}x")
    else:
        print(f"\nno query exceeds {thr}x warm on 10x data")

if __name__ == "__main__":
    main()
