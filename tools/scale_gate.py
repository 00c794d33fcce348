#!/usr/bin/env python3
"""Regression gate for per-query scaling ratios (round-8 verdict #8).

Usage: scale_gate.py <candidate_dir> <reference_dir> [rel_tol] [abs_cap]

Both dirs hold the profile maps graft.Bench writes, copied as
  sf01_cold.json sf01_warm.json sf1_cold.json sf1_warm.json
  [sf10_cold.json sf10_warm.json]
(the bench/scale_r* layout). For every query the WARM sf0.1->sf1
ratio is the scaling law under test -- and, when BOTH dirs carry
sf10 profiles, the sf1->sf10 ratio too (round-11: the second decade
is where the real scale bugs lived; r10 found three of them with no
machine-checked reference). A decade's gate fails (exit 1) when a
query's candidate ratio exceeds BOTH
  - reference_ratio * rel_tol  (default 1.5: plans drift, hosts are
    shared; a genuine complexity-class change blows well past 50%), and
  - a floor of abs_floor (default 3.0: a 0.4x->0.8x wobble on a
    sub-second query is noise, not a law change),
or when any query exceeds the hard cap (default 15x on 10x data --
the round-7 super-linear gate) regardless of reference. Queries new
since the reference are held only to the hard cap. A query whose
HIGH-scale time did not regress (cand_hi <= ref_hi * rel_tol) passes
its decade regardless of ratio: a ratio gate punishes the denominator
improving (round 11: q_band_shape's sf0.1 warm got 2.2x faster and
"failed" the ratio with an sf1 time that had IMPROVED) -- a real
scaling-law regression must manifest in the high-scale time itself. Sub-100ms sf0.1
warm times are floored to 100ms exactly as tools/scale_ratios.py does.

This makes "a future plan change reintroduced a super-linear query"
a failing gate run instead of a surprise on the next manual decade
run: after each scale bench, copy the four profiles to bench/scale_rN
and run  tools/scale_gate.py bench/scale_rN bench/scale_r<prev>.
"""
import json
import os
import sys

ABS_FLOOR = 3.0


def load(d):
    out = {}
    for name in ("sf01_cold", "sf01_warm", "sf1_cold", "sf1_warm"):
        with open(os.path.join(d, name + ".json")) as f:
            out[name] = json.load(f)
    for name in ("sf10_cold", "sf10_warm"):
        p = os.path.join(d, name + ".json")
        if os.path.exists(p):
            with open(p) as f:
                out[name] = json.load(f)
    return out


def warm_ratios(p, lo="sf01_warm", hi="sf1_warm"):
    if lo not in p or hi not in p:
        return None
    r = {}
    for q, v01 in p[lo].items():
        v1 = p[hi].get(q)
        if v1 is None or v01 < 0 or v1 < 0:
            continue
        r[q] = v1 / max(v01, 0.1)
    return r


def main():
    cand_dir, ref_dir = sys.argv[1], sys.argv[2]
    rel_tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    cap = float(sys.argv[4]) if len(sys.argv) > 4 else 15.0
    cand_p, ref_p = load(cand_dir), load(ref_dir)
    decades = [("sf0.1->sf1", "sf01_warm", "sf1_warm"),
               ("sf1->sf10", "sf1_warm", "sf10_warm")]
    any_fail = False
    checked = 0
    for label, lo, hi in decades:
        cand = warm_ratios(cand_p, lo, hi)
        ref = warm_ratios(ref_p, lo, hi)
        if cand is None:
            continue
        if ref is None:
            ref = {}
        checked += 1
        cand_hi, ref_hi = cand_p.get(hi, {}), ref_p.get(hi, {})

        def hi_ok(q):
            # high-scale absolute time within tolerance of the
            # reference round -> not a scaling regression, whatever
            # the ratio says.
            c, r = cand_hi.get(q, -1.0), ref_hi.get(q, -1.0)
            return c >= 0 and r >= 0 and c <= r * rel_tol

        failures = []
        for q, cr in sorted(cand.items()):
            if cr > cap and not hi_ok(q):
                failures.append(
                    f"{q}: warm ratio {cr:.1f}x exceeds the hard cap {cap}x")
            elif cr <= cap and q in ref:
                bound = max(ref[q] * rel_tol, ABS_FLOOR)
                if cr > bound and not hi_ok(q):
                    failures.append(
                        f"{q}: warm ratio {cr:.1f}x vs reference "
                        f"{ref[q]:.1f}x (bound {bound:.1f}x)")
        n = len(cand)
        if failures:
            any_fail = True
            print(f"SCALE GATE FAIL [{label}] ({len(failures)}/{n} queries):")
            for f in failures:
                print("  " + f)
        else:
            print(f"scale gate OK [{label}]: {n} queries within tolerance "
                  f"(rel {rel_tol}x of reference, floor {ABS_FLOOR}x, "
                  f"cap {cap}x)")
    if checked == 0:
        print("no decade had both profiles -- nothing gated")
        sys.exit(1)
    if any_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
