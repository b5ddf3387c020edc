#!/usr/bin/env python3
"""Build the SCALING.md measured table from two bench_out.json files
(dev tool only). Usage:
  python3 tools/scaling_report.py target/bench_sf01.json target/bench_sf1.json

Prints a markdown table of per-query seconds at both scale factors, the
time ratio, and the implied scaling exponent log10(t1/t01) for a 10×
data multiplier (1.0 = linear, <1 = sublinear / fixed-overhead-dominated,
>1 = superlinear — investigate).
"""
import json, math, sys

def load(p):
    with open(p) as f:
        return json.load(f)

def main(small_path, big_path):
    small, big = load(small_path), load(big_path)
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(qs):
        ts, tb = qs[name], qb.get(name, -1.0)
        if ts is None or tb is None or ts < 0 or tb < 0:
            rows.append((name, ts, tb, None, None))
            continue
        ratio = tb / ts if ts > 0 else float("inf")
        exp = math.log10(ratio) if ratio > 0 else None
        rows.append((name, ts, tb, ratio, exp))
    print("| query | sf0.1 s | sf1 s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for name, ts, tb, ratio, exp in rows:
        if ratio is None:
            print(f"| {name} | {ts} | {tb} | ERR | ERR |")
        else:
            print(f"| {name} | {ts:.2f} | {tb:.2f} | {ratio:.1f}× | {exp:.2f} |")
    oks = [r for r in rows if r[3] is not None]
    tot_s = sum(r[1] for r in oks); tot_b = sum(r[2] for r in oks)
    print(f"| **total** | **{tot_s:.1f}** | **{tot_b:.1f}** | "
          f"**{tot_b / tot_s:.1f}×** | **{math.log10(tot_b / tot_s):.2f}** |")
    sup = [(r[0], r[3]) for r in oks if r[3] > 10.0]
    if sup:
        print("\nsuperlinear (>10× on 10× data):")
        for n, r in sorted(sup, key=lambda x: -x[1]):
            print(f"  {n}: {r:.1f}×")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
