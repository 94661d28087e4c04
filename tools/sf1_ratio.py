#!/usr/bin/env python3
"""Build the BENCH_sf1_full.md ratio table: every query's sf1 wall (from the
bench sidecar target/bench_full.json of an SPARK_GRAFT_SF_DIR=/tmp/sf1 run)
against its isolated sf0.1 baseline row (BENCH_BASELINE.md). No second
baseline table needed — the screen is the sf1/sf0.1 ratio itself.

Usage: sf1_ratio.py [sidecar_json] [baseline_md] [flag_ratio]
"""
import json
import re
import sys


def baselines(path):
    rows = {}
    pat = re.compile(r"^\|\s*(q[0-9][0-9a-z_]*)\s*\|\s*([0-9]+(?:\.[0-9]+)?)")
    for line in open(path, encoding="utf-8"):
        m = pat.match(line)
        if m:
            rows[m.group(1).split("_")[0]] = float(m.group(2))
    return rows


def main():
    sidecar = sys.argv[1] if len(sys.argv) > 1 else "target/bench_full.json"
    base_md = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.md"
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    run = json.load(open(sidecar))
    base = baselines(base_md)
    qs = run["queries"]
    rows = []
    for q, sf1 in sorted(qs.items()):
        b = base.get(q)
        rows.append((q, sf1, b, (sf1 / b) if b and b > 0 else None))
    rows.sort(key=lambda r: -(r[3] or 0))
    n_fail = sum(1 for _, v, _, _ in rows if v < 0)
    total = sum(v for _, v, _, _ in rows if v >= 0)
    base_total = sum(b for _, _, b, _ in rows if b)
    flagged = [r for r in rows if r[3] and r[3] > flag and r[1] >= 1.0]
    print(f"sf1 total {total:.1f} s over {len(rows)} queries "
          f"({n_fail} failed); summed sf0.1 baselines {base_total:.1f} s; "
          f"aggregate decade-up ratio {total / base_total:.2f}x")
    print(f"{len(flagged)} queries above {flag:.0f}x (and >= 1 s at sf1)\n")
    print("| query | sf1 s | sf0.1 base s | ratio |")
    print("|---|---|---|---|")
    for q, sf1, b, r in rows:
        mark = " **" if (r and r > flag and sf1 >= 1.0) else ""
        print(f"| {q}{mark.strip()} | {sf1:.2f} | "
              f"{'' if b is None else f'{b:.2f}'} | "
              f"{'' if r is None else f'{r:.1f}'} |")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piped to head
        pass
