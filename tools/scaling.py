#!/usr/bin/env python3
"""Scale-up analysis: per-query time ratios across bench runs.

Usage:
  python3 tools/scaling.py <bench_small.log> <bench_big.log> [data_ratio]

Each log is a graft.Bench output containing one JSON line with
{"value": total, "queries": {name: sec}, "spread": {name: rel}}.
Prints a table of per-query times and the big/small ratio, sorted by
ratio descending, and flags queries whose ratio exceeds the data ratio
(superlinear scaling) — those are the 100x-scale suspects.

Also accepts two same-SF logs (data_ratio=1) to diff re-baselines.
"""
import json, sys


def load(path):
    line = [l for l in open(path) if '"metric"' in l][-1]
    return json.loads(line[line.find('{'):])


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs = sorted(set(small["queries"]) & set(big["queries"]))
    rows = []
    for q in qs:
        a, b = small["queries"][q], big["queries"][q]
        rows.append((b / a if a > 0 else float("inf"), a, b, q))
    rows.sort(reverse=True)
    flagged = 0
    print(f"{'query':42s} {'small_s':>8s} {'big_s':>8s} {'ratio':>7s}")
    for r, a, b, q in rows:
        mark = ""
        # superlinear = grows faster than the data, with enough absolute
        # cost that it isn't fixed-overhead jitter on a tiny query
        if r > data_ratio and b > 1.0:
            mark = "  <-- superlinear"
            flagged += 1
        print(f"{q:42s} {a:8.3f} {b:8.3f} {r:7.2f}{mark}")
    print(f"\ntotals: small={small['value']:.1f}s big={big['value']:.1f}s "
          f"ratio={big['value']/small['value']:.2f} (data x{data_ratio:g}); "
          f"{flagged} superlinear")


if __name__ == "__main__":
    main()
