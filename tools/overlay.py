#!/usr/bin/env python3
"""Scale-sweep overlay adjudicator (BASELINE.md rule, amended r12).

Computes, machine-readably, what earlier rounds assembled by hand in
README prose: per-query canary-normalized comparison of a sweep
artifact against each query's BEST COMMITTED canary-normalized value,
the >2x outlier list, and the corrected total with targeted isolated
re-measures substituted.

Usage:
  python3 tools/overlay.py --sweep BENCH_sf10_r12.json \
      --refs BENCH_sf10_r10.json BENCH_sf10_r11.json SF10_EVERGREEN.json ... \
      --targeted BENCH_sf10_targeted_r12.json ... \
      --out BENCH_sf10_r12_corrected.json

Reference/targeted files may be Bench JSON lines ({"queries": {...},
"canary_sec": N}) or adjudication artifacts ({"runs": [...]}); failed
(-1) rows are skipped. Normalization: sec * IDLE_CANARY / canary_sec,
IDLE_CANARY = 0.794 (the frozen idle-host canary baseline).
"""
import argparse, json, sys

IDLE_CANARY = 0.794


def runs_in(path):
    """Yield (queries: {name: sec}, canary_sec) pairs found in a file.

    Accepts a single (possibly pretty-printed, multi-line) JSON object
    or JSONL (one object per line — bench stdout logs).
    """
    with open(path) as f:
        txt = f.read().strip()
    try:
        docs = [json.loads(txt)]
    except json.JSONDecodeError:
        docs = []
        for line in txt.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                docs.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    for d in docs:
        if "queries" in d and "canary_sec" in d:
            yield d["queries"], float(d["canary_sec"]), sf_tag(d.get("sf"))
        for r in d.get("runs", []):
            if "queries" in r and "canary_sec" in r:
                yield r["queries"], float(r["canary_sec"]), sf_tag(r.get("sf"))


def sf_tag(sf):
    """Normalize an artifact's `sf` field ("fixtures/sf10",
    "/root/testdata/sf0.1") to its scale token ("sf10", "sf0.1"), or
    None when absent."""
    if not sf:
        return None
    return str(sf).rstrip("/").split("/")[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", required=True)
    ap.add_argument("--refs", nargs="+", required=True)
    ap.add_argument("--targeted", nargs="*", default=[])
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    sweeps = list(runs_in(a.sweep))
    if len(sweeps) != 1:
        sys.exit(f"expected exactly one sweep run in {a.sweep}, found {len(sweeps)}")
    sweep_q, sweep_canary, sweep_sf = sweeps[0]

    # Reference/targeted runs must come from the SAME fixture scale as
    # the sweep: the r13 close-out caught an sf0.1 targeted artifact
    # (BENCH_q100_targeted_r12.json, 5.1 s) being used as the sf10
    # "best committed raw" for q100 (real sf10 history: 18-25 s),
    # which flagged four healthy queries. Runs with no sf field are
    # kept (pre-r10 artifacts) — their values are genuine sf10 rows.
    def same_scale(tag):
        return tag is None or sweep_sf is None or tag == sweep_sf

    # A --refs/--targeted file that parses to ZERO same-scale runs
    # (typo'd path contents, wrong format, wrong fixture) would
    # otherwise contribute nothing silently: every sweep row then
    # passes unflagged and the corrected total is vacuously "clean"
    # (ADVICE r12 #5). Fail loudly.
    for path in a.refs + a.targeted:
        if not [1 for _, _, t in runs_in(path) if same_scale(t)]:
            sys.exit(f"no same-scale (queries, canary_sec) runs parsed from "
                     f"{path} — wrong format, empty, or wrong fixture scale; "
                     "refusing a vacuous overlay")
    sweep_norm = {q: v * IDLE_CANARY / sweep_canary
                  for q, v in sweep_q.items() if v >= 0}

    # best committed canary-normalized AND best committed raw value per
    # query. Both are needed: a reference captured in a hot window
    # (canary 2.7 while the query's own seconds barely moved — the
    # graph/GC-bound family doesn't scale linearly with the CPU canary)
    # normalizes far below anything reachable on an idle host, so a
    # pure normalized trigger over-flags; a pure raw trigger under-
    # flags when all history was hot. A query is an outlier only when
    # BOTH ratios exceed the threshold.
    best = {}       # q -> (normalized, path)
    best_raw = {}   # q -> (raw_sec, path)
    for path in a.refs:
        for qs, canary, tag in runs_in(path):
            if not same_scale(tag):
                continue
            for q, v in qs.items():
                if v < 0:
                    continue
                n = v * IDLE_CANARY / canary
                if q not in best or n < best[q][0]:
                    best[q] = (n, path)
                if q not in best_raw or v < best_raw[q][0]:
                    best_raw[q] = (v, path)

    # targeted re-measures from this round (best raw + its canary)
    targeted = {}
    for path in a.targeted:
        for qs, canary, tag in runs_in(path):
            if not same_scale(tag):
                continue
            for q, v in qs.items():
                if v < 0:
                    continue
                n = v * IDLE_CANARY / canary
                if q not in targeted or n < targeted[q][1]:
                    targeted[q] = (v, n, path)

    flagged, substituted, unresolved = {}, {}, []
    for q, n in sorted(sweep_norm.items()):
        if (q in best and n > a.threshold * best[q][0]
                and sweep_q[q] > a.threshold * best_raw[q][0]):
            flagged[q] = {"sweep_sec": sweep_q[q], "sweep_normalized": round(n, 3),
                          "best_committed_normalized": round(best[q][0], 3),
                          "best_committed_source": best[q][1],
                          "best_committed_raw": round(best_raw[q][0], 3),
                          "best_committed_raw_source": best_raw[q][1],
                          "ratio": round(n / best[q][0], 3),
                          "raw_ratio": round(sweep_q[q] / best_raw[q][0], 3)}
            if q in targeted:
                substituted[q] = {"targeted_sec": targeted[q][0],
                                  "targeted_normalized": round(targeted[q][1], 3),
                                  "targeted_source": targeted[q][2]}
            else:
                unresolved.append(q)

    raw_total = sum(v for v in sweep_q.values() if v >= 0)
    corrected = raw_total \
        - sum(sweep_q[q] for q in substituted) \
        + sum(targeted[q][0] for q in substituted)

    out = {"metric": "corrected_total", "sweep": a.sweep,
           "sweep_canary_sec": sweep_canary, "idle_canary_baseline": IDLE_CANARY,
           "threshold": a.threshold, "raw_total": round(raw_total, 3),
           "corrected_total": round(corrected, 3),
           "n_queries": len(sweep_norm), "flagged": flagged,
           "substituted": sorted(substituted),
           "substitutions": substituted, "unresolved_flagged": unresolved,
           "refs": a.refs}
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"raw_total={raw_total:.1f} corrected_total={corrected:.1f} "
          f"flagged={len(flagged)} substituted={len(substituted)} "
          f"unresolved={unresolved}")
    if unresolved:
        sys.exit(2)


if __name__ == "__main__":
    main()
