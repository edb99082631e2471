#!/usr/bin/env python3
"""sf10 oracle spot-gate (VERDICT r4 #2).

Runs the DuckDB oracle for a risk-class subset of registry queries over
the sf10 fixtures and compares against the Spark parquet dumps that
graft.Verify already wrote, emitting a CORRECTNESS-style artifact.

Usage:
  python3 tools/sf10_gate.py <sfDir> <verifyOutDir> <outJson> [q1,q2,...]

The default subset spans the classes where fold-order / rank-selection /
iterative-convergence hazards actually bite at 100x data:
Dist-based rank & cumsum, histogram-fed exact percentiles, connected
components + PageRank, the sampled-quantizer SemDeDup pair, money
aggregates, the dedup family, sketch aggregates, weighted order
statistics, and the end-to-end corpus-prep pipeline.
"""
import sys, json, math, glob, os, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

DEFAULT_SUBSET = [
    # money aggregates (fold-order hazards at 60M rows)
    "q01_pricing_summary", "q04_revenue_by_nation", "q87_revenue_share",
    "q110_profit_by_nation_year",
    # Dist-based global rank / cumsum
    "q101_pack_sequences", "q106_global_spend_rank", "q161_rfm_segments",
    # histogram-fed exact percentiles
    "q19_percentiles_quantity", "q125_join_skew_report", "q173_time_to_convert",
    # iterative graph convergence
    "q100_dedup_cc_clusters", "q142_pagerank_purchases",
    # sampled-quantizer SemDeDup (data-dependent seed sets)
    "q180_semdedup_scaled", "q181_semdedup_2level",
    # dedup family
    "q39_dedup_exact", "q41_dedup_minhash_lsh", "q42_dedup_simhash",
    # sketch aggregates (self-auditing bounds)
    "q60_approx_aggregates",
    # weighted / distributional order statistics
    "q153_weighted_median", "q167_spend_gini", "q131_ks_drift",
    # end-to-end pipeline composition
    "q107_corpus_prep_pack",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    return v


def main():
    sfdir, outdir, outjson = sys.argv[1], sys.argv[2], sys.argv[3]
    subset = sys.argv[4].split(",") if len(sys.argv) > 4 else DEFAULT_SUBSET
    con = duckdb.connect()
    # the sf10 PageRank/SemDeDup oracles spill tens of GB: keep DuckDB's
    # temp on the big filesystem and give it an explicit memory budget
    # (defaults OOM'd q180 and filled /tmp on q142 in round 5)
    tmp = os.environ.get("DUCK_TMP", "/root/duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.sql(f"SET temp_directory='{tmp}'")
    con.sql(f"SET memory_limit='{os.environ.get('DUCK_MEM', '96GB')}'")
    # unordered execution lets DuckDB stream/spill operators that
    # otherwise pin whole intermediates (q180's OOM shape); results
    # all carry explicit ORDER BYs so output order is unaffected
    con.sql("SET preserve_insertion_order=false")
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    report = {}
    for name in subset:
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "oracle_sec": None, "err": None}
        report[name] = entry
        if name not in oracle:
            entry["err"] = "no oracle sql"
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            entry["err"] = "no spark output"
            continue
        try:
            sp = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            t0 = time.time()
            du = con.sql(oracle[name]).df()
            entry["oracle_sec"] = round(time.time() - t0, 1)
        except Exception as e:
            entry["err"] = f"exec error: {str(e).splitlines()[0][:300]}"
            continue
        entry["spark_rows"], entry["oracle_rows"] = len(sp), len(du)
        entry["rows_match"] = len(sp) == len(du)
        sp = sp.reindex(sorted(sp.columns), axis=1)
        du = du.reindex(sorted(du.columns), axis=1)
        # preserve_insertion_order=false lets DuckDB stream some
        # spilling plans out of ORDER BY order (seen on the q180
        # window+spill shape at sf10); every query ends in a total
        # ORDER BY, so sorting both sides identically keeps the
        # value-equality check exact while ignoring that quirk
        if len(sp.columns) == len(du.columns) and len(sp) == len(du):
            sp = sp.sort_values(by=list(sp.columns), kind="mergesort")
            du = du.sort_values(by=list(du.columns), kind="mergesort")
        entry["schema_match"] = list(sp.columns) == list(du.columns)
        if not (entry["rows_match"] and entry["schema_match"]):
            continue
        ok = True
        for a, b in zip(sp.values.tolist(), du.values.tolist()):
            na, nb = [norm(x) for x in a], [norm(x) for x in b]
            for x, y in zip(na, nb):
                if x is None and y is None:
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if x != y:
                        ok = False
                elif str(x) != str(y):
                    ok = False
            if not ok:
                break
        entry["hash_match"] = ok
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name} ({len(sp)} rows, oracle {entry['oracle_sec']}s)",
              flush=True)
    with open(outjson, "w") as f:
        json.dump(report, f, indent=1)
    n_pass = sum(1 for e in report.values()
                 if e["rows_match"] and e["schema_match"] and e["hash_match"])
    print(f"== {n_pass}/{len(report)} pass -> {outjson}")
    sys.exit(0 if n_pass == len(report) else 1)


if __name__ == "__main__":
    main()
