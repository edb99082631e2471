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

# Gate subset, VERSIONED per round (VERDICT r5 #7: rotate ~15 slots
# toward each round's additions so the 100x oracle keeps probing new
# risk classes instead of re-proving settled ones).
#
# r7 -> r8 diff: q237 dropped (demoted from the registry — decimal
# outputs can never hash green at the driver; see CurationOps8.q237);
# q248-q253 added (ADVICE r7 #3 — the round-7 fifth/sixth waves never
# got a 100x check); q254-q256 and q257-q260 added (the round-8
# waves). Everything in the r7 subset is retained, so this run also
# closes VERDICT r7 #3 (the rotated subset was never executed on
# round-7 code).
#
# r6 -> r7 diff:
#   rotated OUT (15, each hash-green at sf10 in r6 and carrying no
#   novel arithmetic class beyond what the kept core still probes):
#   q106_global_spend_rank (rank class stays via q101/q161),
#   q173_time_to_convert (percentiles stay via q19/q125),
#   q192_span_dup_mass, q211_cross_source_dups (dedup family stays
#   via q39/q41/q42 + the new consensus q236),
#   q199_heavy_hitters_cms (sketches stay via q60/q218/q230),
#   q131_ks_drift, q206_bootstrap_ci, q207_winsorized_stats
#   (order-stat class stays via q153/q167),
#   q186_pq_adc_recall, q194_jl_projection_recall (recall-audit class
#   now probed by q235's in-result audit),
#   q222_ab_lift_ztest, q224_k_anonymity, q225_time_series_folds,
#   q227_source_embedding_drift, q229_bucketed_colocated_join
#   (round-6 additions, proven at sf10 in r6; q229 is plan-shape
#   gated by PlanSpec anyway)
#   rotated IN (3, the round-7 additions): q235, q236, q237
#   kept: the permanent risk core, plus q223/q226/q228 (oracles
#   changed arithmetic this round) and q220/q221/q142/q233 (engine
#   side changed this round).
DEFAULT_SUBSET = [
    # money aggregates (fold-order hazards at 60M rows)
    "q01_pricing_summary", "q04_revenue_by_nation", "q87_revenue_share",
    "q110_profit_by_nation_year",
    # Dist-based global rank / cumsum
    "q101_pack_sequences", "q161_rfm_segments",
    # histogram-fed exact percentiles
    "q19_percentiles_quantity", "q125_join_skew_report",
    # iterative graph convergence
    "q100_dedup_cc_clusters", "q142_pagerank_purchases",
    "q201_label_propagation", "q220_hits_scores", "q221_kcore_peel",
    # sampled-quantizer SemDeDup (data-dependent seed sets)
    "q180_semdedup_scaled", "q181_semdedup_2level",
    # dedup family
    "q39_dedup_exact", "q41_dedup_minhash_lsh", "q42_dedup_simhash",
    # sketch aggregates / stream==batch parity
    "q60_approx_aggregates",
    "q218_stream_heavy_hitters", "q193_stream_neardup_filter",
    "q230_stream_distinct_parity",
    # weighted / distributional order statistics
    "q153_weighted_median", "q167_spend_gini",
    # learning / projection on sufficient statistics
    "q182_kmeans_lloyd", "q208_kcenter_coreset", "q219_negative_mining",
    # iterative trainers
    "q216_bpe_train",
    # end-to-end pipeline composition
    "q107_corpus_prep_pack", "q217_release_manifest",
    # round-6 entries kept hot (oracle arithmetic changed in r7)
    "q223_benford_audit", "q226_mmr_select", "q228_bloom_decontaminate",
    "q231_apriori_triples", "q232_rrf_fusion", "q233_bpe_apply",
    "q234_containment_dedup",
    # round-7 additions (q237 demoted out of the registry in r8:
    # decimal outputs can never hash green at the driver — see
    # CurationOps8.q237 scaladoc for the probe evidence)
    "q235_fused_retrieval_indexed", "q236_consensus_keeper",
    # round-7 second wave (cross-split LSH / Dist-ranked batching /
    # integer apportionment — each a fresh arithmetic class at 100x)
    "q238_cross_split_contamination", "q239_padding_waste_audit",
    "q240_quota_sample_largest_remainder", "q241_incremental_view_maintenance",
    # round-7 third/fourth wave (zone ranks, CMS inner products,
    # NN-descent 2-hop sets, sign-word packing — fresh classes at 100x)
    "q242_zone_map_pruning_audit", "q243_cascade_delete_audit",
    "q244_nn_descent_round", "q245_join_size_sketch",
    "q246_hybrid_skew_join", "q247_binary_sign_retrieval",
    # round-7 fifth wave (ADVICE r7 #3: skyline dominance, golden-record
    # survivorship, sketch-driven join order, HLL rollups/overlap,
    # conformal coverage — each a fresh arithmetic class at 100x)
    "q248_skyline_pareto_docs", "q249_entity_resolution_golden",
    "q250_join_order_from_sketches", "q251_rolling_distinct_hll",
    "q252_vocab_overlap_hll", "q253_conformal_coverage",
    # round-8 additions (NN-descent convergence, HLL IVM, cross-modal
    # consensus — unrolled-round sets, sketch-merge parity, and 5-way
    # vote combinations are each scale-sensitive arithmetic)
    "q254_nn_descent_converged", "q255_hll_view_maintenance",
    "q256_crossmodal_consensus",
    # round-8 second wave (digest diffs, prefix-cosine recall, HRW
    # argmax, two-middle-bin medians)
    "q257_release_diff_audit", "q258_matryoshka_prefix_recall",
    "q259_shard_rebalance_audit", "q260_quantile_view_maintenance",
    "q261_resample_interpolate",
    # round-8 third wave: incremental CC maintenance (contracted-graph
    # labels must compose to the full closure at 100x)
    "q262_incremental_cc_maintenance",
    "q263_late_interaction_maxsim",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    return v


# The two BPE oracles' unrolled 5-round CTE chains cost 819.7/861.7 s
# of the r6 sf10 gate's wall time (engine side: ~44/~50 s) — DuckDB
# re-derives the chain far more expensively than the rounds cost one
# at a time. This runner materializes each round's corpus ONCE into a
# temp table (dropped as the next round lands — the engine side's
# checkpoint-rotate lifecycle, VERDICT r6 #5) and splits each symbol
# string once per row instead of once per lambda element. It is
# value-identical to oracle_sql.json's chains (verified at sf1:
# identical merge tables / per-lang rows) and ~30x cheaper
# (q216: 68.5 -> 2.2 s at sf1).
BPE_TOKENS = "list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0)"
BPE_TOP = """SELECT pair, n FROM (
  SELECT pair, count(*) AS n FROM (
    SELECT unnest(list_transform(range(1, len(parts)),
      i -> concat(parts[i], ' ', parts[i + 1]))) AS pair
    FROM (SELECT string_split(trim(sy), ' ') AS parts FROM {src}))
  GROUP BY 1) ORDER BY n DESC, pair LIMIT 1"""


def bpe_oracle(con, name):
    keep = name == "q233_bpe_apply"
    cols = "lang, CAST(length(tok) AS INTEGER) AS chars, " if keep else ""
    src = "lang, " if keep else ""
    carry = "lang, chars, " if keep else ""
    con.sql(f"""CREATE OR REPLACE TEMP TABLE bpe_c0 AS
      SELECT {cols}concat(' ', regexp_replace(tok, '(.)', '\\1 ', 'g')) AS sy
      FROM (SELECT {src}unnest({BPE_TOKENS}) AS tok FROM documents)""")
    merges = []
    for r in range(1, 6):
        pair, n = con.sql(BPE_TOP.format(src=f"bpe_c{r - 1}")).fetchall()[0]
        merges.append((r, pair, n))
        if r < 5 or keep:
            # the pair is data-derived text: bind it, never inline it
            con.execute(f"""CREATE OR REPLACE TEMP TABLE bpe_c{r} AS
              SELECT {carry}replace(sy, concat(' ', ?, ' '),
                concat(' ', replace(?, ' ', ''), ' ')) AS sy
              FROM bpe_c{r - 1}""", [pair, pair])
        con.sql(f"DROP TABLE IF EXISTS bpe_c{r - 1}")
    if not keep:
        ph = ", ".join(["(?, ?, ?)"] * len(merges))
        flat = [x for m in merges for x in m]
        return con.execute(
            f"""SELECT CAST(c1 AS INTEGER) AS round, c2 AS pair,
                CAST(c3 AS BIGINT) AS n
                FROM (VALUES {ph}) t(c1, c2, c3) ORDER BY round""",
            flat).df()
    du = con.sql("""SELECT lang, count(*) AS n_tokens,
      CAST(sum(chars) AS BIGINT) AS n_chars,
      CAST(sum(len(list_filter(string_split_regex(sy, '\\s+'),
        t -> length(t) > 0))) AS BIGINT) AS n_symbols,
      round(sum(len(list_filter(string_split_regex(sy, '\\s+'),
        t -> length(t) > 0))) / CAST(sum(chars) AS DOUBLE), 6) AS compression
      FROM bpe_c5 GROUP BY lang ORDER BY lang""").df()
    con.sql("DROP TABLE IF EXISTS bpe_c5")
    return du


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
            if name in ("q216_bpe_train", "q233_bpe_apply"):
                du = bpe_oracle(con, name)
            else:
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
