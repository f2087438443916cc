#!/usr/bin/env python
"""Regenerate PLANS.md: AQE-final executed physical plans of the
headline queries at sf0.1, with per-query notes on what the plan must
show. The machine-checked versions of these shapes live in
tests/test_plans.py; this artifact is the human-readable evidence."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PICKS = [
    ("llm_kneser_ney",
     "KN bigram LM scoring: model assembly is metadata-sized stat joins, "
     "the bigram total rides as a 1-row broadcast, stream join + 1 agg"),
    ("llm_dsir_weights",
     "DSIR: KB-sized hashed-feature model broadcast onto the stream — "
     "no vocabulary-sized shuffle anywhere"),
    ("agg_groupby_basic",
     "TPC-H Q1 shape: pushdown + partial-before-shuffle aggregation"),
    ("tpch_q5_shape",
     "six-table join graph: broadcast dim chain + fact shuffles"),
    ("win_ntile_pct",
     "exact global ntile/percent_rank/cume_dist with ZERO single-partition "
     "exchanges (two-pass rank, reused range exchange)"),
    ("win_row_number_topk", "per-group top-k: window group-limit pushdown"),
    ("sort_limit_topk", "global top-k: TakeOrderedAndProject, no global sort"),
    ("llm_exact_dedup", "exact dedup: shuffles 32-byte hashes, never text"),
    ("llm_decontaminate",
     "decontamination: eval side broadcast, train corpus never shuffled"),
    ("llm_knn_topk",
     "label-blocked cosine kNN: per-group BLAS in applyInPandas"),
    ("src_parquet_partitioned",
     "partition pruning: status predicate in PartitionFilters"),
    ("join_skew_salted",
     "salted skew join: ShuffledHashJoin on (key, salt), dim replicated "
     "per salt — result hash-identical to the plain join"),
    ("llm_substring_dedup",
     "substring-span dedup: positions collapsed map-side before the "
     "span-total shuffle; totals join back hash-keyed"),
    ("join_bucketed_colocated",
     "co-located bucketed join (r7): SortMergeJoin with ZERO Exchange "
     "under it — both sides read pre-bucketed layout; the only shuffle "
     "in the plan is the final 5-row priority aggregate"),
    ("ts_interpolate",
     "linear interpolation (r7): both neighbor passes are RUNNING "
     "window frames (forward = DESC-ordered running), no UNBOUNDED "
     "FOLLOWING frame anywhere — that frame is O(rows^2)/partition"),
    ("llm_token_budget",
     "global prefix sum (r7): range exchange reused by both branches, "
     "per-partition running sums partitioned by pid — no single-task "
     "global window"),
    ("tpch_q18_shape",
     "Q18 HAVING semi-join (r7): the post-HAVING big-order key set is "
     "AQE-broadcast back onto lineitem (BuildLeft) — the fact table "
     "never re-shuffles for the filter; top-100 via "
     "TakeOrderedAndProject"),
    ("win_pareto_concentration",
     "Pareto deciles (r7): the classic global running-sum window as "
     "the two-pass distributed prefix sum — range exchange + pid-"
     "partitioned local sums, broadcast-scalar total, integer-exact "
     "decile assignment; no single-partition exchange"),
    ("join_dynamic_partition_prune",
     "dynamic partition pruning (r7): the dim-side filter reaches the "
     "fact scan as a runtime dynamicpruning subquery in "
     "PartitionFilters — no static fact predicate exists; non-matching "
     "partitions are never listed"),
    ("join_range_bucketed",
     "keyless range join (r7): time quantized to window-sized buckets "
     "turns the inequality into a hash EQUI join + residual — no "
     "BroadcastNestedLoop anywhere"),
    ("tpch_q6_shape",
     "Q6 (r9): the pushdown benchmark — date range, discount band and "
     "quantity cap ALL in PushedFilters; 4-column ReadSchema; one-row "
     "partial-agg sum, no groupBy shuffle"),
    ("join_geo_radius",
     "grid-bucketed spatial radius join (r9): 3x3 probe replication is "
     "a literal explode; the join is a hash EQUI join on the cell id "
     "with the exact integer distance as residual — no cross join, no "
     "BNLJ"),
    ("graph_triangles",
     "triangle counting (r9): degree-ordered orientation (out-degree "
     "<= O(sqrt m)) then wedge + closing-edge probes as equi joins; "
     "the only nested-loop joins glue the three ONE-ROW count legs"),
    ("tpch_q13_shape",
     "Q13 (r10): LEFT OUTER order-count distribution with the fact "
     "side PINNED to SortMergeJoin — no BroadcastHashJoin anywhere; "
     "the per-customer aggregate reuses the join's custkey exchange"),
    ("tpch_q21_shape",
     "Q21 (r10): double-correlated EXISTS/NOT-EXISTS decorrelated to "
     "two orderkey-sharing hash aggregates — no BroadcastNestedLoop, "
     "no per-row probes; top-25 via TakeOrderedAndProject"),
    ("tpch_q17_shape",
     "Q17 (r10): correlated scalar-AVG as per-part stats joined back; "
     "the 20%-of-average threshold is integer cross-multiplication "
     "(5*q*n < sum), so no double sits near the boundary"),
    ("llm_ann_ivf_served",
     "served ANN (r12): the query plan reads the PERSISTED cell-"
     "partitioned Lloyd index (plain parquet scans — no fit stage); "
     "TWO-LEVEL coarse probe — ~n^0.25 super-centroids broadcast, "
     "then only the probed groups' ~sqrt(k) member centroids — "
     "candidates equi-join on cell"),
    ("llm_ann_ivf_pq",
     "IVF-PQ ADC scoring (r12): the candidate-scoring joins carry "
     "(vec_id, m, code) smallints — never a 64-double embedding — "
     "against the broadcast 4x16x16 codebook frame; raw vectors are "
     "touched only in the persisted-index scan and the query-side "
     "table build"),
    ("llm_semdedup_pq",
     "PQ-shortlisted SemDeDup (r13): the dedup candidate stream is "
     "ADC-scored through the same code-sized joins (ids + smallint "
     "codes, ~50x lighter than embedding pairs); raw embeddings join "
     "only the per-query top-32 shortlist for the exact tau verify, "
     "then star-CC"),
    ("mm_phash_neardup",
     "perceptual media near-dup (r13; r14 cache): shingle/vote/"
     "signature are scan-fused JVM HOFs over the binary payload — the "
     "binary column never reaches an Exchange; the (doc_id, phash) "
     "signature frame is cached, so BOTH banded self-join sides read "
     "one InMemoryRelation (the r13 twin-subtree rebuild is gone) and "
     "the banded Hamming join shuffles 4 narrow rows per doc"),
    ("llm_substring_cut",
     "substring-dedup rewrite (r14): span totals from one partial-agg "
     "shuffle, duplicated grams join back gram-keyed, per-doc cut "
     "starts collapse to one array row, and the excision is pure JVM "
     "HOFs (flatten/filter-with-index/array_join) — no UDF, corpus "
     "text crosses exactly one shuffle"),
    ("mm_cdc_dedup",
     "content-defined chunk dedup (r14): LBFS cut rule + span slicing "
     "+ md5 digests all fused into the scan as JVM HOFs; the two "
     "Exchanges are the exact-distinct pair — (chunk_md5, doc_id, len) "
     "then per-digest partials, ~48 B/chunk, never payload or chunk text"),
    ("graph_label_prop",
     "synchronous LPA communities (r14): per round one cached-"
     "adjacency equi-join + two partial-aggregable shuffles; the "
     "per-node argmax is min(struct(-cnt,lbl)) — HashAggregate pair "
     "for the count, partial+final SortAggregate pair for the "
     "struct-min (map-side combine on both), no Window node anywhere"),
    ("src_parquet_zorder",
     "z-ordered layout (r10): both halves of the 2-D predicate reach "
     "the persisted layout scan as PushedFilters — user AND time prune "
     "row groups simultaneously because the file sort key interleaves "
     "range-normalized buckets of both dimensions"),
]

DETAIL_KEYS = ("PushedFilters", "PartitionFilters", "ReadSchema",
               "Arguments: [n_name", "functions:")


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from gdxpy_spark import registry

    queries = registry.all_queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = [
        "# PLANS — executed physical plans of headline queries",
        "",
        '`df.explain("formatted")` equivalents captured from EXECUTED plans',
        "(AQE-final) at sf0.1 on local[32], regenerated each round by",
        "`python make_plans.py`. What to look for is noted per query;",
        "plan-shape regressions are enforced by tests/test_plans.py, this",
        "file is the human-readable evidence.",
        "",
    ]
    for name, why in PICKS:
        df = queries[name].fn(spark, sf)
        df.write.format("noop").mode("overwrite").save()  # AQE-finalize
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        spark.catalog.clearCache()
        lines = plan.splitlines()
        tree_end = next(
            (i for i, l in enumerate(lines) if not l.strip()), len(lines)
        )
        details = [
            l for l in lines[tree_end:] if any(k in l for k in DETAIL_KEYS)
        ]
        out += [f"## {name}", f"_{why}_", "", "```", *lines[:tree_end]]
        if details:
            out += ["--- key details ---", *details[:12]]
        out += ["```", ""]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md: {len(PICKS)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
