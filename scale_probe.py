#!/usr/bin/env python
"""Scale probe: run the heavy pipeline operators at 1× (sf0.1) and 10×
(a 50k-doc corpus derived from sf0.1: 10 copies, shifted ids, per-copy
token perturbation, written as 32 parquet files so the scan has real
splits — the shape production data actually has) and report the
wall-clock ratio. The point is empirical evidence for SCALE.md's
claims: map/agg ops should be ~flat (cores absorb 10×), blocked ops
~linear, and `blocked_jaccard_auto` must ROUTE to the distributed
bitmask plan once per-bucket doc counts trip the matmul memory model.

Usage: python scale_probe.py   (builds the 10× corpus in /tmp on first run)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

S1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_SRC_TABLES = (
    "documents", "embeddings", "lineitem", "customer", "events",
    "orders", "supplier", "nation", "region", "part",
)


def _s10_dir() -> str:
    # content-keyed cache dir (r10 advice): the _corpus_v3 marker fixed
    # CODE-version staleness but not SOURCE staleness — regenerated
    # sf0.1 tables would keep serving the old 10x corpus. Embedding a
    # files_fingerprint of every source table in the directory name
    # makes each source generation its own cache entry (the same
    # discipline as the IVF/zorder/WARC caches).
    from gdxpy_spark.operators._util import files_fingerprint

    fp = files_fingerprint(
        [os.path.join(S1, t + ".parquet") for t in _SRC_TABLES]
    )
    return f"/tmp/gdxpy_spark_scaleprobe/sfx10_{fp}"


S10 = _s10_dir()
_MARKER = "_corpus_v3"


def build_10x(spark) -> None:
    from pyspark.sql import functions as F

    from gdxpy_spark.operators._util import atomic_publish
    from gdxpy_spark.tables import table

    # completion marker inside the content-keyed dir; the whole corpus
    # is built into a private build dir and published with ONE rename
    # (atomic_publish), so a crash mid-build can never leave a
    # mixed-generation dir a concurrent probe could read.
    if os.path.exists(os.path.join(S10, _MARKER)):
        return
    build = f"{S10}.build_{os.getpid()}"
    _build_10x_into(spark, F, table, build)
    open(os.path.join(build, _MARKER), "w").close()
    atomic_publish(
        build, S10,
        is_complete=lambda d: os.path.exists(os.path.join(d, _MARKER)),
    )


def _build_10x_into(spark, F, table, S10) -> None:
    os.makedirs(S10, exist_ok=True)
    docs = table(spark, S1, "documents")
    big = None
    for i in range(10):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        if i:
            c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" c{i}tok")))
        big = c if big is None else big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(S10 + "/documents.parquet")
    emb = table(spark, S1, "embeddings")
    big_e = None
    for i in range(10):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        big_e = c if big_e is None else big_e.unionByName(c)
    big_e.repartition(8).write.mode("overwrite").parquet(S10 + "/embeddings.parquet")
    # r9: relational/event tables for the graph/spatial/ts/TPC-H probes.
    # Key shifts keep each copy disjoint (graph = 10 disjoint components,
    # geo = 10 fresh lattice sweeps, events = 10x users with the same
    # per-user history length) — volume scales 10x, per-key state doesn't.
    li = table(spark, S1, "lineitem")
    big_l = None
    for i in range(10):
        c = li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
        ).withColumn("l_partkey", F.col("l_partkey") + F.lit(i * 10_000_000))
        big_l = c if big_l is None else big_l.unionByName(c)
    big_l.repartition(32).write.mode("overwrite").parquet(S10 + "/lineitem.parquet")
    cu = table(spark, S1, "customer")
    big_c = None
    for i in range(10):
        c = cu.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 1_000_000))
        big_c = c if big_c is None else big_c.unionByName(c)
    big_c.repartition(8).write.mode("overwrite").parquet(S10 + "/customer.parquet")
    ev = table(spark, S1, "events")
    big_v = None
    for i in range(10):
        c = ev.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 100_000_000)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
        big_v = c if big_v is None else big_v.unionByName(c)
    big_v.repartition(16).write.mode("overwrite").parquet(S10 + "/events.parquet")
    # r10: orders (key shifts MATCH lineitem's orderkey and customer's
    # custkey stride, so the TPC-H spine joins stay consistent at 10×)
    # and supplier (a true dimension — copied 1×, like part at real SF)
    od = table(spark, S1, "orders")
    big_o = None
    for i in range(10):
        c = od.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * 1_000_000))
        big_o = c if big_o is None else big_o.unionByName(c)
    big_o.repartition(16).write.mode("overwrite").parquet(S10 + "/orders.parquet")
    for dim in ("supplier", "nation", "region"):
        table(spark, S1, dim).write.mode("overwrite").parquet(
            S10 + f"/{dim}.parquet"
        )
    # part must shift IN STEP with lineitem.l_partkey (review catch: an
    # unshifted copy left 90% of 10× lineitem rows referencing no part,
    # so every part-joining probe measured ~1× post-join volume). At
    # real TPC-H scale part grows with SF too, so a 10× part is honest.
    pt = table(spark, S1, "part")
    big_p = None
    for i in range(10):
        c = pt.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * 10_000_000))
        big_p = c if big_p is None else big_p.unionByName(c)
    big_p.repartition(4).write.mode("overwrite").parquet(S10 + "/part.parquet")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from gdxpy_spark import registry
    from gdxpy_spark.operators.llm import blocked_jaccard_auto
    from gdxpy_spark.tables import table

    build_10x(spark)
    queries = registry.all_queries()
    queries["udf_pandas_scalar"].fn(spark, S1).write.format("noop").mode(
        "overwrite"
    ).save()  # absorb python-worker-pool spawn

    def timed(fn):
        # best-of-2: single-shot rows proved too noisy to compare (r7:
        # two same-code runs disagreed 4x on the heavy ops — first-run
        # codegen/broadcast warmup plus box variance); the SECOND run's
        # time is the steady-state plan cost, min() guards against a
        # contention spike landing on it
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best or 1e9, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(best, 2)

    def jac(sf, thr=0.95):
        docs = table(spark, sf, "documents")
        tok = docs.select(
            "doc_id",
            (F.col("n_chars") / 100).cast("bigint").alias("native"),
            F.array_remove(F.array_distinct(F.split("text", " ")), "").alias(
                "tokens"
            ),
        )
        return blocked_jaccard_auto(spark, tok, thr)

    # routing assertion: at 10x the per-bucket doc counts trip nd² >
    # max_cells, so the executed plan MUST contain the bitmask fallback
    plan = jac(S10)._jdf.queryExecution().executedPlan().toString()
    routed = "bit_count" in plan
    spark.catalog.clearCache()
    print(f"bitmask routed at 10x: {routed}")
    assert routed, "auto-router failed to degrade to the distributed plan"

    rows = []
    for name in ("llm_exact_dedup", "llm_train_split", "llm_tf",
                 "llm_doc_quality", "llm_decontaminate", "llm_minhash_dedup",
                 "llm_knn_brute", "llm_ann_lsh",
                 # r6 additions over the documents corpus
                 "llm_substring_dedup", "llm_repetition_filter",
                 "llm_temperature_sample", "llm_e2e_pipeline",
                 # r7 additions over the documents corpus
                 "llm_pii_text", "llm_chunk_overlap",
                 "llm_incremental_dedup", "llm_zipf_slope",
                 # r8 additions over the documents corpus
                 "llm_heavy_hitters", "llm_perplexity_proxy",
                 "llm_dedup_keep_best", "llm_hash_sample",
                 "llm_docfreq_prune", "llm_bpe_train",
                 # r9 additions (documents + relational/event tables;
                 # build_10x ships 10x lineitem/customer/events too)
                 "llm_boilerplate_ngrams", "llm_vocab_coverage",
                 "llm_mlm_mask", "mm_exact_dedup", "graph_triangles",
                 "join_geo_radius", "ts_ewma", "tpch_q1_shape",
                 "tpch_q6_shape", "graph_degree_topk", "llm_bm25_score",
                 "llm_gopher_rep_stats", "ts_autocorr", "udtf_table_arg",
                 "ts_vwap_hourly", "fn_collate_group",
                 # r10 additions: TPC-H spine (10x orders join 10x
                 # lineitem/customer; supplier stays dimension-sized),
                 # served ANN (2nd run = serving-only via the persisted
                 # index), BPE apply (2nd run = apply-only via the
                 # merge-table memo) — timed() reports min-of-2, so the
                 # build/train cost is excluded by construction
                 "tpch_q4_shape", "tpch_q13_shape", "tpch_q21_shape",
                 "tpch_q22_shape", "llm_ann_ivf_served", "llm_bpe_apply",
                 # r10 second wave
                 "tpch_q2_shape", "tpch_q7_shape", "tpch_q8_shape",
                 "tpch_q15_shape", "tpch_q16_shape", "tpch_q17_shape",
                 "llm_span_corruption", "llm_semdedup", "llm_ann_ivf",
                 # r10 third wave
                 "fn_zorder", "src_parquet_zorder", "ts_holt_winters",
                 "join_interval_overlap",
                 # r11 additions
                 "llm_kneser_ney", "llm_dsir_weights", "graph_components",
                 "llm_kmeans_lloyd", "llm_ann_ivf_checked"):
        a = timed(lambda: queries[name].fn(spark, S1))
        b = timed(lambda: queries[name].fn(spark, S10))
        rows.append((name, a, b))
    a = timed(lambda: jac(S1))
    b = timed(lambda: jac(S10))
    rows.append(("blocked_jaccard@0.95", a, b))
    print(f"{'op':25s} {'1x':>7s} {'10x':>7s} {'ratio':>6s}")
    for name, a, b in rows:
        print(f"{name:25s} {a:7.2f} {b:7.2f} {b / max(a, 1e-9):6.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
