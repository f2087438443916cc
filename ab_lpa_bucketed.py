#!/usr/bin/env python
"""Same-session A/B: graph_label_prop with the cached adjacency (r14
shape) vs a BUCKETED adjacency table keyed on `nbr` (r15, VERDICT item
#8 — the storage-layout fix the rejected r14 query-side prepartition
pointed at). The bucketed variant builds the adjacency once as a
bucketed+sorted saveAsTable inside the query, reads it across all 4
LPA rounds, and drops it after; the question is whether the per-round
`Exchange hashpartitioning(nbr)` disappears and whether the write+read
round-trip repays the removed exchanges at sf0.1.

Captures both variants' .explain("formatted") to plans/r15/.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def lpa_bucketed(spark, sf_dir, n_buckets: int):
    from gdxpy_spark.operators.graphs import _LPA_ROUNDS, _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    adj = e.select(F.col("pa").alias("u"), F.col("pb").alias("nbr")).unionAll(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("nbr"))
    )
    tbl = f"lpa_adj_{uuid.uuid4().hex[:8]}"
    (
        adj.write.bucketBy(n_buckets, "nbr")
        .sortBy("nbr")
        .mode("overwrite")
        .saveAsTable(tbl)
    )
    badj = spark.table(tbl)
    labels = badj.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            badj.join(labels.select(F.col("node").alias("nbr"), "lbl"), "nbr")
            .groupBy("u", "lbl")
            .agg(F.count("*").alias("cnt"))
        )
        best = votes.groupBy("u").agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("lbl"))).alias("b")
        )
        labels = best.select(F.col("u").alias("node"), F.col("b.lbl").alias("lbl"))
    return labels.select("node", F.col("lbl").alias("community_id")), tbl


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    alts = int(os.environ.get("AB_ALTS", "3"))
    plans_dir = os.environ.get("AB_PLANS", "plans/r15")

    from gdxpy_spark import registry
    from gdxpy_spark.operators._util import release_managed_caches
    from gdxpy_spark.session import get_spark

    registry.load_all()
    qs = registry.all_queries()
    spark = get_spark(app="gdxpy_spark_ab_lpa", cpus=cpus)
    sc = spark.sparkContext
    n_buckets = sc.defaultParallelism

    r = spark.range(10000)
    r.groupBy((F.col("id") % 7).alias("g")).agg(F.sum("id"), F.avg("id")).write.format(
        "noop"
    ).mode("overwrite").save()
    r.join(F.broadcast(spark.range(100)), "id").write.format("noop").mode(
        "overwrite"
    ).save()

    def explain(df) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    # identity + plan capture
    old_df = qs["graph_label_prop"].fn(spark, sf_dir)
    a = sorted(map(tuple, old_df.collect()))
    os.makedirs(plans_dir, exist_ok=True)
    with open(os.path.join(plans_dir, "graph_label_prop_before.txt"), "w") as f:
        f.write(explain(old_df))
    release_managed_caches()
    spark.catalog.clearCache()
    new_df, tbl = lpa_bucketed(spark, sf_dir, n_buckets)
    b = sorted(map(tuple, new_df.collect()))
    with open(
        os.path.join(plans_dir, "graph_label_prop_bucketed_experiment.txt"), "w"
    ) as f:
        f.write(explain(new_df))
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    assert a == b, f"VARIANTS DIVERGE: {len(a)} vs {len(b)}"
    print(f"identity ok: {len(a)} rows", flush=True)

    def run(variant: str) -> float:
        sc.setJobDescription(f"lpa_ab:{variant}")
        t0 = time.perf_counter()
        if variant == "old":
            df = qs["graph_label_prop"].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        else:
            df, tbl = lpa_bucketed(spark, sf_dir, n_buckets)
            df.write.format("noop").mode("overwrite").save()
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        release_managed_caches()
        spark.catalog.clearCache()
        return round(dt, 4)

    walls = {"old": [], "new": []}
    for i in range(alts):
        for v in ("old", "new") if i % 2 == 0 else ("new", "old"):
            walls[v].append(run(v))
            print(f"alt {i} {v}: {walls[v][-1]}", flush=True)

    out = {
        "old": walls["old"],
        "new": walls["new"],
        "old_min": min(walls["old"]),
        "new_min": min(walls["new"]),
        "ratio_min": round(min(walls["new"]) / min(walls["old"]), 3),
        "n_buckets": n_buckets,
        "cpus": cpus,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    with open(os.environ.get("AB_OUT", "/tmp/ab_lpa_bucketed.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
