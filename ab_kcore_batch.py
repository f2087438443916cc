#!/usr/bin/env python
"""Same-session A/B: graph_kcore with 1 vs 2 peel rounds per
localCheckpoint+count (r15 — the CC round-batching idea applied to the
monotone k-core peel; see ab_cc_batch.py). Peeling a stable set is an
identity, so checking the fixpoint every 2 rounds reaches the same
fixpoint with half the eager materializations; the converged edge set
(and hence the output) is identical, asserted on every run."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def kcore_batched(spark, sf_dir, rounds_per_ckpt=2):
    from gdxpy_spark.operators.graphs import _KCORE_K, _copurchase_edges

    e = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    n = e.count()
    for _ in range(50):
        cur = e
        for _r in range(rounds_per_ckpt):
            deg = (
                cur.select(F.col("pa").alias("node"))
                .unionAll(cur.select(F.col("pb").alias("node")))
                .groupBy("node")
                .agg(F.count("*").alias("d"))
            )
            keep = deg.filter(F.col("d") >= _KCORE_K).select("node")
            cur = cur.join(
                keep.withColumnRenamed("node", "pa"), "pa", "leftsemi"
            ).join(keep.withColumnRenamed("node", "pb"), "pb", "leftsemi")
        nxt = cur.localCheckpoint(eager=True)
        m = nxt.count()
        if m == n:
            break
        e, n = nxt, m
    return (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("core_degree"))
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    alts = int(os.environ.get("AB_ALTS", "3"))

    from gdxpy_spark import registry
    from gdxpy_spark.session import get_spark

    registry.load_all()
    qs = registry.all_queries()
    spark = get_spark(app="gdxpy_spark_ab_kcore", cpus=cpus)
    sc = spark.sparkContext

    r = spark.range(10000)
    r.groupBy((F.col("id") % 7).alias("g")).agg(F.sum("id"), F.avg("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    a = sorted(map(tuple, qs["graph_kcore"].fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, kcore_batched(spark, sf_dir).collect()))
    assert a == b, f"VARIANTS DIVERGE: {len(a)} vs {len(b)}"
    print(f"identity ok: {len(a)} rows", flush=True)

    def run(variant: str) -> float:
        sc.setJobDescription(f"kcore_ab:{variant}")
        t0 = time.perf_counter()
        if variant == "old":
            df = qs["graph_kcore"].fn(spark, sf_dir)
        else:
            df = kcore_batched(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
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
        "cpus": cpus,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    with open(os.environ.get("AB_OUT", "/tmp/ab_kcore_batch.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
