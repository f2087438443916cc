#!/usr/bin/env python
"""Focused same-session A/B for llm_ann_ivf_checked (r15): fan_out on
ONLY the posexplode distance subtree's input (the 2.9 s single-split
stage the ivf_stage probe attributed), not the loader (the blanket
loader-level patch measured 1.31x WORSE — ab_fanout_embeddings.py).
New body = registered body with `ve` built from fan_out(e) and shared
by both distance subtrees; result identity asserted."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window as W, functions as F


def checked_fanned(spark, sf_dir):
    from gdxpy_spark.operators._util import fan_out
    from gdxpy_spark.operators.llm import (
        _cosine_top1,
        _kmeans_fit,
        _super_quantize,
        _with_norm,
    )
    from gdxpy_spark.tables import table

    asg, cents = _kmeans_fit(spark, sf_dir)
    e = _with_norm(table(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    cent_rows = [(j, p, x) for j, c in enumerate(cents) for p, x in enumerate(c)]
    cdf = spark.createDataFrame(cent_rows, "cell INT, pos INT, c DOUBLE")
    ve = (
        fan_out(e, spark)
        .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .withColumn("v", F.col("v").cast("double"))
    )
    d2 = (
        ve.join(F.broadcast(cdf), "pos")
        .groupBy("vec_id", "cell")
        .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("d2"))
    )
    grp_of, scents = _super_quantize(cents)
    srows = [(j, p, x) for j, c in enumerate(scents) for p, x in enumerate(c)]
    sdf = spark.createDataFrame(srows, "grp INT, pos INT, c DOUBLE")
    vs = (
        ve.join(F.broadcast(sdf), "pos")
        .groupBy("vec_id", "grp")
        .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("sd2"))
    )
    ws = W.partitionBy("vec_id").orderBy(F.col("sd2").asc(), F.col("grp").asc())
    vtop = (
        vs.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= 2)
        .select("vec_id", "grp")
    )
    memb = spark.createDataFrame(
        [(c, gg) for c, gg in enumerate(grp_of)], "cell INT, grp INT"
    )
    w = W.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cell").asc())
    probes = (
        d2.join(F.broadcast(memb), "cell")
        .join(vtop, ["vec_id", "grp"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("vec_id", "cell")
    )
    index_ids = asg.select("cell", "vec_id")
    cand = (
        probes.alias("q")
        .join(index_ids.alias("x"), "cell")
        .filter(F.col("q.vec_id") != F.col("x.vec_id"))
        .select(F.col("q.vec_id").alias("vec_id"), F.col("x.vec_id").alias("nn_id"))
        .distinct()
    )
    return _cosine_top1(e, cand)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    alts = int(os.environ.get("AB_ALTS", "3"))

    from gdxpy_spark import registry
    from gdxpy_spark.operators._util import release_managed_caches
    from gdxpy_spark.session import get_spark

    registry.load_all()
    qs = registry.all_queries()
    spark = get_spark(app="gdxpy_spark_ab_ivf_site", cpus=cpus)
    sc = spark.sparkContext

    r = spark.range(10000)
    r.groupBy((F.col("id") % 7).alias("g")).agg(F.sum("id"), F.avg("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    a = sorted(map(tuple, qs["llm_ann_ivf_checked"].fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, checked_fanned(spark, sf_dir).collect()))
    assert a == b, f"VARIANTS DIVERGE: {len(a)} vs {len(b)}"
    print(f"identity ok: {len(a)} rows", flush=True)

    def run(variant: str) -> float:
        sc.setJobDescription(f"ivf_checked_ab:{variant}")
        t0 = time.perf_counter()
        df = (
            qs["llm_ann_ivf_checked"].fn(spark, sf_dir)
            if variant == "old"
            else checked_fanned(spark, sf_dir)
        )
        df.write.format("noop").mode("overwrite").save()
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
        "cpus": cpus,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    with open(os.environ.get("AB_OUT", "/tmp/ab_ivf_checked_site.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
