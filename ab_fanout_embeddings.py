#!/usr/bin/env python
"""Same-session alternated A/B: fan_out on the embeddings scan for the
IVF family (r15, VERDICT item #4 follow-through). The stage probe
(plans/r15/probes/ivf_stages_before.json) attributes ~2-3 s of
llm_ann_ivf_checked's wall to the posexplode x centroid-broadcast
distance subtree, which runs on ONE core because embeddings.parquet is
a single-split file — the same r14 single-split pathology fan_out
repairs. New side = module-level `table` patched to fan out the
embeddings frame (the per-op one-line edit for these single-table
pipelines)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

QUERIES = [
    "llm_ann_ivf_checked",
    "llm_ann_ivf",
    "llm_ann_ivf_pq",
    "llm_ann_ivf_pq_rerank",
    "llm_semdedup_pq",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    alts = int(os.environ.get("AB_ALTS", "2"))

    from gdxpy_spark import registry
    from gdxpy_spark.operators import llm
    from gdxpy_spark.operators._util import fan_out, release_managed_caches
    from gdxpy_spark.session import get_spark
    from gdxpy_spark.tables import table as real_table

    registry.load_all()
    qs = registry.all_queries()
    spark = get_spark(app="gdxpy_spark_ab_fanout_emb", cpus=cpus)
    sc = spark.sparkContext

    r = spark.range(10000)
    r.groupBy((F.col("id") % 7).alias("g")).agg(F.sum("id"), F.avg("id")).write.format(
        "noop"
    ).mode("overwrite").save()
    r.join(F.broadcast(spark.range(100)), "id").write.format("noop").mode(
        "overwrite"
    ).save()

    def fanned_table(sp, d, name):
        df = real_table(sp, d, name)
        return fan_out(df, sp) if name == "embeddings" else df

    def run(qname: str, variant: str) -> float:
        if variant == "new":
            llm.table = fanned_table
        try:
            sc.setJobDescription(f"fanout_emb:{qname}:{variant}")
            t0 = time.perf_counter()
            qs[qname].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
        finally:
            llm.table = real_table
            sc.setJobDescription(None)
            release_managed_caches()
            spark.catalog.clearCache()
        return round(dt, 4)

    out = {"cpus": cpus, "sf_dir": sf_dir, "queries": {}}
    for q in QUERIES:
        run(q, "old")  # warmup both sides (fills session memos)
        run(q, "new")
        walls = {"old": [], "new": []}
        for i in range(alts):
            for v in ("old", "new") if i % 2 == 0 else ("new", "old"):
                walls[v].append(run(q, v))
        rec = {
            "old": walls["old"],
            "new": walls["new"],
            "old_min": min(walls["old"]),
            "new_min": min(walls["new"]),
            "ratio_min": round(min(walls["new"]) / min(walls["old"]), 3),
        }
        out["queries"][q] = rec
        print(json.dumps({q: rec}), flush=True)

    with open(os.environ.get("AB_OUT", "/tmp/ab_fanout_emb.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
