#!/usr/bin/env python
"""Same-session alternated A/B for the r14 fan-out long tail (r15,
VERDICT item #6): llm_lang_id, llm_doc_quality, llm_bm25_score,
llm_repetition_filter — the four sub-0.5 s documents readers r14
measured at 0.57-0.81x but left for churn-bounding.

Old side = the registered body; new side = the same body with the
documents scan fanned out (module-level `table` patched to apply
_util.fan_out to the documents frame — for these single-table map
pipelines that is exactly the one-line per-op edit)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

QUERIES = [
    "llm_lang_id",
    "llm_doc_quality",
    "llm_bm25_score",
    "llm_repetition_filter",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    alts = int(os.environ.get("AB_ALTS", "2"))

    from gdxpy_spark import registry
    from gdxpy_spark.operators import llm, text_analysis
    from gdxpy_spark.operators._util import fan_out
    from gdxpy_spark.session import get_spark
    from gdxpy_spark.tables import table as real_table

    registry.load_all()
    qs = registry.all_queries()
    spark = get_spark(app="gdxpy_spark_ab_fanout_tail", cpus=cpus)
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
        return fan_out(df, sp) if name == "documents" else df

    def run(qname: str, variant: str) -> float:
        mods = [llm, text_analysis]
        if variant == "new":
            for m in mods:
                m.table = fanned_table
        try:
            sc.setJobDescription(f"fanout_tail:{qname}:{variant}")
            t0 = time.perf_counter()
            qs[qname].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
        finally:
            for m in mods:
                m.table = real_table
            sc.setJobDescription(None)
            spark.catalog.clearCache()
        return round(dt, 4)

    out = {"cpus": cpus, "sf_dir": sf_dir, "queries": {}}
    for q in QUERIES:
        # warmup both variants once
        run(q, "old")
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

    with open(os.environ.get("AB_OUT", "/tmp/ab_fanout_tail.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
