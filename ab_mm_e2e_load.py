#!/usr/bin/env python
"""mm_e2e_dedup contention-downside probe (r15, VERDICT item #3).

Times the registered (threaded) mm_e2e_dedup against a strictly
sequential composition of the same tier bodies, alternated in ONE
session — optionally under an induced CPU load (LOAD_THREADS busy
Python threads in a subprocess) to emulate the stolen-core windows
where r14's driver run saw the threaded shape blow up 12.6x while
sequential heavies degraded 3-5x.

Usage:
    SPARK_GRAFT_CPUS=32 python ab_mm_e2e_load.py            # quiet box
    LOAD_THREADS=24 python ab_mm_e2e_load.py                # loaded box
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

_HOG = r"""
import multiprocessing, time, sys
def spin():
    t_end = time.time() + 3600
    x = 1
    while time.time() < t_end:
        x = (x * 1103515245 + 12345) % (1 << 31)
n = int(sys.argv[1])
ps = [multiprocessing.Process(target=spin, daemon=True) for _ in range(n)]
[p.start() for p in ps]
print("hog up", flush=True)
[p.join() for p in ps]
"""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    alts = int(os.environ.get("AB_ALTS", "2"))
    load = int(os.environ.get("LOAD_THREADS", "0"))

    from gdxpy_spark import registry
    from gdxpy_spark.operators._util import release_managed_caches
    from gdxpy_spark.operators.llm import _semdedup_pairs
    from gdxpy_spark.operators.multimodal import _phash_dups, media_table
    from gdxpy_spark.session import get_spark
    from gdxpy_spark.tables import table

    registry.load_all()
    qs = registry.all_queries()
    spark = get_spark(app="gdxpy_spark_ab_mm_e2e", cpus=cpus)
    sc = spark.sparkContext

    r = spark.range(10000)
    r.groupBy((F.col("id") % 7).alias("g")).agg(F.sum("id"), F.avg("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    def sequential_funnel():
        media = media_table(spark, sf_dir)
        s1 = (
            media.select(
                "doc_id",
                F.sha2(F.expr("substring(media, 17, 128)"), 256).alias("h"),
            )
            .groupBy("h")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        pdup = _phash_dups(spark, sf_dir).select(F.col("dup_id").alias("doc_id"))
        s2 = s1.join(pdup, "doc_id", "left_anti")
        sdup = _semdedup_pairs(spark, sf_dir).select(F.col("dup_id").alias("doc_id"))
        s3 = s2.join(sdup, "doc_id", "left_anti")

        def cnt(df, stage):
            return df.agg(F.count("*").cast("bigint").alias("n_docs")).select(
                F.lit(stage).alias("stage"), "n_docs"
            )

        docs = table(spark, sf_dir, "documents").select("doc_id")
        return (
            cnt(docs, "raw")
            .unionByName(cnt(s1, "exact"))
            .unionByName(cnt(s2, "perceptual"))
            .unionByName(cnt(s3, "semantic"))
        )

    def run(variant: str) -> float:
        sc.setJobDescription(f"mm_e2e_ab:{variant}")
        t0 = time.perf_counter()
        if variant == "threaded":
            df = qs["mm_e2e_dedup"].fn(spark, sf_dir)
        else:
            df = sequential_funnel()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        release_managed_caches()
        spark.catalog.clearCache()
        return round(dt, 4)

    hog = None
    if load:
        hog = subprocess.Popen(
            [sys.executable, "-c", _HOG, str(load)], stdout=subprocess.PIPE
        )
        hog.stdout.readline()  # wait for "hog up"
        time.sleep(1)

    try:
        # warmup both once (fills the session memos so neither side pays
        # the first-fit cost inside its timed alternations)
        run("threaded")
        run("sequential")
        walls = {"threaded": [], "sequential": []}
        for i in range(alts):
            order = (
                ("threaded", "sequential")
                if i % 2 == 0
                else ("sequential", "threaded")
            )
            for v in order:
                walls[v].append(run(v))
                print(f"alt {i} {v}: {walls[v][-1]}", flush=True)
    finally:
        if hog:
            hog.kill()

    out = {
        "load_threads": load,
        "threaded": walls["threaded"],
        "sequential": walls["sequential"],
        "threaded_min": min(walls["threaded"]),
        "sequential_min": min(walls["sequential"]),
        "ratio_min": round(min(walls["threaded"]) / min(walls["sequential"]), 3),
        "cpus": cpus,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    path = os.environ.get("AB_OUT", "/tmp/ab_mm_e2e_load.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
