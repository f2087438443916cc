#!/usr/bin/env python
"""Standalone calibration cpu probe — bench.py's exact cpu probe
(codegen hash-agg over an in-memory 5M range, best-of-3 noop sink)
after bench.py's three warmers, printed as one line. Used to decide
whether a measurement window is clean (≤1.3× the committed hist-min,
0.2925) before spending a bench/probe wall on it."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from gdxpy_spark.session import get_spark

    spark = get_spark(app="gdxpy_spark_cal_check", cpus=cpus)
    r = spark.range(10000)
    r.groupBy((F.col("id") % 7).alias("g")).agg(F.sum("id"), F.avg("id")).write.format(
        "noop"
    ).mode("overwrite").save()
    r.join(F.broadcast(spark.range(100)), "id").write.format("noop").mode(
        "overwrite"
    ).save()

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    r.select(_warm(F.col("id").cast("double"))).write.format("noop").mode(
        "overwrite"
    ).save()

    df = (
        spark.range(5_000_000)
        .groupBy((F.col("id") % 101).alias("g"))
        .agg(F.sum("id"), F.avg("id"), F.count("*"))
    )
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.perf_counter() - t0)
    print(f"{time.strftime('%H:%M:%S')} cal_cpu={round(best, 4)}")
    spark.stop()


if __name__ == "__main__":
    main()
