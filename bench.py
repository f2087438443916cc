#!/usr/bin/env python
"""Benchmark: run every oracle-checkable query (SURVEY §2.2) at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS], one warm SparkSession,
and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Materialization is `noop`-sink writes (full execution, no driver collect
overhead). `--duckdb` additionally times the DuckDB oracle SQL for the
same queries and reports the ratio to stderr — the 2× gate of BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _run_spark(names, qs, spark, sf_dir):
    times = {}
    for n in names:
        t0 = time.perf_counter()
        qs[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[n] = round(time.perf_counter() - t0, 4)
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from gdxpy_spark import registry
    from gdxpy_spark.session import get_spark

    qs = registry.all_queries()
    names = sorted(n for n, q in qs.items() if q.oracle)

    spark = get_spark(app="gdxpy_spark_bench", cpus=cpus)
    # warm up the JVM/codegen once (BASELINE.md bench-honesty note: session
    # startup is amortized, per-query times are steady-state)
    qs["agg_groupby_basic"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    times = _run_spark(names, qs, spark, sf_dir)
    total = round(sum(times.values()), 4)

    if "--duckdb" in sys.argv:
        import duckdb

        from gdxpy_spark.tables import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        dtimes = {}
        for n in names:
            t0 = time.perf_counter()
            con.execute(qs[n].oracle).fetchall()
            dtimes[n] = round(time.perf_counter() - t0, 4)
        dtotal = round(sum(dtimes.values()), 4)
        ratio = round(total / dtotal, 3) if dtotal else float("inf")
        print(
            f"duckdb total={dtotal}s spark total={total}s ratio={ratio}x",
            file=sys.stderr,
        )
        worst = sorted(
            names, key=lambda n: times[n] / max(dtimes[n], 1e-4), reverse=True
        )[:10]
        for n in worst:
            print(
                f"  {n}: spark={times[n]}s duckdb={dtimes[n]}s "
                f"({round(times[n] / max(dtimes[n], 1e-4), 1)}x)",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "metric": "total_wall_clock_oracle_queries",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": _sf_of(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
