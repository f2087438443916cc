#!/usr/bin/env python
"""Isolated per-query probe for the r14 optimization round.

Times a NAMED SUBSET of registered queries with bench.py's exact
methodology (same session builder, same warmers, same calibration
probes, best-of-N noop-sink timing, clearCache between trials) so
before/after comparisons stay apples-to-apples without paying the
full 282-query bench wall on every iteration — this round's box runs
~5-9x slower than the committed rounds' (calibration cpu 2.76 vs the
0.29 hist-min; SCALE.md r14-opt notes), so the full bench is a
~100-minute artifact reserved for the round's committed pair.

Usage:
    python opt_probe.py --out /tmp/probe.json [--trials 2] \
        [--plans plans/r14 --plan-suffix before] q1 q2 ...

With --plans, also writes each query's .explain("formatted") to
<plans-dir>/<query>_<suffix>.txt (the optimization-round evidence
contract). Plans are captured AFTER the timed loop so explain-time
eager work (index ensure, CC driver loops) cannot pollute timings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--plan-suffix", default="before")
    args = ap.parse_args()

    if os.environ.get("GDXPS_IVF_TARGET_CELL"):
        sys.exit("GDXPS_IVF_TARGET_CELL is set; unset it before probing")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from gdxpy_spark import registry
    from gdxpy_spark.session import get_spark

    registry.load_all()
    qs = registry.all_queries()
    unknown = [n for n in args.queries if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app="gdxpy_spark_opt_probe", cpus=cpus)

    # A/B harness for runtime SQL confs (guide §1.2 step 3: config only
    # after algorithm + per-task work): GDXPS_PROBE_CONF="k=v,k=v"
    # applies before any query is planned, so two probe runs differing
    # only in this env var isolate a config's effect on the same code.
    conf_overrides = os.environ.get("GDXPS_PROBE_CONF", "")
    for kv in filter(None, conf_overrides.split(",")):
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())

    # bench.py's warmers: codegen agg, broadcast join, pandas UDF
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    r = spark.range(10000)
    r.groupBy((F.col("id") % 7).alias("g")).agg(
        F.sum("id"), F.avg("id")
    ).write.format("noop").mode("overwrite").save()
    r.join(F.broadcast(spark.range(100)), "id").write.format("noop").mode(
        "overwrite"
    ).save()

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    r.select(_warm(F.col("id").cast("double"))).write.format("noop").mode(
        "overwrite"
    ).save()

    def _cal_probe(df):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best or 1e9, time.perf_counter() - t0)
        return round(best, 4)

    cal = {
        "cpu": _cal_probe(
            spark.range(5_000_000).groupBy((F.col("id") % 101).alias("g"))
            .agg(F.sum("id"), F.avg("id"), F.count("*"))
        ),
        "scan": _cal_probe(
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .agg(F.sum("l_quantity"), F.sum("l_extendedprice"))
        ),
        "bcast": _cal_probe(
            spark.range(1_000_000).join(F.broadcast(spark.range(1_000)), "id")
        ),
    }

    times = {}
    for n in args.queries:
        spark.sparkContext.setJobDescription(f"probe:{n}")
        best = None
        for _ in range(max(1, args.trials)):
            t0 = time.perf_counter()
            qs[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        times[n] = round(best, 4)
        print(f"  {n}: {times[n]}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for n in args.queries:
            df = qs[n].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            p = os.path.join(args.plans, f"{n}_{args.plan_suffix}.txt")
            with open(p, "w") as f:
                f.write(plan)
            spark.catalog.clearCache()

    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "trials": args.trials,
        "calibration": cal,
        "queries": times,
        "total": round(sum(times.values()), 4),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"calibration": cal, "total": out["total"]}))


if __name__ == "__main__":
    main()
