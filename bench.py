#!/usr/bin/env python
"""Benchmark: run every oracle-checkable query (SURVEY §2.2) at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS], one warm SparkSession,
and print ONE COMPACT JSON line to stdout:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

where "queries" holds only the headline (most expensive) per-query times
so the line stays well under the driver's stdout capture window; the FULL
per-query map is written to BENCH_DETAIL.json next to this script and
echoed to stderr. (Round-1 lesson: a 98-entry map made the stdout line
>2 KB and the driver recorded `parsed: null`.)

Materialization is `noop`-sink writes (full execution, no driver collect
overhead). `--duckdb` additionally times the DuckDB oracle SQL for the
same queries, reports the ratio to stderr — the 2× gate of BASELINE.md —
and persists the evidence to DUCKDB.json (r11 verdict #3: a separate
artifact, so the driver's plain-bench BENCH_DETAIL.json overwrite can't
erase the last gate measurement; plain runs carry it forward as
`duckdb_ratio_prev`).
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


def _run_spark(names, qs, spark, sf_dir, trials=2):
    """Best-of-N per query; trials=2 is the default so the reported
    number is STEADY-STATE, not first-run jitter — a cold first run
    carries ~2-3 s of codegen/broadcast warmup on this box that made
    round-over-round comparisons see phantom ±1 s regressions on
    sub-second queries (e.g. r03's agg_collect_sorted '+1.0 s' on a
    25-row join; see SCALE.md). `--trials 1` restores cold single-shot
    timing when measuring first-run latency itself."""
    times = {}
    for n in names:
        best = None
        for _ in range(max(1, trials)):
            t0 = time.perf_counter()
            qs[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # some ops .cache() mid-plan (bitmask masks, LSH buckets); clear
            # so a 100-query loop doesn't accumulate cached blocks
            spark.catalog.clearCache()
        times[n] = round(best, 4)
    return times


def main() -> None:
    if os.environ.get("GDXPS_IVF_TARGET_CELL"):
        # r13 advice: the scale-probe regime knob re-sizes the IVF
        # quantizer away from the k=sqrt(n) the oracles replay; a
        # leaked export would corrupt the gate evidence.
        sys.exit(
            "GDXPS_IVF_TARGET_CELL is set (scale-probe regime knob); "
            "unset it before benching — oracles replay k=sqrt(n)"
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from gdxpy_spark import registry
    from gdxpy_spark.session import get_spark

    qs = registry.all_queries()
    names = sorted(n for n, q in qs.items() if q.oracle)

    spark = get_spark(app="gdxpy_spark_bench", cpus=cpus)
    # Warm session-global machinery once before the timed loop (BASELINE.md
    # bench-honesty note: session startup is amortized; every TIMED query
    # still pays its own plan's codegen because these warmers are inline
    # throwaway plans, not registered queries): a codegen agg (JIT + noop
    # committer), a broadcast join (broadcast exchange infra), a pandas
    # UDF (Arrow Python worker pool spin-up). Measured: the first query
    # in a fresh session pays ~4-5 s of this regardless of its plan.
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import pandas_udf as _pudf

    r = spark.range(10000)
    r.groupBy((_F.col("id") % 7).alias("g")).agg(
        _F.sum("id"), _F.avg("id")
    ).write.format("noop").mode("overwrite").save()
    r.join(_F.broadcast(spark.range(100)), "id").write.format("noop").mode(
        "overwrite"
    ).save()

    @_pudf("double")
    def _warm(s):
        return s * 1.0

    r.select(_warm(_F.col("id").cast("double"))).write.format("noop").mode(
        "overwrite"
    ).save()

    # Box-identity + calibration block (r6 lesson: a mid-round VM rebuild
    # made BENCH totals incomparable across rounds — SCALE.md documents
    # ±35% contention windows). Three FIXED trivial probes, best-of-3,
    # measured AFTER the warmers so they see the same steady-state the
    # queries do: cpu = codegen hash-agg over an in-memory range (pure
    # JVM throughput), scan = full lineitem parquet scan+count (IO +
    # decode), bcast = broadcast-join machinery. To normalize a
    # cross-boot comparison, scale a round's per-query times by the
    # ratio of calibration values; same boot_id ⇒ directly comparable.
    def _cal_probe(df):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best or 1e9, time.perf_counter() - t0)
        return round(best, 4)

    cal = {
        "cpu": _cal_probe(
            spark.range(5_000_000).groupBy((_F.col("id") % 101).alias("g"))
            .agg(_F.sum("id"), _F.avg("id"), _F.count("*"))
        ),
        # sum real columns, not count(*): a zero-column count never
        # touches data pages, so it measured footer speed, not IO+decode
        "scan": _cal_probe(
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .agg(_F.sum("l_quantity"), _F.sum("l_extendedprice"))
        ),
        "bcast": _cal_probe(
            spark.range(1_000_000).join(
                _F.broadcast(spark.range(1_000)), "id"
            )
        ),
    }
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot_id = f.read().strip()
    except OSError:
        boot_id = "unknown"
    try:
        with open("/proc/uptime") as f:
            uptime_s = round(float(f.read().split()[0]), 0)
    except OSError:
        uptime_s = -1.0

    # Gate-artifact calibration policy (r12 verdict #3: r12 rewrote its
    # committed bench three times chasing a box whose cpu probe swung
    # 0.33→1.53, publishing four different ratios). Compare this run's
    # cpu probe against the PREVIOUS committed BENCH_DETAIL.json's: a
    # run >1.3× slower is box weather, not plans — it still writes its
    # artifacts (the driver's per-round record must exist), but both
    # artifacts carry `calibration_degraded` + the prior value, and
    # stderr says plainly not to commit it as the round's gate evidence.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prev_cal_cpu = None
    hist_cal_cpus = []
    try:
        # the COMMITTED artifacts, not the worktree file: a degraded
        # run's own write must not become the next run's baseline. And
        # not just HEAD's (r13 advice): a box that slows <1.3× per
        # round never trips a last-commit-only gate while the baseline
        # ratchets monotonically — so the reference is the MIN cpu
        # probe over the last 8 commits that touched the artifact.
        import subprocess

        shas = subprocess.run(
            ["git", "-C", repo_dir, "log", "-n", "8", "--format=%H",
             "--", "BENCH_DETAIL.json"],
            capture_output=True, text=True, timeout=10,
        ).stdout.split()
        for i, sha in enumerate(shas):
            committed = subprocess.run(
                ["git", "-C", repo_dir, "show", f"{sha}:BENCH_DETAIL.json"],
                capture_output=True, text=True, timeout=10,
            )
            if committed.returncode != 0:
                continue
            c = json.loads(committed.stdout).get("calibration", {}).get("cpu")
            if c:
                hist_cal_cpus.append(float(c))
                if prev_cal_cpu is None:
                    prev_cal_cpu = c
    except (OSError, ValueError, subprocess.SubprocessError):
        pass
    if prev_cal_cpu is None:
        try:
            with open(os.path.join(repo_dir, "BENCH_DETAIL.json")) as f:
                prev_cal_cpu = json.load(f).get("calibration", {}).get("cpu")
                if prev_cal_cpu:
                    hist_cal_cpus.append(float(prev_cal_cpu))
        except (OSError, ValueError):
            prev_cal_cpu = None
    hist_min_cpu = min(hist_cal_cpus) if hist_cal_cpus else None
    cal_degraded = bool(
        hist_min_cpu and cal["cpu"] > 1.3 * hist_min_cpu
    )
    if cal_degraded:
        print(
            f"WARNING: calibration cpu {cal['cpu']} is "
            f"{cal['cpu'] / hist_min_cpu:.2f}x the best committed run's "
            f"{hist_min_cpu} (last committed: {prev_cal_cpu}) — box "
            "degraded; do NOT commit this run as gate evidence, re-run "
            "on a quiet box",
            file=sys.stderr,
        )

    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "2"))
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    times = _run_spark(names, qs, spark, sf_dir, trials=trials)
    total = round(sum(times.values()), 4)
    ratio = None

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

    duckdb_path = os.path.join(repo_dir, "DUCKDB.json")
    if ratio is not None:
        # persist the gate evidence SEPARATELY (r11 verdict #3): the
        # driver's plain-bench runs rewrite BENCH_DETAIL.json every
        # round, which used to erase the last --duckdb measurement from
        # the worktree (it survived only in git history).
        #
        # r13 verdict #1: the per-query map pairs BOTH engines' times
        # from THIS session ({query: {spark_s, duckdb_s, ratio}}), so
        # the ≤2× gate is adjudicable per query, not only in aggregate;
        # `over_2x` names every query above 2× outright (spark_s
        # included so fixed per-query dispatch overhead on sub-100 ms
        # oracles is visible for what it is).
        per_query = {
            n: {
                "spark_s": times[n],
                "duckdb_s": dtimes[n],
                "ratio": round(times[n] / max(dtimes[n], 1e-4), 3),
            }
            for n in names
        }
        over_2x = sorted(
            (n for n in names if per_query[n]["ratio"] > 2.0),
            key=lambda n: -per_query[n]["ratio"],
        )
        # Materiality cut (r14): at sf0.1 most oracle queries finish in
        # DuckDB in <50 ms while ANY Spark job pays a fixed ~0.2-1 s
        # DAG-schedule + task-launch floor, so a raw >2x list is ~80%
        # floor artifact. over_2x_material keeps only queries where
        # DuckDB itself does >= 0.25 s of real work — the set whose
        # ratios measure plans rather than scheduling latency (the
        # full raw list stays in over_2x for transparency).
        over_2x_material = [
            n for n in over_2x if per_query[n]["duckdb_s"] >= 0.25
        ]
        with open(duckdb_path, "w") as f:
            json.dump(
                {
                    "metric": "duckdb_ratio",
                    "ratio": ratio,
                    "spark_total_s": total,
                    "duckdb_total_s": dtotal,
                    "n_queries": len(names),
                    "trials": trials,
                    "sf": _sf_of(sf_dir),
                    "queries": per_query,
                    "over_2x": over_2x,
                    "over_2x_material": over_2x_material,
                    "boot_id": boot_id,
                    "uptime_s": uptime_s,
                    "calibration_cpu": cal["cpu"],
                    "calibration_cpu_prev_committed": prev_cal_cpu,
                    "calibration_cpu_hist_min": hist_min_cpu,
                    "calibration_degraded": cal_degraded,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(
            f"duckdb gate evidence -> {duckdb_path} "
            f"({len(over_2x)} queries >2x)",
            file=sys.stderr,
        )
    prev_ratio = None
    if ratio is None and os.path.exists(duckdb_path):
        try:
            with open(duckdb_path) as f:
                prev_ratio = json.load(f).get("ratio")
        except (OSError, ValueError):
            prev_ratio = None

    detail = {
        "metric": "total_wall_clock_oracle_queries",
        "value": total,
        "unit": "sec",
        "n_queries": len(names),
        "trials": trials,
        "sf": _sf_of(sf_dir),
        "queries": times,
        "calibration": cal,
        "calibration_cpu_prev_committed": prev_cal_cpu,
        "calibration_cpu_hist_min": hist_min_cpu,
        "calibration_degraded": cal_degraded,
        "boot_id": boot_id,
        "uptime_s": uptime_s,
    }
    if ratio is not None:
        detail["duckdb_ratio"] = ratio
    elif prev_ratio is not None:
        detail["duckdb_ratio_prev"] = prev_ratio  # from DUCKDB.json
    detail_path = os.path.join(repo_dir, "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(f"full per-query map -> {detail_path}", file=sys.stderr)

    # compact stdout line: headline = the 10 slowest queries only
    headline = dict(
        sorted(times.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    line = {
        "metric": "total_wall_clock_oracle_queries",
        "value": total,
        "unit": "sec",
        "n_queries": len(names),
        "trials": trials,
        "queries": headline,
        "sf": _sf_of(sf_dir),
        "calibration": cal,
        "calibration_degraded": cal_degraded,
        "boot_id": boot_id[:8],
        "uptime_s": uptime_s,
    }
    if ratio is not None:
        line["duckdb_ratio"] = ratio
    elif prev_ratio is not None:
        line["duckdb_ratio_prev"] = prev_ratio
    print(json.dumps(line))


if __name__ == "__main__":
    main()
