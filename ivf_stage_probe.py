#!/usr/bin/env python
"""Stage-attributed timing for the IVF family (r15 VERDICT item #4):
split each query's wall into (fit/memo, probe, candidates, verify/CC)
by timing the query's OWN intermediate frames in execution order with
bench.py's methodology (same session builder, warmers, calibration
probe, noop-sink materialization, setJobDescription labels).

Attribution semantics: stages are timed IN ORDER within one pass, with
the query's own managed_caches live — exactly the state the full query
executes its later stages under (the memoized fits are paid once per
session, the cells cache once per query). A later stage's wall still
re-executes whatever upstream is neither memoized nor cached; the
`full` row is ground truth, the stage rows are the attribution.

Usage: python ivf_stage_probe.py --out plans/r15/probes/ivf_stages.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    if os.environ.get("GDXPS_IVF_TARGET_CELL"):
        sys.exit("GDXPS_IVF_TARGET_CELL is set; unset it before probing")
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F
    from pyspark.sql import Window as W
    from pyspark.sql.functions import pandas_udf

    from gdxpy_spark import registry
    from gdxpy_spark.operators._util import managed_cache, release_managed_caches
    from gdxpy_spark.session import get_spark
    from gdxpy_spark.tables import table

    registry.load_all()
    qs = registry.all_queries()
    spark = get_spark(app="gdxpy_spark_ivf_stage_probe", cpus=cpus)
    sc = spark.sparkContext

    # bench.py warmers
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

    # bench.py cpu calibration probe
    cal_df = (
        spark.range(5_000_000)
        .groupBy((F.col("id") % 101).alias("g"))
        .agg(F.sum("id"), F.avg("id"), F.count("*"))
    )
    cal = None
    for _ in range(3):
        t0 = time.perf_counter()
        cal_df.write.format("noop").mode("overwrite").save()
        cal = min(cal or 1e9, time.perf_counter() - t0)
    cal = round(cal, 4)

    from gdxpy_spark.operators.llm import (
        _cosine_top1,
        _ensure_ivf_index,
        _ivf_probe_cells,
        _kmeans_fit,
        _lloyd_ivf_fit,
        _pq_adc,
        _pq_scored,
        _pq_tables,
        _semdedup_pairs,
        _with_norm,
        connected_components,
        lsh_candidate_pairs,
        _dot,
    )

    out: dict = {"cal_cpu": cal, "sf_dir": sf_dir, "cpus": cpus, "queries": {}}

    def run_stages(qname: str, stage_builders) -> None:
        """stage_builders: list of (stage_name, fn) where fn() returns a
        DataFrame (noop-timed) or None (fn does its own eager work and
        is wall-timed directly, e.g. a driver-side fit)."""
        rows = []
        for t in range(args.trials):
            trial = {}
            for sname, fn in stage_builders:
                sc.setJobDescription(f"{qname}:{sname}")
                t0 = time.perf_counter()
                df = fn()
                if df is not None:
                    df.write.format("noop").mode("overwrite").save()
                trial[sname] = round(time.perf_counter() - t0, 4)
                sc.setJobDescription(None)
            rows.append(trial)
            release_managed_caches()
            spark.catalog.clearCache()
        # best-of-trials per stage (bench.py discipline) + raw rows
        best = {
            k: min(tr[k] for tr in rows) for k in rows[0]
        }
        out["queries"][qname] = {"best": best, "trials": rows}
        print(json.dumps({qname: best}), flush=True)

    # --- llm_ann_ivf_checked: _kmeans_fit (memoized) + probe + cand/verify
    ck_state: dict = {}

    def ck_fit():
        ck_state["asg"], ck_state["cents"] = _kmeans_fit(spark, sf_dir)
        return None

    def ck_probe():
        # the probes subtree exactly as the op builds it
        from gdxpy_spark.operators.llm import _super_quantize

        cents = ck_state["cents"]
        e = _with_norm(
            table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        )
        cent_rows = [
            (j, p, x) for j, c in enumerate(cents) for p, x in enumerate(c)
        ]
        cdf = spark.createDataFrame(cent_rows, "cell INT, pos INT, c DOUBLE")
        ve = e.select(
            "vec_id", F.posexplode("embedding").alias("pos", "v")
        ).withColumn("v", F.col("v").cast("double"))
        d2 = (
            ve.join(F.broadcast(cdf), "pos")
            .groupBy("vec_id", "cell")
            .agg(
                F.sum(
                    (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
                ).alias("d2")
            )
        )
        grp_of, scents = _super_quantize(cents)
        srows = [
            (j, p, x) for j, c in enumerate(scents) for p, x in enumerate(c)
        ]
        sdf = spark.createDataFrame(srows, "grp INT, pos INT, c DOUBLE")
        vs = (
            ve.join(F.broadcast(sdf), "pos")
            .groupBy("vec_id", "grp")
            .agg(
                F.sum(
                    (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
                ).alias("sd2")
            )
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
        return probes

    run_stages(
        "llm_ann_ivf_checked",
        [
            ("fit_first", ck_fit),
            ("fit_memo", ck_fit),
            ("probe", ck_probe),
            ("full", lambda: qs["llm_ann_ivf_checked"].fn(spark, sf_dir)),
        ],
    )

    # --- llm_ann_ivf: _lloyd_ivf_fit (memoized) + probe + cand/verify
    iv_state: dict = {}

    def iv_fit():
        iv_state["asg"], iv_state["cents"] = _lloyd_ivf_fit(spark, sf_dir)
        return None

    def iv_indexed():
        e = _with_norm(
            table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        )
        iv_state["indexed"] = managed_cache(
            e.join(iv_state["asg"].select("vec_id", "cell"), "vec_id")
        )
        iv_state["centers"] = spark.createDataFrame(
            [(j, c) for j, c in enumerate(iv_state["cents"])],
            "cell INT, center ARRAY<DOUBLE>",
        )
        return iv_state["indexed"]

    def iv_probe():
        iv_state["probes"] = _ivf_probe_cells(
            managed_cache(
                iv_state["indexed"].select("vec_id", "embedding", "norm")
            ),
            iv_state["centers"],
            nprobe=2,
        )
        return iv_state["probes"]

    run_stages(
        "llm_ann_ivf",
        [
            ("fit_first", iv_fit),
            ("fit_memo", iv_fit),
            ("index_cache", iv_indexed),
            ("probe", iv_probe),
            ("full", lambda: qs["llm_ann_ivf"].fn(spark, sf_dir)),
        ],
    )

    # --- llm_semdedup: persisted index read + probe + cand + tau-edges + CC
    sd_state: dict = {}

    def sd_index():
        idx = _ensure_ivf_index(spark, sf_dir)
        sd_state["cells"] = managed_cache(
            spark.read.parquet(os.path.join(idx, "cells"))
        )
        sd_state["centers"] = spark.read.parquet(os.path.join(idx, "centers"))
        return sd_state["cells"]

    def sd_probe():
        sd_state["probes"] = _ivf_probe_cells(
            sd_state["cells"].select("vec_id", "embedding", "norm"),
            sd_state["centers"],
            nprobe=2,
        ).select("vec_id", F.col("cell").cast("bigint").alias("bucket"))
        return sd_state["probes"]

    def sd_cand():
        sd_state["cand"] = (
            lsh_candidate_pairs(
                sd_state["cells"].select(
                    "vec_id", F.col("cell").cast("bigint").alias("bucket")
                ),
                q_probes=sd_state["probes"],
                max_bucket=2048,
            )
            .select(
                F.least("vec_id", "nn_id").alias("vec_id"),
                F.greatest("vec_id", "nn_id").alias("nn_id"),
            )
            .distinct()
        )
        return sd_state["cand"]

    def sd_edges():
        cells = sd_state["cells"]
        ea = cells.select(
            "vec_id",
            F.col("embedding").alias("emb_a"),
            F.col("norm").alias("norm_a"),
        )
        eb = cells.select(
            F.col("vec_id").alias("nn_id"),
            F.col("embedding").alias("emb_b"),
            F.col("norm").alias("norm_b"),
        )
        sd_state["edges"] = (
            sd_state["cand"]
            .join(ea, "vec_id")
            .join(eb, "nn_id")
            .filter(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("norm_a") * F.col("norm_b"))
                >= 0.4
            )
            .select(
                F.col("vec_id").alias("doc_a"), F.col("nn_id").alias("doc_b")
            )
        )
        return sd_state["edges"]

    run_stages(
        "llm_semdedup",
        [
            ("index_cache", sd_index),
            ("probe", sd_probe),
            ("cand", sd_cand),
            ("tau_edges", sd_edges),
            ("full", lambda: _semdedup_pairs(spark, sf_dir)),
        ],
    )

    # --- llm_semdedup_pq / pq_rerank: pq tables (memoized books) + ADC
    pq_state: dict = {}

    def pq_books_first():
        pq_state["qtab"], pq_state["codes"] = _pq_tables(spark, sf_dir)
        return pq_state["qtab"]

    run_stages(
        "llm_ann_ivf_pq_rerank",
        [
            ("pq_tables_first", pq_books_first),
            ("pq_tables_memo", pq_books_first),
            ("adc_scored", lambda: _pq_scored(spark, sf_dir)),
            ("full", lambda: qs["llm_ann_ivf_pq_rerank"].fn(spark, sf_dir)),
        ],
    )

    run_stages(
        "llm_semdedup_pq",
        [
            ("full", lambda: qs["llm_semdedup_pq"].fn(spark, sf_dir)),
        ],
    )

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
