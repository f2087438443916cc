#!/usr/bin/env python
"""Same-session A/B: connected_components with 1 vs 2 contraction
rounds per materialization (r15, VERDICT item #5). Alternates the two
variants over the graph_components edge set (the largest CC input) and
the llm_semdedup edge shape, N alternations after a warmup pass,
min-per-side — the r14 measurement protocol.

The candidate variant fuses TWO large-star+small-star rounds into one
lazy plan per localCheckpoint, halving the eager materializations and
fixpoint-check actions per run. Correct by the star-contraction
fixpoint semantics: a star forest is stable under both operations, so
extra rounds past convergence are identities and the converged edge
set is unchanged (asserted here on every run pair).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def cc_batched(spark, edges, max_iters=20, rounds_per_ckpt=2):
    """connected_components with rounds_per_ckpt ls+ss pairs per
    localCheckpoint + fixpoint check."""
    import warnings

    e = (
        edges.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        cur = e
        for _r in range(rounds_per_ckpt):
            sym = cur.select("u", "v").union(cur.select(F.col("v"), F.col("u")))
            lmin = (
                sym.groupBy("u")
                .agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", "u").alias("m"))
            )
            ls = (
                sym.join(lmin, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            smin = ls.groupBy("u").agg(F.min("v").alias("m"))
            cur = (
                ls.join(smin, "u")
                .filter(F.col("v") != F.col("m"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(smin.select("u", F.col("m").alias("v")))
                .distinct()
            )
        ss = cur.localCheckpoint()
        n_edges, n_children = ss.agg(F.count("*"), F.count_distinct("u")).first()
        if n_edges == n_children:
            no_chains = (
                ss.alias("a")
                .join(ss.alias("b"), F.col("a.v") == F.col("b.u"), "left_semi")
                .isEmpty()
            )
            if no_chains:
                e = ss
                converged = True
                break
        e = ss
    if not converged:
        import warnings

        warnings.warn("cc_batched: max_iters reached", RuntimeWarning)
    return (
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("component_id"))
        .union(
            e.select(F.col("v").alias("doc_id"), F.col("v").alias("component_id"))
            .distinct()
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    alts = int(os.environ.get("AB_ALTS", "3"))

    from gdxpy_spark.operators.graphs import _copurchase_edges
    from gdxpy_spark.operators.llm import connected_components
    from gdxpy_spark.session import get_spark

    spark = get_spark(app="gdxpy_spark_ab_cc_batch", cpus=cpus)
    sc = spark.sparkContext

    # warmers (bench.py's)
    r = spark.range(10000)
    r.groupBy((F.col("id") % 7).alias("g")).agg(F.sum("id"), F.avg("id")).write.format(
        "noop"
    ).mode("overwrite").save()
    r.join(F.broadcast(spark.range(100)), "id").write.format("noop").mode(
        "overwrite"
    ).save()

    edges = _copurchase_edges(spark, sf_dir).select(
        F.col("pa").alias("doc_a"), F.col("pb").alias("doc_b")
    )

    def run(variant: str) -> float:
        sc.setJobDescription(f"cc_ab:{variant}")
        t0 = time.perf_counter()
        if variant == "old":
            out = connected_components(spark, edges)
        else:
            out = cc_batched(spark, edges, rounds_per_ckpt=2)
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        spark.catalog.clearCache()
        return round(dt, 4)

    # result-identity assertion once up front (also a warmup for both)
    a = sorted(map(tuple, connected_components(spark, edges).collect()))
    b = sorted(map(tuple, cc_batched(spark, edges, rounds_per_ckpt=2).collect()))
    assert a == b, f"VARIANTS DIVERGE: {len(a)} vs {len(b)} rows"
    print(f"identity ok: {len(a)} rows", flush=True)

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
        "sf_dir": sf_dir,
        "cpus": cpus,
    }
    print(json.dumps(out))
    path = os.environ.get("AB_OUT", "/tmp/ab_cc_batch.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
