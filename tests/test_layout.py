"""Plan assertions for the physical-layout strategies: bucketed joins
must not shuffle; salted aggregation must equal the direct aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdxpy_spark.operators._util import dec
from gdxpy_spark.plans.inspect import formatted_plan
from gdxpy_spark.plans.layout import salted_sum, write_bucketed
from gdxpy_spark.tables import table
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse.dir is a static conf — point the database itself at tmp
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS gdxps_layout LOCATION '{tmp_path}/wh'"
    )
    spark.catalog.setCurrentDatabase("gdxps_layout")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # tables are tiny at test SF → turn auto-broadcast off so the plan
        # shows what a fact-fact join would do at real scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = table(spark, SF_DIR, "orders")
        li = table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "orders_b", "o_orderkey")
        write_bucketed(li, "lineitem_b", "o_orderkey")
        j = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed join must be co-located (no shuffle):\n" + plan
        )
        # and it still computes the right thing
        assert j.count() == table(spark, SF_DIR, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP DATABASE IF EXISTS gdxps_layout CASCADE")
        spark.catalog.setCurrentDatabase("default")


def test_salted_sum_equals_direct(spark):
    li = table(spark, SF_DIR, "lineitem")
    # l_returnflag is the "hot key" stand-in (3 values over ~6k rows)
    direct = {
        r["l_returnflag"]: r["total"]
        for r in li.groupBy("l_returnflag")
        .agg(F.round(F.sum(dec("l_quantity")).cast("double"), 4).alias("total"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: round(r["total"], 4)
        for r in salted_sum(li, "l_returnflag", dec("l_quantity"), "total").collect()
    }
    assert {k: round(v, 4) for k, v in direct.items()} == salted


def test_zorder_layout_prunes_files_on_both_dims(spark, tmp_path):
    """Z-ordering must make file-level min/max stats selective on BOTH
    keys: for a ~10%-band predicate on either dimension, well under
    half the files' [min, max] ranges intersect the band — while the
    linear single-key sort leaves every file un-prunable on the other
    key. Measured from the written files themselves (per-file min/max
    via input_file_name), i.e. exactly the stats a parquet footer
    prune consults."""
    from gdxpy_spark.plans.layout import write_zordered

    orders = table(spark, SF_DIR, "orders").select(
        "o_custkey", (F.col("o_totalprice").cast("bigint")).alias("o_price")
    )
    zdir = f"{tmp_path}/zorder"
    write_zordered(orders, zdir, "o_custkey", "o_price", n_files=32)

    lindir = f"{tmp_path}/linear"
    (
        orders.repartitionByRange(32, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lindir)
    )

    def file_boxes(path):
        return (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("o_custkey").alias("lo1"), F.max("o_custkey").alias("hi1"),
                F.min("o_price").alias("lo2"), F.max("o_price").alias("hi2"),
            )
            .collect()
        )

    def hit_frac(boxes, dim, lo, hi):
        loc, hic = (f"lo{dim}", f"hi{dim}")
        hits = sum(1 for b in boxes if b[hic] >= lo and b[loc] <= hi)
        return hits / len(boxes)

    span = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_price"), F.max("o_price"),
    ).first()
    # off-center band: a band straddling the space's midpoint crosses the
    # Z-curve's top-level quadrant boundary and touches ~every box — the
    # curve's known worst case; typical point/band lookups are off-center
    band1 = (span[0] + (span[1] - span[0]) * 60 // 100,
             span[0] + (span[1] - span[0]) * 70 // 100)
    band2 = (span[2] + (span[3] - span[2]) * 60 // 100,
             span[2] + (span[3] - span[2]) * 70 // 100)

    zb = file_boxes(zdir)
    lb = file_boxes(lindir)
    assert len(zb) >= 8 and len(lb) >= 8  # enough files for pruning to mean anything
    # linear sort: perfect on its own key, useless on the other
    assert hit_frac(lb, 1, *band1) <= 0.5
    assert hit_frac(lb, 2, *band2) >= 0.9, "sanity: linear can't prune dim 2"
    # z-order: selective on BOTH keys
    assert hit_frac(zb, 1, *band1) <= 0.6, f"z-order not pruning dim 1: {zb}"
    assert hit_frac(zb, 2, *band2) <= 0.6, f"z-order not pruning dim 2: {zb}"
