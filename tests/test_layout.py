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
