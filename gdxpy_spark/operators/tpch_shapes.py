"""Headline multi-join analytical composites (TPC-H Q3/Q5/Q10 shapes,
adapted to the driver schema). These exercise the full relational spine
at once — selective dimension filters, 3–6-table join graphs, decimal-
exact aggregation, deterministic top-k — the queries a 100 TB deployment
actually runs, where Catalyst's join ordering + AQE and the broadcast/
shuffle split decide the runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdxpy_spark.operators._util import dec, dsum, sql_dsum
from gdxpy_spark.registry import register
from gdxpy_spark.tables import table

_REV = "l_extendedprice * (1 - l_discount)"


_Q3_ORACLE = f"""
SELECT l_orderkey,
       {sql_dsum(_REV, 'revenue')},
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


@register("tpch_q3_shape", oracle=_Q3_ORACLE, category="Q")
def tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 (shipping priority): unshipped-revenue top-10 for one market
    segment. Plan shape: selective segment filter broadcast onto orders,
    the orders×lineitem join shuffles on orderkey, and the top-10 is a
    TakeOrderedAndProject over the aggregate — the revenue ordering key
    is the decimal-exact sum, so the limit picks identical rows on both
    engines."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cust), od.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev, "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q5_ORACLE = f"""
SELECT n_name, {sql_dsum(_REV, 'revenue')}
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = (SELECT MIN(r_name) FROM region)
  AND year(o_orderdate) = 1996
GROUP BY n_name
"""


@register("tpch_q5_shape", oracle=_Q5_ORACLE, category="Q")
def tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 (local supplier volume): revenue where customer and supplier
    share a nation, one region, one year. Six-table join graph: three
    broadcastable dimensions (region→nation→customer chain collapses to
    a filter), two fact joins shuffling on orderkey/suppkey — the shape
    that proves join reordering + broadcast selection."""
    region = table(spark, sf_dir, "region")
    first_region = region.agg(F.min("r_name").alias("r_name"))
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey)
            & (sup.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(first_region), region.r_name == first_region.r_name)
        .groupBy("n_name")
        .agg(dsum(rev, "revenue"))
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name, {sql_dsum(_REV, 'revenue')}, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("tpch_q10_shape", oracle=_Q10_ORACLE, category="Q")
def tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 (returned items): top-20 customers by returned revenue in one
    quarter — the quarter filter pushes to the orders scan, returnflag
    to the lineitem scan, and the top-20 rides a TakeOrderedAndProject
    over the customer aggregate."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev, "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
SELECT c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4)
         AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


@register("tpch_q18_shape", oracle=_Q18_ORACLE, category="Q")
def tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 (large-volume customers): orders whose total quantity exceeds
    300, with their customer — the canonical HAVING-driven semi-join.
    Plan shape: lineitem aggregates ONCE by orderkey (partial agg
    map-side, quantities as exact decimals), the handful of surviving
    big-order keys joins back to orders — AQE sees the post-HAVING side
    is tiny and broadcasts it, so the fact table never re-shuffles for
    the filter — then customer joins on custkey and the final top-100
    rides TakeOrderedAndProject (price desc, orderkey tiebreak). At
    100 TB the only wide shuffles are the two orderkey-keyed ones, and
    they share a key with the lineitem layout's bucketing."""
    cust = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "_bk"),
                F.col("l_orderkey") == F.col("_bk"))
        .join(od, F.col("l_orderkey") == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )
