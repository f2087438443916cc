"""Headline multi-join analytical composites (TPC-H Q3/Q5/Q10 shapes,
adapted to the driver schema). These exercise the full relational spine
at once — selective dimension filters, 3–6-table join graphs, decimal-
exact aggregation, deterministic top-k — the queries a 100 TB deployment
actually runs, where Catalyst's join ordering + AQE and the broadcast/
shuffle split decide the runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdxpy_spark.operators._util import davg, dec, dsum, fan_out, sql_davg, sql_dsum
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


_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum(_REV, 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_shape", oracle=_Q1_ORACLE, category="Q")
def tpch_q1_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 (pricing summary report): THE canonical scan-and-aggregate —
    eight aggregates over the full fact table grouped by two low-
    cardinality flags. Plan shape is the best case Spark has: one scan
    with the date filter and 6-column pruning pushed into parquet, all
    eight aggregates partial (map-side combine into 6 groups), ONE
    metadata-sized shuffle, whole-stage codegen end to end. Money math
    rides per-row DECIMAL casts (dsum/davg) so the sums are order-
    independent and hash-identical across engines at any parallelism.
    At 100 TB this plan's cost is the scan — nothing else survives the
    map side. fan_out (r14): on the single-split test scan the whole
    filter+partial-agg pipeline ran on one core; the round-robin
    repartition above the pushed filter is identity at production
    split counts (same-session alternated A/B 0.51x,
    plans/r14/probes/ab_fanout_per_op_lineitem.json)."""
    li = fan_out(
        table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate")
            <= F.lit("1998-09-01 00:00:00").cast("timestamp_ntz")
        ),
        spark,
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count("*").alias("count_order"),
    )


_Q6_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("tpch_q6_shape", oracle=_Q6_ORACLE, category="Q")
def tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 (forecast revenue change): a pure filter-and-sum — the
    predicate-pushdown benchmark. All three range predicates (date,
    discount band, quantity cap) are scan-level PushedFilters, so
    parquet row-group min/max statistics prune I/O before a single row
    decodes; the aggregate is a one-row global sum (partial map-side,
    no groupBy shuffle at all). tests/test_plans.py pins the pushdown.
    At 100 TB with date-partitioned or shipdate-sorted layout this
    query reads a fraction of the table — the plan, not the code, is
    the optimization."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


_Q12_ORACLE = """
SELECT l_linestatus,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register("tpch_q12_shape", oracle=_Q12_ORACLE, category="Q")
def tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (shipping modes / late lines, adapted — the driver schema has
    no l_shipmode, so l_linestatus is the mode dimension and 'late' is
    ship > order + 60 days): the conditional-count-after-join shape.
    The year filter pushes to the lineitem scan; the late predicate is
    a post-join comparison between columns of the two sides (Catalyst
    cannot push it, which is the point of the shape); the counts are
    partial-aggregable CASE sums over a 2-group key. One orderkey
    shuffle — at 100 TB co-located bucketing on orderkey (see
    join_bucketed_colocated) removes it."""
    od = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_Q14_ORACLE = f"""
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST({_REV} AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE), 4) + 0.0
         AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


@register("tpch_q14_shape", oracle=_Q14_ORACLE, category="Q")
def tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 (promotion effect): percent of quarterly revenue from promo
    parts — the conditional-ratio-after-dimension-join shape. part is
    broadcast (dimension-sized at every scale factor: |part| grows
    with SF but stays ~1e-3 of lineitem; at true 100 TB it would be a
    shuffle-free bucketed join instead), the quarter filter pushes to
    the fact scan, and both sums are exact decimals with ONE double
    division at the end (+0.0 canonicalizes the zero corner) — the
    ratio hashes identically on both engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    part = table(spark, sf_dir, "part")
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.round(
                    100.0
                    * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,6)"))).cast("double")
                    / F.sum(rev).cast("double"),
                    4,
                )
                + 0.0
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


_Q19_ORACLE = f"""
SELECT {sql_dsum(_REV, 'revenue')}, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 40)
"""


@register("tpch_q19_shape", oracle=_Q19_ORACLE, category="Q")
def tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 (discounted revenue): the disjunctive-predicate join — three
    OR'd conjunction blocks mixing fact-side (quantity) and dim-side
    (brand, size) columns. Catalyst extracts the common single-side
    residuals: the brand/size union pushes to the part scan and the
    quantity envelope (1..40) to the lineitem scan, so both inputs
    shrink BEFORE the broadcast join and only the cross-side OR is
    evaluated post-join. The revenue sum is decimal-exact. This shape
    is the classic test that an optimizer doesn't give up on OR."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    blocks = (
        ((b == "Brand#1") & s.between(1, 10) & (q >= 1) & (q <= 20))
        | ((b == "Brand#2") & s.between(5, 25) & (q >= 10) & (q <= 30))
        | ((b == "Brand#3") & s.between(20, 50) & (q >= 20) & (q <= 40))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(blocks)
        .agg(dsum(rev, "revenue"), F.count("*").alias("n_lines"))
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


@register("tpch_q4_shape", oracle=_Q4_ORACLE, category="Q")
def tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (order priority checking, adapted — the driver schema has no
    l_commitdate/l_receiptdate, so 'the order was filled late' is
    l_shipdate > o_orderdate + 30 days): the canonical EXISTS
    SEMI-JOIN. The quarter filter pushes to the orders scan; the EXISTS
    decorrelates to ONE left-semi join on orderkey carrying the
    correlated date predicate as a join condition — each order row
    survives at most once no matter how many late lineitems it has, so
    no post-join dedup is needed. Plan shape (pinned in
    tests/test_r10_ops.py): LeftSemi hash/merge join, never a per-row
    BroadcastNestedLoop; the count is a partial-aggregable 5-group
    rollup. At 100 TB the only wide shuffle is the orderkey semi join,
    which co-locates with the lineitem layout's bucketing."""
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == od.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        od.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_Q13_ORACLE = """
WITH c_orders AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey
   AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
"""


@register("tpch_q13_shape", oracle=_Q13_ORACLE, category="Q")
def tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 (customer order-count distribution, adapted — no o_comment
    column, so the 'special requests' exclusion is a priority NOT IN):
    THE left-outer skew classic. Every customer survives the LEFT
    OUTER join — zero-order customers land in the c_count=0 group via
    COUNT(o_orderkey)'s null-skipping — and the second tiny aggregate
    histograms the counts.

    Plan posture for 100 TB (pinned in tests/test_r10_ops.py): orders
    is FACT-SIZED and must never be the broadcast build side — the
    join is hinted MERGE, so it stays a SortMergeJoin shuffling both
    sides on custkey at any scale (AQE would happily broadcast orders
    at sf0.01 and fall over at sf1000). The first groupBy(c_custkey)
    reuses the join's custkey partitioning — no third exchange — and
    the custdist rollup is metadata-sized. Customer-key skew (one
    giant customer) is AQE skew-join territory; the orderpriority
    filter pushes to the orders scan."""
    cust = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return (
        cust.join(od.hint("merge"), cust.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 25
"""


@register("tpch_q21_shape", oracle=_Q21_ORACLE, category="Q")
def tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (suppliers who kept orders waiting, adapted — 'late' is
    l_shipdate > o_orderdate + 60 days): the hardest decorrelation
    shape in the suite — a double-correlated EXISTS / NOT-EXISTS
    lineitem self-join. The oracle keeps the correlated form; the
    Spark plan decorrelates BOTH subqueries into one per-order
    aggregate pass instead of per-row probes:

      per (orderkey, suppkey): n_rows, late row count        (agg 1)
      per orderkey: n_supp, n_late_supp                      (agg 2)
      EXISTS(other supplier)          ⟺ n_supp >= 2
      NOT EXISTS(other LATE supplier) ⟺ n_late_supp = 1
      numwait contribution = the supplier's own late rows.

    One lineitem scan, one orderkey-keyed orders join (status filter
    pushed to the orders scan), two partial-aggregable shuffles that
    SHARE the orderkey partitioning, a broadcast supplier join for the
    name, and a TakeOrderedAndProject top-25 (numwait DESC, unique
    s_name tiebreak). Never a BroadcastNestedLoopJoin — pinned in
    tests/test_r10_ops.py. At 100 TB this is the aggregate-
    decorrelation pattern every engine needs for multi-EXISTS shapes:
    candidate volume is |lineitem|, not |lineitem|² probe pairs."""
    sup = table(spark, sf_dir, "supplier")
    od = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    joined = li.join(
        od.hint("merge").select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).cast("bigint").alias("is_late"),
    )
    per_supp = joined.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("is_late").alias("late_rows")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum((F.col("late_rows") > 0).cast("bigint")).alias("n_late_supp"),
    )
    waiting = (
        per_supp.filter(F.col("late_rows") > 0)
        .join(per_order.hint("merge"), "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        waiting.join(F.broadcast(sup), waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(25)
    )


_Q22_ORACLE = """
WITH cust_c AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer),
bal AS (
  SELECT CAST(SUM(bal_c) AS BIGINT) AS total_c,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cust_c WHERE bal_c > 0)
SELECT c_mktsegment AS segment,
       COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 4)
         AS totacctbal
FROM cust_c, bal
WHERE bal_c * cnt > total_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
"""


@register("tpch_q22_shape", oracle=_Q22_ORACLE, category="Q")
def tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (global sales opportunity, adapted — no c_phone, so the
    country-code grouping becomes the market segment, and this
    generator gives every customer SOME order, so 'never ordered'
    becomes LAPSED: no order since 2000-01-01). Two classic sub-shapes
    at once: a SCALAR SUBQUERY threshold (acctbal above the mean
    positive balance) and a NOT EXISTS anti-join against orders, whose
    date predicate pushes to the orders scan before the anti join.

    Exactness: the mean is never divided — c_acctbal > total/cnt is
    cross-multiplied to c_acctbal·cnt > total over exact BIGINT cents,
    so no engine pair can disagree within an ulp of the threshold (AVG
    returns DOUBLE in DuckDB but decimal in Spark, and Spark trims the
    scale of a decimal×bigint product at precision 38 — division and
    decimal products are the traps, integer multiplication is exact).
    The 1-row threshold broadcast-crosses onto customer; NOT EXISTS is
    a left-anti join on custkey (id-only projection of orders rides
    the shuffle); the rollup is segment-sized. At 100 TB the anti join
    shuffles customer against orders' custkey projection —
    co-locatable with a custkey-bucketed layout — and everything else
    is metadata. (Cents·count stays under int64 to ~10¹⁰ customers.)"""
    cust = table(spark, sf_dir, "customer").withColumn(
        "bal_c", F.round(F.col("c_acctbal") * 100).cast("bigint")
    )
    od = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    bal = cust.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("total_c"),
        F.count("*").alias("cnt"),
    )
    rich = cust.join(F.broadcast(bal)).filter(
        F.col("bal_c") * F.col("cnt") > F.col("total_c")
    )
    return (
        rich.join(od, rich.c_custkey == od.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {sql_dsum(_REV, 'revenue')}
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


@register("tpch_q7_shape", oracle=_Q7_ORACLE, category="Q")
def tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 (volume shipping between two nations): bidirectional
    nation-pair revenue by ship year — the shape where the SAME
    dimension joins twice under different roles (supplier nation vs
    customer nation) and a cross-role disjunction filters the pair.
    Both nation joins broadcast; the two fact joins shuffle on
    orderkey/suppkey; after the nation filter the aggregate is a
    4-group partial. At 100 TB the nation-pair predicate cannot push
    below the joins (it spans both roles), but each single-role
    membership (nation ∈ {1,2}) does — Catalyst infers it from the
    disjunction, shrinking both dimension fan-ins before the facts
    join."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    od = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(rev, "revenue"))
    )


_Q8_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n1.n_name = 'NATION_2'
                  THEN CAST({_REV} AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE), 4) + 0.0
         AS mkt_share,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n2.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN part ON p_partkey = l_partkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY year(o_orderdate)
"""


@register("tpch_q8_shape", oracle=_Q8_ORACLE, category="Q")
def tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 (national market share): one nation's share of a region's
    PROMO-part revenue per year — the conditional-ratio shape over the
    widest join graph in the suite (7 tables, nation twice). All four
    dimensions broadcast; the two fact joins shuffle; both sums are
    exact decimals with ONE double division per group (+0.0). The
    numerator condition (supplier nation) deliberately cannot push
    anywhere — it selects within, not before, the aggregate."""
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    cust = table(spark, sf_dir, "customer")
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.round(
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(
                            F.lit(0).cast("decimal(18,6)")
                        )
                    ).cast("double")
                    / F.sum(rev).cast("double"),
                    4,
                )
                + 0.0
            ).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
    )


_Q2_ORACLE = """
WITH offers AS (
  SELECT DISTINCT l_partkey, l_suppkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'),
mn AS (
  SELECT l_partkey, MIN(price_c) AS min_c
  FROM offers JOIN eu ON eu.s_suppkey = offers.l_suppkey
  GROUP BY l_partkey)
SELECT p_partkey, p_brand, s_name, s_acctbal,
       ROUND(CAST(min_c AS DOUBLE) / 100.0, 2) + 0.0 AS min_price
FROM offers
JOIN mn ON mn.l_partkey = offers.l_partkey AND offers.price_c = mn.min_c
JOIN eu ON eu.s_suppkey = offers.l_suppkey
JOIN part ON p_partkey = offers.l_partkey
WHERE p_size <= 10
ORDER BY s_acctbal DESC, s_name ASC, p_partkey ASC
LIMIT 25
"""


@register("tpch_q2_shape", oracle=_Q2_ORACLE, category="Q")
def tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (minimum-cost supplier, adapted — no partsupp table, so the
    'offer' is a DISTINCT (part, supplier, price-cents) from lineitem):
    the correlated-scalar-MIN shape. The correlated
    `price = (SELECT MIN ...)` decorrelates to one per-part MIN
    aggregate joined back on (part, price) equality — exact because
    prices compare as integer cents, never doubles. The region filter
    applies to BOTH the min scan and the outer offers (same eu set,
    the classic Q2 trap: taking the min over all suppliers but
    returning only regional ones under-reports ties). Top-25 by
    account balance with total (s_name, p_partkey) tiebreak rides
    TakeOrderedAndProject. At 100 TB the offers dedup and the per-part
    MIN share the partkey shuffle key."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    eu = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    offers = li.select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
    ).distinct()
    eu_offers = offers.join(F.broadcast(eu), offers.l_suppkey == eu.s_suppkey)
    mn = eu_offers.groupBy("l_partkey").agg(F.min("price_c").alias("min_c"))
    return (
        eu_offers.join(mn, "l_partkey")
        .filter(F.col("price_c") == F.col("min_c"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "s_acctbal",
            (F.round(F.col("min_c").cast("double") / 100.0, 2) + F.lit(0.0)).alias(
                "min_price"
            ),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("s_name").asc(), F.col("p_partkey").asc()
        )
        .limit(25)
    )


_Q15_ORACLE = """
WITH srev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey),
mx AS (SELECT CAST(MAX(rev_c) AS BIGINT) AS max_c FROM srev)
SELECT s_suppkey, s_name,
       ROUND(CAST(rev_c AS DOUBLE) / 100.0, 2) + 0.0 AS total_revenue
FROM srev JOIN supplier ON s_suppkey = l_suppkey
CROSS JOIN mx
WHERE rev_c = max_c
"""


@register("tpch_q15_shape", oracle=_Q15_ORACLE, category="Q")
def tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 (top supplier): the view-plus-global-MAX shape — aggregate
    revenue per supplier for a quarter, then keep the supplier(s)
    equal to the global maximum. Revenue accumulates as per-row
    ROUNDED integer cents so the max-equality join can never split a
    tie an ulp apart (a double revenue here is the classic Q15
    portability bug). One suppkey shuffle for the view; the 1-row max
    broadcast-crosses back; supplier join broadcasts. The final
    filter keeps ALL tied maxima — same contract on both engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    sup = table(spark, sf_dir, "supplier")
    srev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        ).alias("rev_c")
    )
    mx = srev.agg(F.max("rev_c").alias("max_c"))
    return (
        srev.join(F.broadcast(mx))
        .filter(F.col("rev_c") == F.col("max_c"))
        .join(F.broadcast(sup), srev.l_suppkey == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.round(F.col("rev_c").cast("double") / 100.0, 2) + F.lit(0.0)).alias(
                "total_revenue"
            ),
        )
    )


_Q16_ORACLE = """
WITH excl AS (
  SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'),
ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM excl))
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
GROUP BY p_brand, p_type, p_size
"""


@register("tpch_q16_shape", oracle=_Q16_ORACLE, category="Q")
def tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 (part/supplier relationship count, adapted — no partsupp, so
    the relationship is DISTINCT (part, supplier) pairs observed in
    lineitem): COUNT DISTINCT per attribute group with a NOT-IN
    exclusion subquery (complaint suppliers ~ names ending in '7').
    The NOT IN decorrelates to a left-anti join against a
    dimension-sized exclusion set (broadcast); the pair-dedup and the
    count-distinct share the partkey-side shuffle; the brand/size
    filters push to the part scan. The classic catalog-analytics shape
    over the biggest distinct space in the suite."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    excl = sup.filter(F.col("s_name").like("%7")).select("s_suppkey")
    ps = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(excl), li.l_suppkey == excl.s_suppkey, "left_anti")
        .distinct()
    )
    return (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_Q17_ORACLE = """
WITH li_b AS (
  SELECT l_partkey, l_extendedprice,
         CAST(ROUND(l_quantity * 10) AS BIGINT) AS q10
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#1'),
pavg AS (
  SELECT l_partkey, CAST(SUM(q10) AS BIGINT) AS sum_q10,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM li_b GROUP BY l_partkey)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0, 4) + 0.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM li_b JOIN pavg USING (l_partkey)
WHERE 5 * q10 * n < sum_q10
"""


@register("tpch_q17_shape", oracle=_Q17_ORACLE, category="Q")
def tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 (small-quantity-order revenue): the correlated scalar-AVG
    shape — lineitems whose quantity is below 20% of their part's
    average quantity. Decorrelated to one per-part aggregate joined
    back; the threshold comparison is CROSS-MULTIPLIED into exact
    integer arithmetic (5·q·n < Σq in tenths — dividing the average
    would put an engine-dependent double within an ulp of the
    boundary). The brand filter broadcasts onto the fact scan first,
    so both the stats pass and the probe pass run over the reduced
    lineitem set, sharing the partkey shuffle key."""
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            "l_extendedprice",
            F.round(F.col("l_quantity") * 10).cast("bigint").alias("q10"),
        )
    )
    pavg = li.groupBy("l_partkey").agg(
        F.sum("q10").alias("sum_q10"), F.count("*").alias("n")
    )
    return (
        li.join(pavg, "l_partkey")
        .filter(5 * F.col("q10") * F.col("n") < F.col("sum_q10"))
        .agg(
            (
                F.round(F.sum(dec("l_extendedprice")).cast("double") / 7.0, 4)
                + F.lit(0.0)
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# --- derived partsupp (unblocks Q9 / Q11 / Q20) ------------------------------
#
# The driver schema has no partsupp table. The relation is derived the
# same way Q2's offers table is: the DISTINCT (partkey, suppkey) pairs
# observed in lineitem ARE the part/supplier catalog, and the two
# partsupp measures are deterministic integer functions of the key —
# identical on both engines, no RNG stream, no float:
#
#   ps_supplycost_c = (partkey*37 + suppkey*61) % 90000 + 10000   [cents]
#   ps_availqty     = (partkey*53 + suppkey*29) % 9999  + 1
#
# Keys are BIGINT and non-negative, so `%` agrees between Spark and
# DuckDB. At 100 TB the pair-dedup is one (partkey, suppkey) shuffle
# with map-side partial dedup; everything downstream reuses that key.

_PARTSUPP_SQL = """
  SELECT ps_partkey, ps_suppkey,
         (ps_partkey * 37 + ps_suppkey * 61) % 90000 + 10000 AS cost_c,
         (ps_partkey * 53 + ps_suppkey * 29) % 9999 + 1 AS ps_availqty
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 61) % 90000 + 10000).alias(
            "cost_c"
        ),
        ((F.col("ps_partkey") * 53 + F.col("ps_suppkey") * 29) % 9999 + 1).alias(
            "ps_availqty"
        ),
    )


_Q9_ORACLE = f"""
WITH psx AS ({_PARTSUPP_SQL})
SELECT nation, o_year,
       ROUND(CAST(CASE WHEN s_m >= 0 THEN (s_m + 5) // 10
                       ELSE -((-s_m + 5) // 10) END AS DOUBLE) / 100.0, 2)
         + 0.0 AS sum_profit,
       n_lines
FROM (
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000)
                     AS BIGINT)
                - cost_c * CAST(ROUND(l_quantity * 10) AS BIGINT))
            AS BIGINT) AS s_m,
       COUNT(*) AS n_lines
FROM lineitem
JOIN psx ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
) ORDER BY 1 ASC, 2 DESC
"""


@register("tpch_q9_shape", oracle=_Q9_ORACLE, category="Q")
def tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (product-type profit): the six-table profit rollup —
    revenue minus supply cost per (nation, year) for one part family.
    Profit accumulates in exact integer MILLI-units (revenue rounded
    to thousandths; cost_c cents × quantity tenths = thousandths), so
    the negative-capable sum never touches doubles until the final
    presentation ROUND. Plan: the p_name filter broadcasts part onto
    the fact scan FIRST (the only selective predicate), the derived
    partsupp joins on its native (partkey, suppkey) key, supplier and
    nation broadcast, and orders — fact-sized — shuffles on orderkey.
    No BNLJ anywhere (plan-asserted); at 100 TB the only big
    exchanges are the pair-dedup and the orderkey join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    od = table(spark, sf_dir, "orders")
    ps = _partsupp(spark, sf_dir)
    rev_m = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000).cast(
        "bigint"
    )
    qty10 = F.round(F.col("l_quantity") * 10).cast("bigint")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (rev_m - F.col("cost_c") * qty10).alias("profit_m"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.sum("profit_m").alias("s_m"),
            F.count("*").alias("n_lines"),
        )
        # milli → cents by exact integer HALF-UP (div truncates toward
        # zero on both engines): a raw double /1000 lands profit sums
        # ending in 5 milli exactly on a .xx5 tie, where Spark
        # (BigDecimal of the shortest repr) and DuckDB (raw-double
        # nearbyint) disagree — found by the sf0.01 differential.
        .select(
            "nation",
            "o_year",
            (
                F.round(
                    F.expr(
                        "CASE WHEN s_m >= 0 THEN (s_m + 5) div 10 "
                        "ELSE -((-s_m + 5) div 10) END"
                    ).cast("double")
                    / 100.0,
                    2,
                )
                + F.lit(0.0)
            ).alias("sum_profit"),
            "n_lines",
        )
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


_Q11_ORACLE = f"""
WITH psx AS ({_PARTSUPP_SQL}),
grp AS (
  SELECT ps_partkey,
         CAST(SUM(cost_c * ps_availqty) AS BIGINT) AS value_c
  FROM psx
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY ps_partkey),
tot AS (SELECT CAST(SUM(value_c) AS BIGINT) AS total_c FROM grp)
SELECT ps_partkey,
       ROUND(CAST(value_c AS DOUBLE) / 100.0, 2) + 0.0 AS value
FROM grp CROSS JOIN tot
WHERE value_c * 1000 > total_c
ORDER BY value_c DESC, ps_partkey ASC
"""


@register("tpch_q11_shape", oracle=_Q11_ORACLE, category="Q")
def tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 (important stock identification): per-part inventory value
    for one nation, kept where the part's value exceeds 0.1% of the
    nation total. The HAVING-with-global-scalar decorrelates WITHOUT a
    second partsupp scan: the nation total is the sum OVER THE PER-PART
    GROUPS (tot reuses grp), broadcast-crossed back as one row — the
    naive plan re-scans and re-joins partsupp for the subquery,
    doubling the biggest shuffle at 100 TB. Threshold compares in
    cross-multiplied integer cents (value_c·1000 > total_c), never a
    double fraction. Supplier and nation broadcast onto the pair
    table; one partkey shuffle total."""
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    ps = _partsupp(spark, sf_dir)
    grp = (
        ps.join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("cost_c") * F.col("ps_availqty")).alias("value_c"))
    )
    tot = grp.agg(F.sum("value_c").alias("total_c"))
    return (
        grp.join(F.broadcast(tot))
        .filter(F.col("value_c") * 1000 > F.col("total_c"))
        .select(
            "ps_partkey",
            (F.round(F.col("value_c").cast("double") / 100.0, 2) + F.lit(0.0)).alias(
                "value"
            ),
        )
        .orderBy(F.col("value").desc(), F.col("ps_partkey").asc())
    )


_Q20_ORACLE = f"""
WITH psx AS ({_PARTSUPP_SQL}),
shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(ROUND(l_quantity * 10) AS BIGINT)) AS BIGINT) AS sum_q10
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey),
cand AS (
  SELECT DISTINCT ps_suppkey
  FROM psx
  JOIN part ON p_partkey = ps_partkey
  JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE p_name LIKE 'small%' AND ps_availqty * 20 > sum_q10)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN cand ON ps_suppkey = s_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_3'
ORDER BY s_name ASC, s_suppkey ASC
"""


@register("tpch_q20_shape", oracle=_Q20_ORACLE, category="Q")
def tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (potential part promotion): suppliers in one nation holding
    excess stock (availqty > half the year's shipped quantity) of one
    part family. The correlated scalar-SUM subquery decorrelates to a
    per-(partkey, suppkey) aggregate inner-joined back — inner, not
    left, because TPC-H's `qty > 0.5*(SELECT SUM ...)` is NULL-false
    when no lineitem matched, exactly the rows an inner join drops.
    Threshold cross-multiplies to integers (availqty·20 > Σq in
    tenths). The part-family filter broadcasts; the shipped aggregate
    and the pair table share the (partkey, suppkey) shuffle key; the
    final nation probe is dimension-sized. Output: the supplier list
    with a total (s_name, s_suppkey) order."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    ps = _partsupp(spark, sf_dir)
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_quantity") * 10).cast("bigint")).alias("sum_q10")
    )
    cand = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") * 20 > F.col("sum_q10"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(cand, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.col("s_name").asc(), F.col("s_suppkey").asc())
    )
