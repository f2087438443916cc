"""SURVEY §2.2 category B — projections / filters / predicates.

Reference parity: gdxpy users slice loaded symbols with pandas
``.loc``/``.xs`` (SURVEY §2.1 R14). Here every predicate is a Catalyst
filter that reaches the parquet scan (PushedFilters), so at 100 TB the
row groups that can't match are never decoded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdxpy_spark.registry import register
from gdxpy_spark.tables import table


@register(
    "proj_select_rename",
    oracle="""
SELECT l_orderkey AS order_id, l_linenumber AS line_no,
       l_extendedprice AS price, l_returnflag AS flag
FROM lineitem
""",
    category="B",
)
def proj_select_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + rename + reorder (pure ReadSchema pruning)."""
    return table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_returnflag").alias("flag"),
    )


@register(
    "proj_computed_expr",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)), 4)
            AS DOUBLE) AS revenue,
       CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                       AS DECIMAL(18,6)), 4) AS DOUBLE) AS charge
FROM lineitem
""",
    category="B",
)
def proj_computed_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row arithmetic projection (whole-stage-codegen'd, no shuffle).
    Money outputs go through the decimal-canonicalized round (see
    _util.money4 for why raw double ROUND diverges across engines)."""
    from gdxpy_spark.operators._util import money4

    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money4(revenue, "revenue"),
        money4(revenue * (1 + F.col("l_tax")), "charge"),
    )


@register(
    "filt_comparison",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07
""",
    category="B",
)
def filt_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + BETWEEN predicates (both pushed to the parquet scan)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 24) & F.col("l_discount").between(0.05, 0.07)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "filt_in_like",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE p_name LIKE '%bolt%' OR p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
""",
    category="B",
)
def filt_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern + IN-list predicates (OR-combined)."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%bolt%")
        | F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "filt_null_semantics",
    oracle="""
SELECT COUNT(*) AS n_total,
       COUNT(null_status) AS n_notnull,
       COUNT(*) - COUNT(null_status) AS n_null,
       COUNT(CASE WHEN (null_status = 'O') IS NULL THEN 1 END) AS n_unknown
FROM (SELECT NULLIF(o_orderstatus, 'F') AS null_status FROM orders) t
""",
    category="B",
)
def filt_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic: NULLIF-injected NULLs, COUNT vs COUNT(col),
    and the UNKNOWN truth value of a comparison against NULL."""
    od = table(spark, sf_dir, "orders").withColumn(
        "null_status", F.expr("nullif(o_orderstatus, 'F')")
    )
    return od.agg(
        F.count("*").alias("n_total"),
        F.count("null_status").alias("n_notnull"),
        (F.count("*") - F.count("null_status")).alias("n_null"),
        F.count(F.when(F.expr("(null_status = 'O') IS NULL"), 1)).alias("n_unknown"),
    )


@register(
    "filt_distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    category="B",
)
def filt_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a two-column projection (hash aggregate on both keys)."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "filt_correlated_subquery",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
""",
    category="B",
)
def filt_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's average
    balance. Catalyst decorrelates this into an aggregate + join (no
    per-row re-execution — the reference's pandas users would loop; at
    100 TB the decorrelated plan is one aggregation + one shuffle join)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("gdxps_corr_cust")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM gdxps_corr_cust c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM gdxps_corr_cust c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


_PROFILE_ORACLE = """
SELECT 'o_custkey' AS col_name,
       COUNT(*) - COUNT(o_custkey) AS n_nulls,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_val
FROM orders
UNION ALL
SELECT 'o_orderstatus',
       COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderdate',
       COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate),
       strftime(MIN(o_orderdate), '%Y-%m-%d'),
       strftime(MAX(o_orderdate), '%Y-%m-%d')
FROM orders
"""


@register("proj_profile_stats", oracle=_PROFILE_ORACLE, category="B")
def proj_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN PROFILE — per-column null count, exact distinct count, and
    min/max (rendered to strings so mixed types share one report
    schema): the ANALYZE TABLE / data-quality-profiling surface every
    catalog and ingestion gate runs, and the numbers the optimizer's
    own CBO statistics are made of. One aggregate job per column over
    the same scan, unioned — Spark executes the three single-row
    aggregates in parallel and the union is plan-level concatenation.

    Scale: nulls/min/max are partial-aggregable (a handful of bytes
    per partition); the exact distinct is the expensive term — a
    production profiler swaps it for approx_count_distinct / the HLL
    ledger (agg_approx_distinct / agg_hll_rollup are that path) once
    columns get wide. The report is |columns| rows regardless of
    corpus size."""
    od = table(spark, sf_dir, "orders")

    def profile(col: str, render) -> DataFrame:
        return od.agg(
            F.lit(col).alias("col_name"),
            (F.count("*") - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            render(F.min(col)).alias("min_val"),
            render(F.max(col)).alias("max_val"),
        )

    as_str = lambda c: c.cast("string")  # noqa: E731
    as_date = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return (
        profile("o_custkey", as_str)
        .unionByName(profile("o_orderstatus", as_str))
        .unionByName(profile("o_orderdate", as_date))
    )


_STRUCT_ORACLE = """
WITH packed AS (
  SELECT n_nationkey,
         struct_pack(name := n_name, region := n_regionkey) AS info
  FROM nation)
SELECT n_nationkey,
       info.name AS name,
       CAST(info.region AS BIGINT) AS region,
       info.name = upper(info.name) AS is_upper
FROM packed
"""


@register("proj_struct_pack", oracle=_STRUCT_ORACLE, category="B")
def proj_struct_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT pack/unpack round-trip — the nested-type projection
    surface (named_struct ↔ struct_pack): columns packed into a struct
    mid-plan, fields extracted back by name downstream, plus a derived
    predicate on an extracted field. Catalyst collapses the pack/unpack
    pair (nested-schema pruning keeps parquet scans narrow when structs
    come from storage — pinned separately by src_parquet_nested_prune);
    this query pins the expression-level semantics both engines share.

    Scale: map-only; struct creation is zero-copy column grouping in
    Tungsten rows."""
    n = table(spark, sf_dir, "nation")
    packed = n.select(
        "n_nationkey",
        F.struct(
            F.col("n_name").alias("name"), F.col("n_regionkey").alias("region")
        ).alias("info"),
    )
    return packed.select(
        "n_nationkey",
        F.col("info.name").alias("name"),
        F.col("info.region").cast("bigint").alias("region"),
        (F.col("info.name") == F.upper("info.name")).alias("is_upper"),
    )


@register(
    "sql_pipe_query",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderstatus <> 'F'
GROUP BY o_orderpriority
""",
    category="B",
)
def sql_pipe_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE SYNTAX (Spark 4 / SQL:2023 `|>` chains, per the
    "SQL Has Problems" pipe-syntax proposal adopted by Spark 4.0): the
    same logical plan a SELECT would build, written as a linear
    pipeline — FROM |> WHERE |> EXTEND |> AGGREGATE. The engine accepts
    BOTH surfaces; the oracle states the identical query as classic SQL,
    so the hash check proves pipe-syntax parsing reaches the same plan.
    Catalyst treats each |> stage as a normal logical node: the WHERE
    still pushes to the parquet scan and the AGGREGATE is still
    partial-before-shuffle — syntax, not semantics."""
    ev = table(spark, sf_dir, "orders")
    ev.createOrReplaceTempView("gdxps_pipe_orders")
    return spark.sql(
        """
        FROM gdxps_pipe_orders
        |> WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderstatus <> 'F'
        |> EXTEND CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(cents) AS BIGINT) AS revenue_cents
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, revenue_cents
        """
    )
