"""SURVEY §2.2 category J — GDX-semantic composite operators.

These re-express the reference's symbol-level operations (SURVEY §2.1:
UEL dictionary R6, wide value records R9, scenario concat R12 / diff R13,
domain checking, densify, squeeze R10) over the relational test tables so
they are DuckDB-oracle-checkable. The same building blocks back the
GdxEngine facade in gdxpy_spark.api.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdxpy_spark.operators._util import dsum, global_row_number, r4, sql_dsum
from gdxpy_spark.registry import register
from gdxpy_spark.tables import table


@register(
    "gdx_uel_dictionary",
    oracle="""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY label) AS BIGINT) AS uel_id, label
FROM (SELECT n_name AS label FROM nation
      UNION
      SELECT r_name FROM region
      UNION
      SELECT c_mktsegment FROM customer) t
""",
    category="J",
)
def gdx_uel_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDX UEL table (R6): a dense, ordered id ↔ label dictionary over
    every label in a column set. In GDX this is the file-global string
    dictionary; here it's distinct-union + a two-pass partition-offset
    rank (global_row_number). The format spec allows 2^31 UELs, so the
    dense ids must NOT come from a single global-order window — the
    distinct shuffles on label, then each range partition ranks locally
    and adds a metadata-sized offset."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    cust = table(spark, sf_dir, "customer")
    labels = (
        nation.select(F.col("n_name").alias("label"))
        .union(region.select("r_name"))
        .union(cust.select("c_mktsegment"))
        .distinct()
    )
    return global_row_number(labels, ["label"], out_col="uel_id").select(
        "uel_id", "label"
    )


@register(
    "gdx_symbol_wide",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(MAX(CASE WHEN measure = 'l_quantity' THEN value END), 4) AS level,
       ROUND(MAX(CASE WHEN measure = 'l_extendedprice' THEN value END), 4) AS marginal,
       ROUND(MAX(CASE WHEN measure = 'l_discount' THEN value END), 4) AS lower,
       ROUND(MAX(CASE WHEN measure = 'l_tax' THEN value END), 4) AS upper
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax FROM lineitem)
UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
GROUP BY l_orderkey, l_linenumber
""",
    category="J",
)
def gdx_symbol_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDX 5-value records (R9): long (key, field, value) records pivoted
    to one wide row per key tuple — how a GDX variable/equation symbol
    (level/marginal/lower/upper/scale) presents for querying. A single
    hash aggregate with conditional MAX per field: one shuffle on keys."""
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    field = {"l_quantity": "level", "l_extendedprice": "marginal",
             "l_discount": "lower", "l_tax": "upper"}
    return long.groupBy("l_orderkey", "l_linenumber").agg(
        *[
            F.round(F.max(F.when(F.col("measure") == m, F.col("value"))), 4).alias(a)
            for m, a in field.items()
        ]
    )


@register(
    "gdx_scenario_concat",
    oracle="""
SELECT 'y1995' AS scenario, o_orderkey, o_totalprice
FROM orders WHERE year(o_orderdate) = 1995
UNION ALL
SELECT 'y1996' AS scenario, o_orderkey, o_totalprice
FROM orders WHERE year(o_orderdate) = 1996
""",
    category="J",
)
def gdx_scenario_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scenario panel (R12): the same symbol loaded from N GDX files and
    stacked with a scenario axis — here two year-slices of orders with a
    literal scenario column via unionByName. With files this is a
    partitioned multi-file read (partition pruning by scenario)."""
    od = table(spark, sf_dir, "orders")

    def slice_(year: int, tag: str) -> DataFrame:
        return od.filter(F.year("o_orderdate") == year).select(
            F.lit(tag).alias("scenario"), "o_orderkey", "o_totalprice"
        )

    return slice_(1995, "y1995").unionByName(slice_(1996, "y1996"))


_DIFF_ORACLE = f"""
WITH a AS (SELECT o_custkey, {sql_dsum('o_totalprice', 'sales')}
           FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
     b AS (SELECT o_custkey, {sql_dsum('o_totalprice', 'sales')}
           FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
       ROUND(coalesce(a.sales, 0) - coalesce(b.sales, 0), 4) + 0.0 AS delta,
       CASE WHEN b.o_custkey IS NULL THEN 'removed'
            WHEN a.o_custkey IS NULL THEN 'added'
            WHEN a.sales = b.sales THEN 'same'
            ELSE 'changed' END AS status
FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
"""


@register("gdx_scenario_diff", oracle=_DIFF_ORACLE, category="J")
def gdx_scenario_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scenario diff (R13, gdxdiff-style): full-outer join two scenario
    aggregates on their key tuple; report delta and added/removed/changed.
    The full-outer join shuffles both sides on the key — at 100 TB the
    two aggregates have already collapsed cardinality, so this is cheap."""
    od = table(spark, sf_dir, "orders")

    def agg_year(year: int) -> DataFrame:
        return (
            od.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(dsum("o_totalprice", "sales"))
        )

    a = agg_year(1995).alias("a")
    b = agg_year(1996).alias("b")
    return a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey"), "full").select(
        F.coalesce(F.col("a.o_custkey"), F.col("b.o_custkey")).alias("o_custkey"),
        (
            F.round(
                F.coalesce(F.col("a.sales"), F.lit(0.0))
                - F.coalesce(F.col("b.sales"), F.lit(0.0)),
                4,
            )
            + F.lit(0.0)  # canonicalize -0.0 (see _util.r4z)
        ).alias("delta"),
        F.when(F.col("b.o_custkey").isNull(), "removed")
        .when(F.col("a.o_custkey").isNull(), "added")
        .when(F.col("a.sales") == F.col("b.sales"), "same")
        .otherwise("changed")
        .alias("status"),
    )


@register(
    "gdx_domain_check",
    oracle="""
SELECT
  (SELECT COUNT(*) FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
      AS bad_partkeys,
  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      AS bad_custkeys,
  (SELECT COUNT(*) FROM lineitem
   WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size < 10))
      AS outside_small_parts
""",
    category="J",
)
def gdx_domain_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain checking (GDX regular domains, SURVEY §1.1): records whose
    key is outside its declared domain set, via left-anti joins. First two
    checks expect 0 on clean data; the third uses a deliberately
    restricted domain (p_size < 10) so violations are non-trivial."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    od = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")

    def cnt(df, alias):
        return df.agg(F.count("*").alias(alias))

    bad_part = li.join(
        F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_anti"
    )
    bad_cust = od.join(
        F.broadcast(cust.select("c_custkey")), od.o_custkey == F.col("c_custkey"), "left_anti"
    )
    small = part.filter(F.col("p_size") < 10).select(F.col("p_partkey").alias("sp_key"))
    outside = li.join(
        F.broadcast(small), li.l_partkey == F.col("sp_key"), "left_anti"
    )
    # one row each → cross join folds the three checks into a single job
    return (
        cnt(bad_part, "bad_partkeys")
        .crossJoin(cnt(bad_cust, "bad_custkeys"))
        .crossJoin(cnt(outside, "outside_small_parts"))
    )


_DENSIFY_ORACLE = f"""
WITH grid AS (SELECT r_name, CAST(m AS INT) AS o_month
              FROM region, generate_series(1, 12) AS t(m)),
     actual AS (
       SELECT r_name, CAST(month(o_orderdate) AS INT) AS o_month,
              {sql_dsum('o_totalprice', 'sales')}
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE year(o_orderdate) = 1995
       GROUP BY 1, 2)
SELECT g.r_name, g.o_month, ROUND(coalesce(a.sales, 0), 4) AS sales
FROM grid g LEFT JOIN actual a ON g.r_name = a.r_name AND g.o_month = a.o_month
"""


@register("gdx_densify", oracle=_DENSIFY_ORACLE, category="J")
def gdx_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify (inverse of GDX sparsity): build the full region × month
    grid, left-join actual sales, COALESCE missing cells to 0 — turning a
    sparse tensor into a dense one. The grid is a cross join of *domain*
    sets (small), never of facts."""
    region = table(spark, sf_dir, "region")
    months = spark.range(1, 13).select(F.col("id").cast("int").alias("o_month"))
    grid = region.select("r_name").crossJoin(months)

    od = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    actual = (
        od.filter(F.year("o_orderdate") == 1995)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", F.month("o_orderdate").cast("int").alias("o_month"))
        .agg(dsum("o_totalprice", "sales"))
    )
    g = grid.alias("g")
    a = actual.alias("a")
    return g.join(
        a,
        (F.col("g.r_name") == F.col("a.r_name"))
        & (F.col("g.o_month") == F.col("a.o_month")),
        "left",
    ).select(
        F.col("g.r_name").alias("r_name"),
        F.col("g.o_month").alias("o_month"),
        F.round(F.coalesce(F.col("a.sales"), F.lit(0.0)), 4).alias("sales"),
    )


@register(
    "gdx_squeeze",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_returnflag = 'A' AND l_linestatus = 'F'
""",
    category="J",
)
def gdx_squeeze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Squeeze (R10): drop key columns that are constant in a slice —
    gdxpy drops singleton MultiIndex levels after slicing. The constant
    probe is one tiny countDistinct aggregate (metadata-scale collect is
    a planner decision, not a data loop); the surviving columns form the
    projection."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "A") & (F.col("l_linestatus") == "F")
    )
    key_cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"]
    probe = li.agg(
        *[F.countDistinct(c).alias(c) for c in key_cols]
    ).first()
    keep = [c for c in key_cols if probe[c] > 1]
    return li.select(*keep, "l_quantity")
