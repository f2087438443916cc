"""SURVEY §2.2 category F — sorts / limits / set operations.

The driver's value-hash is order-insensitive, so the two sort queries
encode the order *into* row values via row_number — that is what actually
verifies NULLS FIRST/LAST and tiebreak behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdxpy_spark.operators._util import global_row_number
from gdxpy_spark.registry import register
from gdxpy_spark.tables import table


@register(
    "sort_multi_nulls",
    oracle="""
SELECT ROW_NUMBER() OVER (ORDER BY NULLIF(o_orderstatus, 'P') ASC NULLS FIRST,
                          o_totalprice DESC NULLS LAST,
                          o_orderkey ASC) AS rn,
       o_orderkey, NULLIF(o_orderstatus, 'P') AS null_status, o_totalprice
FROM orders
""",
    category="F",
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with injected NULLs, NULLS FIRST vs LAST; the
    rank column materializes the order so the hash check can see it.

    The rank is the two-pass partition-offset rank (global_row_number),
    NOT a global-order window: orders is fact-sized, and a single
    WindowExec over the whole table is the one-task bottleneck at scale.
    o_orderkey makes the order total, so the rank is deterministic."""
    od = table(spark, sf_dir, "orders").withColumn(
        "null_status", F.expr("nullif(o_orderstatus, 'P')")
    )
    ranked = global_row_number(
        od,
        [
            ("null_status", "asc", "nulls_first"),
            ("o_totalprice", "desc", "nulls_last"),
            "o_orderkey",
        ],
        out_col="rn",
    )
    return ranked.select("rn", "o_orderkey", "null_status", "o_totalprice")


@register(
    "sort_limit_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 10
""",
    category="F",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (TakeOrderedAndProject: each task keeps a
    10-row heap, the driver merges — no global sort even at 100 TB)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
    )


def _year_slice(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    od = table(spark, sf_dir, "orders")
    return od.filter(F.year("o_orderdate") == year).select(
        "o_custkey", "o_orderstatus"
    )


_SLICE = "SELECT o_custkey, o_orderstatus FROM orders WHERE year(o_orderdate) = {y}"


@register(
    "set_union_all",
    oracle=f"{_SLICE.format(y=1995)} UNION ALL {_SLICE.format(y=1996)}",
    category="F",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of the 1995 and 1996 order slices (duplicates kept)."""
    return _year_slice(spark, sf_dir, 1995).unionByName(
        _year_slice(spark, sf_dir, 1996)
    )


@register(
    "set_union_distinct",
    oracle=f"{_SLICE.format(y=1995)} UNION {_SLICE.format(y=1996)}",
    category="F",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (dedup after concatenation)."""
    return (
        _year_slice(spark, sf_dir, 1995)
        .unionByName(_year_slice(spark, sf_dir, 1996))
        .distinct()
    )


_KEY_SLICE = "SELECT o_custkey FROM orders WHERE year(o_orderdate) = {y}"


@register(
    "set_intersect",
    oracle=f"{_KEY_SLICE.format(y=1995)} INTERSECT {_KEY_SLICE.format(y=1996)}",
    category="F",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1995 and 1996 (set semantics)."""
    a = _year_slice(spark, sf_dir, 1995).select("o_custkey")
    b = _year_slice(spark, sf_dir, 1996).select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle=f"{_KEY_SLICE.format(y=1995)} EXCEPT {_KEY_SLICE.format(y=1996)}",
    category="F",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1995 but not 1996 (set difference)."""
    a = _year_slice(spark, sf_dir, 1995).select("o_custkey")
    b = _year_slice(spark, sf_dir, 1996).select("o_custkey")
    return a.subtract(b)


_ST_SLICE = "SELECT o_orderstatus FROM orders WHERE year(o_orderdate) = {y}"


@register(
    "set_intersect_all",
    oracle=f"{_ST_SLICE.format(y=1995)} INTERSECT ALL {_ST_SLICE.format(y=1996)}",
    category="F",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersect — multiplicity = min(count_a, count_b) per value."""
    a = _year_slice(spark, sf_dir, 1995).select("o_orderstatus")
    b = _year_slice(spark, sf_dir, 1996).select("o_orderstatus")
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle=f"{_ST_SLICE.format(y=1995)} EXCEPT ALL {_ST_SLICE.format(y=1996)}",
    category="F",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag except — multiplicity = max(0, count_a - count_b) per value."""
    a = _year_slice(spark, sf_dir, 1995).select("o_orderstatus")
    b = _year_slice(spark, sf_dir, 1996).select("o_orderstatus")
    return a.exceptAll(b)


_UNION_BY_NAME_ORACLE = """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(NULL AS VARCHAR) AS source
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars, source
FROM documents WHERE doc_id % 2 = 1
"""


@register("set_union_by_name", oracle=_UNION_BY_NAME_ORACLE, category="F")
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA-EVOLVING UNION — unionByName(allowMissingColumns=True),
    the DataFrame-API sibling of the mergeSchema read
    (src_parquet_merge_schema): two frames whose column sets differ
    (and whose shared columns sit in DIFFERENT positions) combine BY
    NAME with NULL fill for each side's missing columns. This is the
    union a pipeline actually needs when combining data generations —
    positional UNION would silently misalign columns or refuse; the
    oracle spells out the same alignment with explicit NULL casts.

    Scale: unions are plan-level concatenation — no shuffle, no
    materialization; each branch keeps its own scan pruning."""
    docs = table(spark, sf_dir, "documents")
    old_gen = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    new_gen = docs.filter(F.col("doc_id") % 2 == 1).select(
        "source", "doc_id", "lang"  # different column set AND order
    )
    return old_gen.unionByName(new_gen, allowMissingColumns=True)


_RECONCILE_ORACLE = """
WITH a AS (
  SELECT o_orderkey AS k, o_totalprice AS v FROM orders
  WHERE o_orderkey % 97 <> 0),
b AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 0.01
              ELSE o_totalprice END AS v
  FROM orders WHERE o_orderkey % 101 <> 0)
SELECT CASE WHEN a.k IS NULL THEN 'only_b'
            WHEN b.k IS NULL THEN 'only_a'
            WHEN a.v = b.v THEN 'match'
            ELSE 'value_mismatch' END AS status,
       COUNT(*) AS n_keys
FROM a FULL JOIN b ON a.k = b.k
GROUP BY 1
"""


@register("set_reconcile_report", oracle=_RECONCILE_ORACLE, category="F")
def set_reconcile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECONCILIATION REPORT — the migration/backfill validation every
    pipeline cutover runs: two snapshots of the same keyed table (here:
    deterministic fixture drift — each side drops a different key
    slice, one side perturbs some values) classified per key into
    only_a / only_b / match / value_mismatch and rolled up to counts.
    One FULL OUTER join on the key + a CASE classifier + one tiny agg —
    the declarative form auditors can read, instead of the four
    separate anti/semi joins teams hand-write (Catalyst evaluates the
    single shared join once; four hand-written joins scan both
    snapshots four times).

    Scale: one key-partitioned shuffle of (key, value) pairs per side;
    the report is 4 rows. Value equality here is on stored doubles
    (identical bits both engines); production reconciliations compare
    a per-row content hash instead so wide rows still move only 40
    bytes — the shape is unchanged."""
    od = table(spark, sf_dir, "orders")
    a = od.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("va")
    )
    b = od.filter(F.col("o_orderkey") % 101 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 0.01
        ).otherwise(F.col("o_totalprice")).alias("vb"),
    )
    j = a.join(b, "k", "full")
    status = (
        F.when(F.col("va").isNull(), "only_b")
        .when(F.col("vb").isNull(), "only_a")
        .when(F.col("va") == F.col("vb"), "match")
        .otherwise("value_mismatch")
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_keys"))
    )
