"""SURVEY §2.2 category A — GDX source/sink queries (weak-checked: DuckDB
cannot read GDX, so the driver records rows-only; exact read-back equality
is asserted in tests/test_gdx_datasource.py)."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdxpy_spark.registry import register
from gdxpy_spark.sources import gdx_datasource
from gdxpy_spark.sources.fixtures import build_fixture_gdx, build_fixture_gdx_gams
from gdxpy_spark.tables import table


# Catalog metadata is constant by fixture construction except nrecs,
# which DuckDB derives from the same source tables the fixture was built
# from — so even the catalog scan is hash-checkable (r6 upgrade).
_GDX_CATALOG_ORACLE = """
SELECT * FROM (
  SELECT 'region_set' AS name, 1 AS dim, 'set' AS type, 0 AS subtype,
         (SELECT COUNT(*) FROM region) AS nrecs,
         'regions' AS expl_text, '*' AS domains, '' AS alias_of
  UNION ALL
  SELECT 'nation_region', 2, 'set', 0, (SELECT COUNT(*) FROM nation),
         'nation→region membership', '*,region_set', ''
  UNION ALL
  SELECT 'acctbal', 1, 'parameter', 0, (SELECT COUNT(*) FROM customer),
         'customer balance', '*', ''
  UNION ALL
  SELECT 'monthly_sales', 2, 'parameter', 0,
         (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderstatus,
                                month(o_orderdate) FROM orders)),
         'sales by status×month', '*,*', ''
  UNION ALL
  SELECT 'flow', 2, 'variable', 1,
         (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderstatus,
                                o_orderpriority FROM orders)),
         'order flow', '*,*', ''
  UNION ALL
  SELECT 'n_orders', 0, 'parameter', 0, 1, 'scalar: order count', '', ''
  UNION ALL
  SELECT 'specials', 1, 'parameter', 0, 5, 'GDX special values', '*', ''
)
"""


@register("src_gdx_catalog", oracle=_GDX_CATALOG_ORACLE, category="A")
def src_gdx_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbol catalog of a .gdx (gdxpy R2: name/dim/type/nrecs/expl text)
    via the metadata scan of the custom DataSource. The DataSource exposes
    `domains` as ARRAY<STRING>; the registered query flattens it to a
    comma-joined STRING so the driver's rows-only checker (which hashes
    values) sees only hashable scalars — nothing is lost for the check
    since the join is deterministic and order-preserving."""
    gdx_datasource.register(spark)
    path = build_fixture_gdx(sf_dir)
    cat = spark.read.format("gdx").option("symbol", "*").load(path)
    return cat.select(
        "name", "dim", "type", "subtype", "nrecs", "expl_text",
        F.concat_ws(",", F.col("domains")).alias("domains"), "alias_of",
    )


# The fixture's monthly_sales symbol is DERIVED from orders (fixtures.py
# builds it with this exact aggregate), so although DuckDB cannot read
# GDX bytes, it CAN recompute what a lossless write+read must return —
# upgrading these IO queries from rows-only to full hash checks (r6).
_GDX_MS_ORACLE = """
SELECT o_orderstatus AS k1,
       'm' || CAST(month(o_orderdate) AS VARCHAR) AS k2,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS value,
       false AS is_eps
FROM orders GROUP BY 1, 2
"""


@register("src_gdx_read", oracle=_GDX_MS_ORACLE, category="A")
def src_gdx_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read one symbol (monthly_sales, dim 2 parameter) from a .gdx as a
    long DataFrame (gdxpy R5 — but a lazy Arrow-batched scan, not a
    per-record C loop)."""
    gdx_datasource.register(spark)
    path = build_fixture_gdx(sf_dir)
    return spark.read.format("gdx").option("symbol", "monthly_sales").load(path)


_GDX_MS_BOTH_ORACLE = """
SELECT o_orderstatus AS k1,
       'm' || CAST(month(o_orderdate) AS VARCHAR) AS k2,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS value,
       false AS is_eps, container
FROM orders CROSS JOIN (VALUES ('plain'), ('zlib')) AS c(container)
GROUP BY 1, 2, container
"""


@register("src_gdx_gams_read", oracle=_GDX_MS_BOTH_ORACLE, category="A")
def src_gdx_gams_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a symbol from a GAMS-V7-LAYOUT .gdx (gdx_gams.py — header
    byte 123 + "GAMSGDX", delta-encoded keys, GMS_SV_* sentinels)
    through the same format("gdx") scan; the DataSource sniffs the magic
    and serves either container (gdx_datasource.open_gdx). Upgrades
    round-1's GDXPY7-only src_gdx_read toward native-layout parity;
    byte-level conformance vs GAMS-produced files remains unverifiable
    in this container (no GAMS install — SURVEY §0), pinned instead by
    the hand-built golden fixture in tests/test_gdx_gams.py. Reads BOTH
    container variants (plain + zlib stream-page, r6) and unions them
    with a tag — the rows-only driver check then implicitly asserts the
    two byte layouts decode to identical records."""
    gdx_datasource.register(spark)
    plain = build_fixture_gdx_gams(sf_dir)
    compr = build_fixture_gdx_gams(sf_dir, compress=True)
    a = (spark.read.format("gdx").option("symbol", "monthly_sales").load(plain)
         .withColumn("container", F.lit("plain")))
    b = (spark.read.format("gdx").option("symbol", "monthly_sales").load(compr)
         .withColumn("container", F.lit("zlib")))
    return a.unionByName(b)


_GDX_WRITE_ORACLE = """
SELECT n_name AS k1, CAST(COUNT(*) AS DOUBLE) AS value, false AS is_eps
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("src_gdx_write", oracle=_GDX_WRITE_ORACLE, category="A")
def src_gdx_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame → .gdx symbol → read back (gdxpy R16 + round-trip): the
    per-nation customer count written as a dim-1 parameter."""
    gdx_datasource.register(spark)
    counts = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count("*").cast("double").alias("value"))
        .select(
            F.col("n_name").alias("k1"), "value", F.lit(False).alias("is_eps")
        )
    )
    out = os.path.join(
        tempfile.gettempdir(), "gdxpy_spark_io", "gdx", f"{uuid.uuid4().hex}.gdx"
    )
    (
        counts.write.format("gdx")
        .option("symbol", "cust_count")
        .option("symtype", "parameter")
        .mode("overwrite")
        .save(out)
    )
    return spark.read.format("gdx").option("symbol", "cust_count").load(out)
