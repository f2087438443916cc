"""Canonical loaders for the driver test tables.

All SURVEY §2.2 queries read their inputs through :func:`table` so that
session-level determinism knobs are applied exactly once and identically
no matter which session (ours or the driver's) runs the query:

- ``spark.sql.session.timeZone = UTC`` — DuckDB timestamps are UTC-naive;
  pinning the Spark session keeps TIMESTAMP↔NTZ conversions and collected
  values byte-identical to the oracle.
- ``spark.sql.legacy.parquet.nanosAsLong = true`` — older driver drops of
  ``events.parquet`` store TIMESTAMP(NANOS) which Spark cannot read
  natively; with the conf set they surface as int64 nanos and we rebuild
  a TIMESTAMP_NTZ via *integer* division (``ts div 1000`` — going through
  a double would lose precision at 1.7e18 ns). Newer drops store
  TIMESTAMP(MICROS), which Spark reads directly as TIMESTAMP_NTZ; the
  loader sniffs the surfaced dtype and normalizes either way, so the
  canonical in-engine type is always TIMESTAMP_NTZ(µs).

At 100 TB these loaders are the single choke-point where layout policy
lives: path-level partition discovery, pushdown-friendly schemas, and
(for `events`) the ns→µs normalization stay scan-side so Catalyst can
still prune columns and push filters into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def configure(spark: SparkSession) -> SparkSession:
    """Idempotent, runtime-settable determinism/perf knobs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; `events.ts` is normalized to TIMESTAMP_NTZ (µs)."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = dict(df.dtypes)["ts"]
        if dt == "bigint":
            # TIMESTAMP(NANOS) file read as int64 nanos (nanosAsLong):
            # nanos → µs (exact integer division) → NTZ timestamp.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        elif dt == "timestamp":
            # session is pinned UTC, so the wall-clock value is unchanged
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        # timestamp_ntz: already canonical
    return df
