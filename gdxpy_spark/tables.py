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


def events_ts_encoding(df: DataFrame) -> str:
    """Sniff which of the three known on-disk encodings `events.ts`
    surfaced as: "bigint" (TIMESTAMP(NANOS) via nanosAsLong),
    "timestamp" (µs, session-zoned) or "timestamp_ntz" (µs, naive).
    Anything else raises immediately — a silent fall-through here turns
    into null timestamps or oracle hash mismatches three operators
    downstream, which is much harder to debug than this error. Shared by
    :func:`table` (canonical target NTZ µs) and
    streaming.replay._raw_events (canonical target LONG ns) so a fourth
    encoding added by a future driver drop fails loudly in BOTH paths
    until it is handled in one place."""
    dt = dict(df.dtypes)["ts"]
    if dt not in ("bigint", "timestamp", "timestamp_ntz"):
        raise TypeError(
            f"events.ts has unrecognized dtype {dt!r}; expected int64 "
            "nanos (nanosAsLong), timestamp, or timestamp_ntz — teach "
            "gdxpy_spark.tables.events_ts_encoding about the new layout"
        )
    return dt


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; `events.ts` is normalized to TIMESTAMP_NTZ (µs)."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = events_ts_encoding(df)
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
