"""Physical-layout strategies for repeated large-scale joins/aggregations:
bucketing (co-located joins with no shuffle) and key salting (skew
mitigation when AQE's runtime splitting isn't available or the skew is in
an aggregation).

These are the patterns a 100 TB deployment applies to the fact tables
once, so every downstream join/agg on the bucket key runs shuffle-free.
Demonstrated + plan-asserted in tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 8
) -> None:
    """Persist a table bucketed (and sorted) by its join key. Later joins
    between two tables bucketed on the same key with the same bucket
    count are co-located: SortMergeJoin with NO Exchange on either side."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def salted_sum(
    df: DataFrame, key: str, value, alias: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase aggregation for a skewed group key: phase 1 aggregates
    (key, salt) — spreading one hot key over n_salts reducers — phase 2
    combines the partials per key. The result is identical to a direct
    groupBy(key).sum(); only the shuffle distribution changes. (For
    algebraic aggregates Spark's own partial aggregation usually makes
    this unnecessary — salting matters for high-cardinality state per
    key, e.g. collect/distinct — but the pattern is the same.)"""
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    phase1 = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__partial"))
    return phase1.groupBy(key).agg(F.sum("__partial").alias(alias))
