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


def zorder_value(x, y, bits: int = 16):
    """Interleave the low `bits` of two non-negative ints into a Z-curve
    (Morton) value: bit b of x lands at 2b, bit b of y at 2b+1. Rows
    close on the curve are close in BOTH dimensions, so sorting by this
    one value clusters a two-dimensional space — pure codegen'd bit
    arithmetic, no UDF. The summands occupy disjoint bits, so + is |."""
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = z + F.shiftleft(
            F.shiftright(x, b).bitwiseAND(F.lit(1)).cast("bigint"), 2 * b
        )
        z = z + F.shiftleft(
            F.shiftright(y, b).bitwiseAND(F.lit(1)).cast("bigint"), 2 * b + 1
        )
    return z


def write_zordered(
    df: DataFrame, path: str, key1: str, key2: str, n_files: int = 16,
    bits: int = 12,
) -> None:
    """Persist parquet Z-ORDERED on two keys (the Delta/Iceberg Z-ORDER
    pattern): each key is min-max scaled to `bits` bits (one metadata-
    sized aggregate), the pair is interleaved into a Morton value, and
    the data is range-partitioned + sorted on it. Each output file then
    covers a small RECTANGLE of (key1, key2) space instead of a thin
    full-width stripe, so parquet footer min/max stats prune files for
    predicates on EITHER key — a linear sort only ever prunes its one
    sort key. This is the layout move for fact tables filtered on two
    independent dimensions (e.g. time × tenant) at 100 TB; the pruning
    win is measured, not assumed, in tests/test_layout.py."""
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(key1), F.max(key1), F.min(key2), F.max(key2)
    ).first()
    top = (1 << bits) - 1

    def scaled(c, lo, hi):
        # Subtract in BIGINT (exact — both operands sit inside the key
        # span), then scale in DOUBLE: (col - lo) * top in bigint
        # overflows once the span exceeds 2^63/top — true for e.g.
        # nanosecond timestamps (the docstring's time×tenant case) — as
        # an ANSI runtime error (wrapped garbage Z-values pre-ANSI).
        # Doubles can't overflow here, and their ≤2^-52 relative
        # rounding is absorbed by the `bits`-bit quantization.
        span = max(int(hi) - int(lo), 1)
        return (
            (F.col(c).cast("bigint") - F.lit(int(lo))).cast("double")
            * top / F.lit(float(span))
        ).cast("bigint")

    z = zorder_value(scaled(key1, lo1, hi1), scaled(key2, lo2, hi2), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
