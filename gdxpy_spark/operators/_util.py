"""Determinism helpers shared by the operator inventory.

Why DECIMAL-routed sums: Spark aggregates partition-parallel, DuckDB
sequentially, so a raw SUM(double) differs between the two in the last
few ulps; ROUND(x, 4) can then flip on boundary values and break the
driver's value-hash. Casting each row to DECIMAL first makes the sum
exact and order-independent, after which both engines produce the same
double. The per-row double→decimal conversion itself is deterministic
on both engines for our value ranges (|x| < 1e12 with ulp « 1e-6, so a
tie at the rounding digit cannot occur).

These helpers are also the scale story: DECIMAL(18, s) stays Long-backed
in Tungsten, so the exact sum costs roughly an integer add per row and
keeps whole-stage codegen — no Python, no order-sensitivity, no penalty
at 100 TB.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import Column, DataFrame, Window, functions as F


def files_fingerprint(paths) -> str:
    """Content identity for a cache/layout directory derived from source
    files: sha256 over each file's ABSOLUTE path + size + mtime_ns.
    Embedding this in the directory name ties the cache to the bytes on
    disk — a regenerated dataset, or two datasets sharing a basename,
    can never be served a stale build (the r6-advice hazard). Shared by
    the replay fixture cache and the DPP layout builder; callers add
    their own version tag for slicing/schema changes."""
    h = hashlib.sha256()
    for p in sorted(os.path.abspath(x) for x in paths):
        st = os.stat(p)
        h.update(f"|{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def atomic_publish(build_dir, final_dir, is_complete=None) -> None:
    """Publish a COMPLETED build directory with one same-filesystem
    rename: a concurrent reader sees either the whole artifact or a
    cache miss, never a partially-populated directory.

    A failed rename is ambiguous: either a concurrent builder already
    published a complete copy (discard ours), or the destination is a
    STALE BROKEN dir — e.g. a /tmp cleaner aged out one file — which
    the rename can never replace, so without repair every future run
    would rebuild and then serve the broken cache anyway. Callers pass
    `is_complete(dir) -> bool` so the broken case is detected: the
    stale dir is atomically moved aside and the publish retried once.
    A concurrent publisher winning at any step leaves a complete dir,
    which the check accepts."""
    import uuid as _uuid

    try:
        os.rename(build_dir, final_dir)
        return
    except OSError:
        pass
    if is_complete is not None and not is_complete(final_dir):
        trash = f"{final_dir}.stale_{_uuid.uuid4().hex[:8]}"
        try:
            os.rename(final_dir, trash)
        except OSError:
            pass  # another repairer already moved it aside
        else:
            shutil.rmtree(trash, ignore_errors=True)
        try:
            os.rename(build_dir, final_dir)
            return
        except OSError:
            pass  # a concurrent publisher won after the repair
    shutil.rmtree(build_dir, ignore_errors=True)

# Decimal wide enough for sf0.1 sums with headroom; Long-backed (<=18 digits).
_DEC = "decimal(18,6)"


def dec(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(_DEC)


def dsum(c: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double expression, rounded to 4, as double."""
    return F.round(F.sum(dec(c)).cast("double"), 4).alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Order-independent AVG (exact decimal sum / count), rounded to 4."""
    c = F.col(c) if isinstance(c, str) else c
    return F.round(F.sum(dec(c)).cast("double") / F.count(c), 4).alias(alias)


def r4(c: Column | str, alias: str | None = None) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    c = F.round(c, 4)
    return c.alias(alias) if alias else c


def r4z(c: Column | str, alias: str) -> Column:
    """ROUND(x, 4) with the zero sign canonicalized (+0.0): engines
    disagree on whether a tiny negative rounds to -0.0 or 0.0, and a
    hash/sort over the rendered value treats those as different rows.
    IEEE: -0.0 + 0.0 = +0.0; finite values unchanged."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.round(c, 4) + F.lit(0.0)).alias(alias)


def money4(c: Column | str, alias: str) -> Column:
    """Per-row money expression rounded to 4 decimals, canonicalized
    through DECIMAL first. Rounding the raw double is engine-divergent:
    price×(1-disc) products sit *exactly* on 4-decimal half-way points,
    and Spark (exact BigDecimal HALF_UP) vs DuckDB (scaled-double
    nearbyint) disagree there. DECIMAL(18,6) fixes a canonical value
    (the true product has ≤6 decimals, so no tie at the 6th), then the
    decimal ROUND is exact and identical on both engines."""
    return F.round(dec(c), 4).cast("double").alias(alias)


def sql_money4(expr: str, alias: str) -> str:
    return f"CAST(ROUND(CAST(({expr}) AS DECIMAL(18,6)), 4) AS DOUBLE) AS {alias}"


# monotonically_increasing_id's documented layout: partition id in the
# upper 31 bits, per-partition record number in the lower 33.
# --- bounded cache lifetimes -------------------------------------------------
# Operators that cache an intermediate frame (blocked-Jaccard token
# masks, LSH bucket signatures, IVF assignments) register it here; the
# NEXT registered query's build releases everything from the previous
# one. Sequential runners (the driver's correctness loop, bench.py, a
# user stepping through queries) therefore hold at most one query's
# caches at a time — at 100 TB an unreleased corpus-sized token frame
# is executor-storage pressure for every later query, even though
# MEMORY_AND_DISK degrades gracefully. Interleaved use stays CORRECT:
# unpersist() only drops the materialized copy, the plan recomputes.
_live_caches: list[DataFrame] = []


def managed_cache(df: DataFrame) -> DataFrame:
    """cache() with a lifetime bounded by the operator-call cadence."""
    df = df.cache()
    _live_caches.append(df)
    return df


def release_managed_caches() -> None:
    while _live_caches:
        _live_caches.pop().unpersist()


def word_shingles(tokens, k: int):
    """k-word shingle strings from a token array (space-joined), one per
    position: ['a','b','c'] with k=2 → ['a b', 'b c'].

    Semantically identical to
    ``transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(t, i, k)))``
    but ~2-3× faster: the transform form allocates a fresh k-element
    slice PER POSITION (O(n·k) array copies through the interpreted HOF
    evaluator), this form takes k column-level slices PER DOCUMENT and
    zips them pairwise (measured 1.5 s → 0.7 s for the sf0.1 bigram
    explode; equality of both forms checked over the whole corpus).
    Caller must guard ``size(tokens) >= k`` — the slice length n-k+1
    would be non-positive otherwise."""
    m = F.size(tokens) - (k - 1)
    g = F.slice(tokens, 1, m)
    for j in range(2, k + 1):
        g = F.zip_with(
            g, F.slice(tokens, j, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return g


_MID_LOCAL_MASK = (1 << 33) - 1


def shuffle_partitions(spark) -> int:
    """spark.sql.shuffle.partitions as an int, falling back to
    defaultParallelism on platforms where the conf is non-numeric
    (e.g. "auto" under Databricks auto-optimized shuffle)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def global_row_number(
    df: DataFrame, order_cols, out_col: str = "rn", total_col: str | None = None
) -> DataFrame:
    """Scalable global ROW_NUMBER() OVER (ORDER BY ...): the two-pass
    partition-offset rank, with no single-partition exchange anywhere.

    A plain `row_number().over(Window.orderBy(...))` funnels the whole
    table through ONE WindowExec task — the classic 100 TB killer. Here:

    1. `repartitionByRange(N, ...)` on the sort key → partitions are
       globally ordered (partition i's rows all sort before partition
       i+1's);
    2. `sortWithinPartitions` orders rows inside each partition;
    3. each row's (partition, local row number) comes straight from
       `monotonically_increasing_id`'s documented bit layout — no
       WindowExec at all;
    4. per-partition row counts (metadata-sized: one row per partition)
       self-join into cumulative start offsets, broadcast back, added.

    The counts branch and the output branch must see the SAME physical
    range partitioning (the range partitioner SAMPLES its boundaries, so
    two independent materializations may not agree). r4 guaranteed that
    with `localCheckpoint` — correct, but it pins a full second copy of
    the table in executor storage, which at 100 TB is the dominant cost
    of the whole operator. This version instead guarantees it by
    construction:

    - the partition count is pinned explicitly (REPARTITION_BY_NUM), so
      AQE must preserve the exchange's partitioning exactly — it may not
      coalesce the two consumers differently; and
    - both branches are the identical exchange subtree, so exchange
      reuse (plain ReuseExchange, or AQE stage reuse) materializes the
      range shuffle ONCE and every consumer reads the same map output —
      partition ids therefore agree across branches by identity, not by
      luck. tests/test_plans.py::test_global_row_number_reuses_one_range_
      exchange pins ReusedExchange in the executed plan, so a Spark
      upgrade that stopped reusing would fail loudly instead of
      silently mis-ranking.

    The biggest structure any one task ever holds is one range partition;
    the only driver-sized state is the counts aggregate; nothing is
    cached or checkpointed. `order_cols` must be a total order (include
    a unique tiebreak column) for the rank to be deterministic.
    """
    n_parts = shuffle_partitions(df.sparkSession)
    part = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .withColumn("_local", F.col("_mid").bitwiseAND(F.lit(_MID_LOCAL_MASK)))
    )
    counts = part.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    prior = counts.select(F.col("_pid").alias("_p2"), F.col("_cnt").alias("_c2"))
    # cross join of two metadata-sized frames (≤ n_parts² rows): per pid,
    # _off = rows in strictly-earlier partitions; optionally the grand
    # total too — callers needing n (percent_rank, cume_dist, ntile) get
    # it from this same aggregate instead of a second full-table scan.
    aggs = [
        F.coalesce(
            F.sum(F.when(F.col("_p2") < F.col("_pid"), F.col("_c2"))), F.lit(0)
        ).alias("_off")
    ]
    if total_col is not None:
        aggs.append(F.sum("_c2").alias(total_col))
    offsets = (
        counts.join(F.broadcast(prior), F.lit(True)).groupBy("_pid").agg(*aggs)
    )
    return (
        part.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_off") + 1).cast("bigint"))
        .drop("_mid", "_pid", "_local", "_off")
    )


# DuckDB-side equivalents (string templates for oracle SQL)
def sql_dsum(expr: str, alias: str) -> str:
    return f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE), 4) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), 4) AS {alias}"
    )


def global_running_sum(
    df: DataFrame, order_cols, value_col: str, out_col: str = "cum"
) -> DataFrame:
    """Scalable global SUM(value) OVER (ORDER BY ...) — the distributed
    PREFIX SUM, built on the same two-pass partition-offset machinery
    as global_row_number (a plain unpartitioned running-sum window
    would funnel the whole table through ONE WindowExec task):

    1. one range shuffle on the sort key → globally ordered partitions,
       partition ids assigned from monotonically_increasing_id's bit
       layout exactly as in global_row_number (same exchange-reuse
       guarantee: the offsets branch and the output branch consume the
       IDENTICAL range-exchange subtree, so partition ids agree by
       identity);
    2. per-partition LOCAL running sums via a window PARTITIONED BY the
       partition id — parallel across partitions (this costs one hash
       exchange on _pid: Catalyst cannot see that rows are already
       pid-clustered after step 1; an accepted single extra shuffle,
       nothing single-task);
    3. per-partition value totals (metadata-sized) → exclusive prefix
       offsets via the same broadcast self-join → local + offset.

    `order_cols` must be a total order for a deterministic result.
    `value_col` must be integral or decimal if the caller needs
    cross-engine exactness (float prefix sums are order-dependent)."""
    n_parts = shuffle_partitions(df.sparkSession)
    part = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .withColumn("_local", F.col("_mid").bitwiseAND(F.lit(_MID_LOCAL_MASK)))
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("_local")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_lcum", F.sum(value_col).over(w))
    totals = part.groupBy("_pid").agg(F.sum(value_col).alias("_vtot"))
    prior = totals.select(F.col("_pid").alias("_p2"), F.col("_vtot").alias("_v2"))
    offsets = (
        totals.join(F.broadcast(prior), F.lit(True))
        .groupBy("_pid")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_p2") < F.col("_pid"), F.col("_v2"))),
                F.lit(0),
            ).alias("_voff")
        )
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        # no result cast: the sum keeps the value column's own aggregate
        # type (bigint stays bigint, decimal stays decimal) — a blanket
        # bigint cast would silently truncate decimal prefix sums
        .withColumn(out_col, F.col("_lcum") + F.col("_voff"))
        .drop("_mid", "_pid", "_local", "_lcum", "_voff")
    )
