"""SURVEY §2.2 category E — window functions.

Every window is PARTITION BY + a total ORDER BY (unique-key tiebreak), so
results are deterministic and hash-comparable. Scale: one shuffle on the
partition key, sort within partition; no window here is unbounded over
the whole table (that would serialize onto one task at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from gdxpy_spark.operators._util import dec, global_row_number
from gdxpy_spark.registry import register
from gdxpy_spark.tables import table


@register(
    "win_row_number_topk",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) t
WHERE rn <= 3
""",
    category="E",
)
def win_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price (rank-then-filter; Spark
    pushes the rn<=3 filter into the window sort as a group-limit)."""
    od = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        od.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_rank_dense",
    oracle="""
SELECT p_brand, p_partkey, p_size,
       RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS drnk
FROM part
""",
    category="E",
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank of parts by size within brand (ties share rank —
    deterministic without a tiebreak because rank is order-insensitive
    among peers)."""
    p = table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "win_ntile_pct",
    oracle="""
SELECT o_orderkey,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 4) AS cume
FROM orders
WINDOW w AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
    category="E",
)
def win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ntile/percent_rank/cume_dist over a total order — WITHOUT a
    global window. A plain `Window.orderBy(...)` funnels the entire table
    through one WindowExec task (the classic 100 TB killer); but because
    the ORDER BY here is a total order (unique o_orderkey tiebreak, so no
    peer groups), all three functions are closed forms of (rn, n) where
    rn is the scalable two-pass rank (global_row_number):

      percent_rank = (rn-1)/(n-1)          (rank == rn, no ties)
      cume_dist    = rn/n                  (peers(row) == {row})
      ntile(4)     = first n%4 buckets get ceil(n/4) rows, rest floor

    Plan shape: one range shuffle (reused across the rank's two branches)
    + a metadata-sized count broadcast. Zero single-partition exchanges —
    this query used to be the engine's one documented exemption from
    tests/test_plans.py::test_no_single_partition_window_anywhere; the
    exemption is now removed. The sketch twin win_ntile_pct_sketch stays
    as the cheaper approximate path (no global sort at all)."""
    od = table(spark, sf_dir, "orders")
    ranked = global_row_number(
        od,
        ["o_totalprice", "o_orderkey"],
        out_col="rn",
        total_col="_n",  # n rides the rank's own partition-counts agg: no 2nd scan
    )
    rn, n = F.col("rn"), F.col("_n")
    big, r = F.floor(n / 4) + 1, n % 4
    cutoff = r * big
    quartile = F.when(rn <= cutoff, F.floor((rn - 1) / big) + 1).otherwise(
        r + F.floor((rn - cutoff - 1) / F.greatest(F.floor(n / 4), F.lit(1))) + 1
    )
    return ranked.select(
        "o_orderkey",
        quartile.cast("int").alias("quartile"),
        F.round(
            F.when(n > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0)), 4
        ).alias("pct_rank"),
        F.round(rn / n, 4).alias("cume"),
    )


@register("win_ntile_pct_sketch", oracle=None, category="E")  # weak: sketch-based
def win_ntile_pct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe alternative to win_ntile_pct's global window: quartile
    assignment via a pre-computed quantile SKETCH instead of a global
    sort. One tiny aggregate computes approximate 25/50/75 boundaries
    (percentile_approx, accuracy 10⁴); every row then gets its quartile
    with a map-side broadcast comparison — no shuffle of the fact table,
    no single-partition WindowExec, O(1) driver state. This is THE
    100 TB plan for global quantile bucketing: the sketch is mergeable
    (t-digest-style partial aggregation), and only boundary-adjacent
    rows can disagree with exact NTILE (envelope pinned in
    tests/test_text_analysis.py::test_ntile_sketch_envelope). Weak-
    checked: boundary quantization is engine-specific by nature."""
    od = table(spark, sf_dir, "orders")
    sketch = od.agg(
        F.percentile_approx(
            "o_totalprice",
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
            F.lit(10000),
        ).alias("qs")
    )
    quartile = F.aggregate(
        F.col("qs"),
        F.lit(1),
        lambda acc, q: acc + F.when(F.col("o_totalprice") > q, 1).otherwise(0),
    )
    return (
        od.crossJoin(F.broadcast(sketch))
        .select("o_orderkey", quartile.alias("quartile"))
    )


@register(
    "win_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       date_diff('day',
                 CAST(LAG(o_orderdate) OVER w AS DATE),
                 CAST(o_orderdate AS DATE)) AS days_since_prev,
       CAST(LEAD(o_orderkey) OVER w AS BIGINT) AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
    category="E",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer day gap between consecutive orders (lag) + next order
    key (lead)."""
    od = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date"),
        ).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "win_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 4) AS running_total
FROM orders
""",
    category="E",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (ROWS frame; decimal-routed so the
    running sum is exact and order-independent across engines)."""
    od = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec("o_totalprice")).over(w).cast("double"), 4).alias(
            "running_total"
        ),
    )


@register(
    "win_moving_avg",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 4) AS moving_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    category="E",
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of order totals per customer (exact decimal
    sum / frame count, so both engines agree bit-for-bit)."""
    od = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-2, W.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(dec("o_totalprice")).over(w).cast("double")
            / F.count("*").over(w),
            4,
        ).alias("moving_avg"),
    )


@register(
    "win_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice
           RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING
       ) AS DOUBLE), 4) AS nearby_total
FROM orders
""",
    category="E",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: sum of orders whose total price is within ±100 of the
    current row's (value-based frame, tie-safe by construction)."""
    od = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-100, 100)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec("o_totalprice")).over(w).cast("double"), 4).alias(
            "nearby_total"
        ),
    )


@register(
    "win_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER w AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    category="E",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full frame (the default
    frame would make last_value = current row — classic trap)."""
    od = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


_STREAKS_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events),
r AS (
  SELECT user_id, day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM d),
g AS (
  SELECT user_id, day - CAST(rn AS INT) AS grp FROM r),
s AS (
  SELECT user_id, grp, COUNT(*) AS streak
  FROM g GROUP BY user_id, grp)
SELECT user_id,
       CAST(MAX(streak) AS BIGINT) AS longest_streak,
       CAST(SUM(streak) AS BIGINT) AS n_active_days
FROM s GROUP BY user_id
"""


@register("win_streaks", oracle=_STREAKS_ORACLE, category="E")
def win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS: longest run of CONSECUTIVE active days per
    user — the canonical streak/retention window pattern (login
    streaks, SLA uptime runs, sensor liveness). The trick is the
    classic one: for a sorted sequence of distinct days, day −
    row_number() is CONSTANT exactly within a consecutive run, so a
    groupBy on that anchor date splits the islands without any
    self-join or iterative logic.

    Plan: distinct (user, day) first — the raw event stream collapses
    to at most users × days rows before anything else, so the window
    input is bounded by the calendar, not event volume. Then ONE
    row_number window partitioned by user (no global window), one
    island aggregate, one per-user rollup; all three stages reuse the
    user-keyed partitioning. At 100 TB this is: dedup-shrink map-side,
    shuffle once by user, everything after is metadata-sized."""
    ev = table(spark, sf_dir, "events")
    d = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    g = d.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("grp"),
    )
    s = g.groupBy("user_id", "grp").agg(F.count("*").alias("streak"))
    return s.groupBy("user_id").agg(
        F.max("streak").cast("bigint").alias("longest_streak"),
        F.sum("streak").cast("bigint").alias("n_active_days"),
    )


@register(
    "win_distinct_rolling",
    oracle="""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       COUNT(DISTINCT o_orderpriority) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS distinct_prios
FROM orders
""",
    category="E",
)
def win_distinct_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT-over-window — how many distinct order priorities each
    customer used across their last 4 orders (rolling behavioral
    cardinality: device churn, plan switching, fraud-pattern width).
    Spark has NO count(DISTINCT) window aggregate (DuckDB does — the
    oracle uses it natively); the engine expresses the identical
    semantic as size(array_distinct(collect_list(x) OVER frame)) —
    order-insensitive, so the frame's internal order doesn't matter,
    only its membership, which the total (date, orderkey) order pins.

    Scale: one shuffle on custkey, sort within partition; the collected
    array is bounded by the FRAME (4 rows), not the partition, so state
    per row is O(frame) — this is the pattern for any rolling distinct
    at 100 TB (for wide frames it degrades gracefully to a sketch:
    swap array_distinct for an HLL merge)."""
    od = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 0)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.size(
            F.array_distinct(F.collect_list("o_orderpriority").over(w))
        ).cast("bigint").alias("distinct_prios"),
    )


@register(
    "win_pareto_concentration",
    oracle="""
WITH r AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY o_custkey),
c AS (
  SELECT o_custkey, rev_cents,
         CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey ASC
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(rev_cents) OVER () AS BIGINT) AS total
  FROM r)
SELECT (cum * 10 + total - 1) // total AS decile,
       COUNT(*) AS n_customers,
       CAST(SUM(rev_cents) AS BIGINT) AS decile_rev_cents
FROM c
GROUP BY decile
""",
    category="E",
)
def win_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE CONCENTRATION (Pareto/80-20 curve) — customers sorted by
    lifetime revenue descending, bucketed by which tenth of TOTAL
    revenue their cumulative sum completes: decile 1 holds the whales
    that produce the first 10% of revenue, decile 10 the long tail.
    The oracle is the classic unpartitioned running-sum window; the
    engine refuses that (one WindowExec task at 100 TB) and uses the
    two-pass distributed prefix sum (global_running_sum), with revenue
    held in exact integer cents end-to-end: the cumulative sums, the
    total, and the decile assignment ((cum·10 + total−1) div total —
    integer ceil-division, no float division whose rounding could flip
    a boundary row) are all bigint-exact, so both engines bucket every
    customer identically.

    Scale: one custkey agg (partial map-side), one range shuffle of the
    customer-level rollup (numbers, not facts), metadata-sized offsets;
    the grand total rides a broadcast-scalar cross join."""
    od = table(spark, sf_dir, "orders")
    from gdxpy_spark.operators._util import global_running_sum

    r = od.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "rev_cents"
        )
    )
    c = global_running_sum(
        r,
        [("rev_cents", "desc"), "o_custkey"],
        "rev_cents",
        out_col="cum",
    )
    tot = r.agg(F.sum("rev_cents").alias("total"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.expr("(cum * 10 + total - 1) div total").alias("decile"),
            "rev_cents",
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("rev_cents").alias("decile_rev_cents"),
        )
    )


@register(
    "win_median_rolling",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(median(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) + 0.0
         AS median_price_5
FROM orders
""",
    category="E",
)
def win_median_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING MEDIAN — the robust-baseline smoother (spike-resistant
    trendlines, anomaly baselines) over each customer's last 5 orders.
    Spark has NO median window function (DuckDB does — the oracle uses
    it natively); the engine sorts the bounded frame explicitly:
    array_sort(collect_list OVER frame), then the textbook lower/upper-
    middle interpolation (element_at is 1-based; for odd frames both
    middles coincide) — the same (a+b)/2 DuckDB computes. The output is
    rounded to 4 decimals: the true median of 2-decimal prices has ≤3
    decimals, so it sits ON the rounding grid and a last-ulp float
    divergence between the two engines' interpolation cannot move the
    rounded value.

    Scale: O(frame log frame) per row on a 5-row frame — constant work;
    state bounded by the frame, not the partition. Wide-frame medians
    go to percentile_approx sketches instead (agg_approx_percentile is
    that path's batch twin)."""
    od = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    arr = F.array_sort(F.collect_list("o_totalprice").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return od.select(
        "o_custkey",
        "o_orderkey",
        (F.round((lo + hi) / 2, 4) + 0.0).alias("median_price_5"),
    )


_RATIO_ORACLE = """
WITH c AS (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders)
SELECT o_custkey, o_orderkey,
       ROUND(CAST(cents AS DOUBLE)
             / SUM(cents) OVER (PARTITION BY o_custkey), 6) + 0.0 AS ratio
FROM c
"""


@register("win_ratio_to_report", oracle=_RATIO_ORACLE, category="E")
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT — each order's share of its customer's total
    spend (the contribution/mix-shift window every BI layer exposes;
    neither engine ships the Oracle-SQL builtin, both state it as
    value / SUM(value) OVER (PARTITION BY ...)). Money is 100-scaled
    BIGINT cents before the window so the denominator is an exact
    integer in both engines; the share is one double division on
    identical integers, rounded with the zero-sign normalized.

    Scale: a frame-less partitioned aggregate window — Spark evaluates
    it as one hash exchange on the partition key + a single-pass
    aggregate-then-broadcast within each partition; no global window,
    no ORDER BY, so no sort at all."""
    od = table(spark, sf_dir, "orders")
    c = od.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = W.partitionBy("o_custkey")
    return c.select(
        "o_custkey",
        "o_orderkey",
        (
            F.round(F.col("cents").cast("double") / F.sum("cents").over(w), 6)
            + F.lit(0.0)
        ).alias("ratio"),
    )
