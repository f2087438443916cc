"""SURVEY §2.2 category H — time-window operators over `events`.

The three oracle-checkable entries here are the *batch analogs* of the
streaming aggregations (identical F.window/session_window expressions run
over the same data — Structured Streaming's unified model guarantees the
batch and micro-batch results agree for complete inputs). The genuinely
stateful/replay operators (watermark-late-drop, stream dedup, stateful
running counts) live in gdxpy_spark.streaming.replay and are weak-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from gdxpy_spark.operators._util import davg, dsum, sql_davg, sql_dsum
from gdxpy_spark.registry import register
from gdxpy_spark.tables import table

_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "stream_tumbling",
    oracle=f"""
SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value', 'sum_value')}
FROM events
GROUP BY 1, 2
""",
    category="H",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows × event_type: count + sum(value).
    In streaming this is exactly `withWatermark + groupBy(window(...))`;
    windows are epoch-aligned on both engines."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "win_sessionize",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, event_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events,
       {sql_dsum('value', 'sum_value')}
FROM sessions
GROUP BY user_id, session_no
""",
    category="H",
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user sessions split at >30-minute gaps
    (lag → new-session flag → running sum = session number → per-session
    aggregate). The lag/cumsum windows PARTITION BY user_id — one
    shuffle + in-partition sort, the canonical scalable sessionization
    (the streaming twin is session_window/stream_session; this is the
    backfill path over historical data). Tiebreak on (ts, event_id)
    keeps the session numbering deterministic across engines."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ → epoch MICROseconds via an intermediate TIMESTAMP cast
    # (identity under the UTC-pinned session; NTZ has no direct long
    # cast). Comparing whole seconds would truncate sub-second parts and
    # disagree with the oracle's exact INTERVAL comparison on gaps
    # inside (1800 s, 1801 s).
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lag_us = F.unix_micros(F.lag("ts").over(wo).cast("timestamp"))
    new_sess = F.when(
        F.lag("ts").over(wo).isNull() | (us - lag_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = ev.withColumn("new_sess", new_sess).withColumn(
        "session_no",
        F.sum("new_sess").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.date_format(F.min("ts"), _FMT).alias("session_start"),
        F.date_format(F.max("ts"), _FMT).alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value", "sum_value"),
    )


@register(
    "stream_sliding",
    oracle=f"""
WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
assigned AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type, value FROM ev
  UNION ALL
  SELECT time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '1970-01-01 00:30:00') AS ws,
         event_type, value
  FROM ev
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value', 'sum_value')}
FROM assigned
GROUP BY 1, 2
""",
    category="H",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes — every event lands in
    exactly two windows (starts at :00 and :30). The oracle reproduces
    the window-assignment expansion with two time_buckets + UNION ALL."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_session",
    oracle="""
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts >= LAG(ts) OVER w + INTERVAL 15 MINUTE
                OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 15 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
    category="H",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 15-minute inactivity gap (Spark
    session_window; end = last event + gap). The oracle is the classic
    gaps-and-islands rewrite (lag + cumulative sum). A boundary event at
    exactly prev+15min starts a new session on both sides."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            F.date_format("w.end", _FMT).alias("session_end"),
            "n_events",
        )
    )


_FUNNEL_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
v AS (
  SELECT user_id, MIN(ts) AS t_view FROM ev
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM ev e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_buy
  FROM ev e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id)
SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT 'view>click', CAST(COUNT(*) AS BIGINT) FROM c
UNION ALL
SELECT 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM p
"""


@register("win_funnel_stages", oracle=_FUNNEL_ORACLE, category="H")
def win_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED event funnel — the product-analytics staple: how many
    users viewed, then clicked strictly AFTER their first view, then
    purchased strictly after that first qualifying click. Order matters
    (a purchase before the first view does not count), which is what
    separates a funnel from three independent counts.

    Plan: three stage aggregates, every one keyed on user_id — the
    first-view frame joins back to the event stream to gate the click
    stage, that result gates the purchase stage. All shuffles share the
    user_id key, so at 100 TB this is one partitioning reused across
    the chain (AQE reuses the exchange), each stage's frame shrinking
    monotonically — never a self-cross-join over event pairs, which is
    the naive funnel formulation that dies at scale."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )

    def cnt(df, stage):
        return df.agg(F.count("*").cast("bigint").alias("n_users")).select(
            F.lit(stage).alias("stage"), "n_users"
        )

    return (
        cnt(v, "view")
        .unionByName(cnt(c, "view>click"))
        .unionByName(cnt(p, "view>click>purchase"))
    )


_RETENTION_ORACLE = """
WITH ev AS (
  SELECT user_id,
         CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '2024-01-01')
              AS BIGINT) // 7 AS week
  FROM events),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id)
SELECT cohort_week,
       week - cohort_week AS week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM ev JOIN cohort USING (user_id)
GROUP BY cohort_week, week - cohort_week
"""


@register("agg_cohort_retention", oracle=_RETENTION_ORACLE, category="H")
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT RETENTION triangle — the other product-analytics staple:
    users grouped by their first-activity week (the cohort), counted
    distinct in every later week as an offset from that cohort week.
    Weeks are integer days-since-epoch-anchor // 7 (UTC-pinned session,
    so Spark's date cast and DuckDB's agree exactly).

    Plan: one user-keyed aggregate for the cohort assignment, joined
    back to the (user, week) activity stream, then a distinct-count per
    (cohort, offset) cell — the join and both aggregates key on
    user_id-prefixed groups, and the output is a triangle of
    O(weeks²) rows regardless of corpus size: the classic
    shrink-early-aggregate-late shape."""
    anchor = F.lit("2024-01-01").cast("date")
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), anchor) / 7
        ).alias("week"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(cohort, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


_GAPFILL_ORACLE = f"""
WITH ev AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, value
  FROM events),
hourly AS (
  SELECT user_id, hour, COUNT(*) AS n, {sql_davg('value', 'avg_v')}
  FROM ev GROUP BY user_id, hour),
bounds AS (SELECT user_id, MIN(hour) AS mn, MAX(hour) AS mx
           FROM ev GROUP BY user_id),
spine AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
  FROM bounds)
SELECT s.user_id, strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
       last_value(h.avg_v IGNORE NULLS)
         OVER (PARTITION BY s.user_id ORDER BY s.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS value_ffill
FROM spine s
LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
"""


@register("ts_gap_fill", oracle=_GAPFILL_ORACLE, category="H")
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series RESAMPLE + GAP FILL: each user's event stream becomes
    a dense hourly series between their first and last activity — empty
    hours materialized with n_events = 0 and the hourly mean
    forward-filled from the last observed hour (leading gaps stay NULL).
    The regularization step every downstream time-series consumer
    (forecasting, anomaly detection, hypertable-style rollups) assumes
    has already happened.

    Plan: per-user bounds are one aggregate; the spine is a map-side
    `sequence(min_hour, max_hour, 1 hour)` explode off that frame — the
    fan-out is bounded by the TIME RANGE, not the event volume, so a
    100 TB corpus with a fixed horizon generates the same spine rows per
    user. Spine ⋈ hourly is user+hour keyed; the forward fill is ONE
    window pass partitioned by user (never a global window). The hourly
    mean is rounded (DECIMAL-routed) BEFORE the fill so both engines
    forward-propagate identical values."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", "ts").alias("hour"), "value"
    )
    hourly = ev.groupBy("user_id", "hour").agg(
        F.count("*").alias("n"), davg("value", "avg_v")
    )
    spine = (
        ev.groupBy("user_id")
        .agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.last("avg_v", ignorenulls=True).over(w).alias("value_ffill"),
        )
    )


_LERP_ORACLE = f"""
WITH ev AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, value
  FROM events),
hourly AS (
  SELECT user_id, hour, COUNT(*) AS n, {sql_davg('value', 'avg_v')}
  FROM ev GROUP BY user_id, hour),
bounds AS (SELECT user_id, MIN(hour) AS mn, MAX(hour) AS mx
           FROM ev GROUP BY user_id),
spine AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
  FROM bounds),
j AS (
  SELECT s.user_id, s.hour,
         date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', s.hour) AS hx,
         h.n,
         CAST(ROUND(h.avg_v * 10000) AS BIGINT) AS v4
  FROM spine s
  LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour),
w AS (
  SELECT user_id, hour, hx, n,
         last_value(v4 IGNORE NULLS) OVER back AS pv,
         last_value(CASE WHEN v4 IS NOT NULL THEN hx END IGNORE NULLS)
           OVER back AS ph,
         first_value(v4 IGNORE NULLS) OVER fwd AS nv,
         first_value(CASE WHEN v4 IS NOT NULL THEN hx END IGNORE NULLS)
           OVER fwd AS nh
  FROM j
  WINDOW back AS (PARTITION BY user_id ORDER BY hx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fwd AS (PARTITION BY user_id ORDER BY hx
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
       CASE WHEN pv IS NULL OR nv IS NULL THEN NULL
            WHEN nh = ph THEN CAST(pv AS DOUBLE) / 10000.0
            ELSE CAST(pv * (nh - hx) + nv * (hx - ph) AS DOUBLE)
                 / CAST((nh - ph) * 10000 AS DOUBLE) END AS value_lerp
FROM w
"""


@register("ts_interpolate", oracle=_LERP_ORACLE, category="H")
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series LINEAR INTERPOLATION over the dense hourly spine
    (the sibling of ts_gap_fill's forward fill): interior gaps get the
    straight line between the surrounding observed hours, observed
    hours keep their value (the same formula with k=0), and leading/
    trailing gaps stay NULL — there is nothing to interpolate toward.
    This is the resampling contract numeric consumers (forecasting,
    feature windows) usually want instead of a step function.

    Cross-engine exactness is engineered, not hoped for: the hourly
    mean is DECIMAL-rounded (davg), scaled to an INTEGER v4 = 1e4·avg,
    and the lerp numerator pv·(nh−hx) + nv·(hx−ph) is computed in
    BIGINT — exact on both engines — with ONE double division at the
    end (IEEE-correctly-rounded, hence bit-identical). Hour indices
    are timestampdiff from a fixed anchor, not unix epoch, so session
    timezone can't skew either side.

    Plan: bounds agg → sequence-explode spine (fan-out bounded by TIME
    RANGE, not event volume) → user+hour join → TWO window passes,
    both partitioned by user — never a global window; a petabyte of
    users scales horizontally, and each user's chain is O(their
    hours). The forward neighbor is NOT an UNBOUNDED FOLLOWING frame:
    Spark's UnboundedFollowing window frame re-scans the remainder of
    the partition for every row — O(rows²) per partition, measured
    11.4 s vs 1.2 s for the backward pass on the same 105k-row spine —
    so it is expressed as the equivalent RUNNING frame over DESC hour
    order (first-non-null-ahead ≡ last-non-null-behind, reversed),
    which streams in O(rows) like the backward pass."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", "ts").alias("hour"), "value"
    )
    hourly = ev.groupBy("user_id", "hour").agg(
        F.count("*").alias("n"), davg("value", "avg_v")
    )
    spine = (
        ev.groupBy("user_id")
        .agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    j = spine.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP'2024-01-01 00:00:00', hour)"
        ).alias("hx"),
        "n",
        F.round(F.col("avg_v") * 10000).cast("bigint").alias("v4"),
    )
    back = (
        W.partitionBy("user_id")
        .orderBy("hx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy(F.desc("hx"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    obs_hx = F.when(F.col("v4").isNotNull(), F.col("hx"))
    withpn = j.select(
        "user_id", "hour", "hx", "n",
        F.last("v4", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_hx, ignorenulls=True).over(back).alias("ph"),
        F.last("v4", ignorenulls=True).over(fwd).alias("nv"),
        F.last(obs_hx, ignorenulls=True).over(fwd).alias("nh"),
    )
    lerp = (
        F.when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .when(
            F.col("nh") == F.col("ph"),
            F.col("pv").cast("double") / 10000.0,
        )
        .otherwise(
            (
                F.col("pv") * (F.col("nh") - F.col("hx"))
                + F.col("nv") * (F.col("hx") - F.col("ph"))
            ).cast("double")
            / ((F.col("nh") - F.col("ph")) * 10000).cast("double")
        )
    )
    return withpn.select(
        "user_id",
        F.date_format("hour", _FMT).alias("hour"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        lerp.alias("value_lerp"),
    )


_ZSCORE_ORACLE = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         CAST(ROUND(value * 100) AS BIGINT) AS v100
  FROM events),
hourly AS (
  SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n_ev,
         SUM(v100) AS m
  FROM ev GROUP BY event_type, hour),
w AS (
  SELECT event_type, hour, n_ev, m,
         COUNT(*) OVER t24 AS cnt,
         SUM(m) OVER t24 AS s,
         SUM(m * m) OVER t24 AS q
  FROM hourly
  WINDOW t24 AS (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, n_ev,
       CAST(m AS DOUBLE) / 100.0 AS hourly_value,
       CASE WHEN cnt >= 12 AND cnt * q - s * s > 0 THEN
         CAST(cnt * m - s AS DOUBLE)
         / sqrt(CAST(cnt * q - s * s AS DOUBLE) * cnt / (cnt - 1.0)) + 0.0
       END AS z,
       CASE WHEN cnt >= 12 AND cnt * q - s * s > 0 THEN
         abs(CAST(cnt * m - s AS DOUBLE)
             / sqrt(CAST(cnt * q - s * s AS DOUBLE) * cnt / (cnt - 1.0)))
         > 2.5
       END AS is_spike
FROM w
"""


@register("ts_zscore_anomaly", oracle=_ZSCORE_ORACLE, category="H")
def ts_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING Z-SCORE anomaly flags — the streaming-monitor primitive:
    per event_type, each hour's total value is scored against the
    trailing 24 h window (z = (x − μ)/σ, sample σ), |z| > 2.5 flags a
    spike; hours with under 12 h of history (or zero variance) emit
    NULL rather than a meaningless score.

    Exactness: σ over a window is normally a float-accumulation
    minefield (Welford vs two-pass accumulate differently per engine),
    so the window aggregates here are INTEGER sums of the 100-scaled
    value — cnt, S = Σm, Q = Σm² are exact BIGINTs on both engines —
    and z is assembled from them in one fixed double-expression shape:
    z = (cnt·x − S) / √((cnt·Q − S²)·cnt/(cnt−1)). Same integers in,
    same IEEE ops in the same order, identical bits out; the hash
    oracle holds with no rounding slop. (Q fits easily: v100 ≤ ~10⁶ ⇒
    Q ≤ 24·10¹² per window.)

    Plan: one partial-aggregable hash agg to hourly granularity (the
    raw event stream reduces map-side; at 100 TB the windowed stage
    sees only O(types × hours) rows), then one 24-row sliding window
    partitioned by event_type — bounded state, no global window, the
    same shape a Structured Streaming job would run with a 24 h
    sliding aggregate."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
        F.round(F.col("value") * 100).cast("bigint").alias("v100"),
    )
    hourly = ev.groupBy("event_type", "hour").agg(
        F.count("*").cast("bigint").alias("n_ev"),
        F.sum("v100").alias("m"),
    )
    t24 = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-23, W.currentRow)
    )
    w = hourly.select(
        "event_type", "hour", "n_ev", "m",
        F.count("*").over(t24).alias("cnt"),
        F.sum("m").over(t24).alias("s"),
        F.sum(F.col("m") * F.col("m")).over(t24).alias("q"),
    )
    ok = (F.col("cnt") >= 12) & (
        F.col("cnt") * F.col("q") - F.col("s") * F.col("s") > 0
    )
    zraw = (F.col("cnt") * F.col("m") - F.col("s")).cast("double") / F.sqrt(
        (F.col("cnt") * F.col("q") - F.col("s") * F.col("s")).cast("double")
        * F.col("cnt")
        / (F.col("cnt") - 1.0)
    )
    return w.select(
        "event_type",
        F.date_format("hour", _FMT).alias("hour"),
        "n_ev",
        (F.col("m").cast("double") / 100.0).alias("hourly_value"),
        F.when(ok, zraw + 0.0).alias("z"),
        F.when(ok, F.abs(zraw) > 2.5).alias("is_spike"),
    )


_OHLC_ORACLE = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         value, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, hour
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, hour
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM ev)
SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM r
GROUP BY event_type, hour
"""


@register("ts_ohlc_hourly", oracle=_OHLC_ORACLE, category="H")
def ts_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC DOWNSAMPLE (the financial-tick resample): per (event_type,
    hour) bucket, the first value (open), max (high), min (low), and
    last value (close), tiebroken on (ts, event_id) so same-microsecond
    events pick deterministically on every engine.

    Physical shape is the point: open/close come from min_by/max_by
    over a STRUCT ordering key inside ONE partial-aggregable
    hash aggregate — not the textbook two-ROW_NUMBER window rewrite the
    oracle uses, which shuffles and sorts every raw tick twice. The agg
    form carries (hour, type) group state map-side, so a 100 TB tick
    stream reduces before the shuffle; values are selections (no
    arithmetic), hence hash-exact with no rounding discipline needed."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
        "value", "ts", "event_id",
    )
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("event_type", "hour")
        .agg(
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(
            "event_type",
            F.date_format("hour", _FMT).alias("hour"),
            "open", "high", "low", "close", "n_events",
        )
    )


_LOCF_ORACLE = """
WITH s AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN event_id % 7 = 0 THEN NULL
              ELSE CAST(ROUND(value * 10) AS BIGINT) END AS x
  FROM events)
SELECT event_id, user_id, x AS raw_x,
       last_value(x IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_x
FROM s
"""


@register("ts_fill_forward", oracle=_LOCF_ORACLE, category="H")
def ts_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD FILL (LOCF — last observation carried forward): the
    sensor-dropout repair every telemetry/feature pipeline runs before
    ts_interpolate's fancier lerp is even an option (LOCF is causal —
    it never reads the future, so it is the only fill valid for
    features feeding online models). A deterministic mask (event_id %
    7) plants the NULLs; the fill is last_value IGNORE NULLS over the
    per-user RUNNING frame — Spark spells it F.last(ignorenulls=True),
    DuckDB `IGNORE NULLS`, same semantics. Values are 0.1-quantized to
    exact bigints (the declared contract of the ts_* family) so carried
    values hash bitwise. Leading NULLs (no prior observation) stay
    NULL on both engines — that's the honest LOCF edge, not a bug.

    Scale: one shuffle on user_id, running frame is O(1) state per row;
    this is the window shape that degrades gracefully to
    applyInPandasWithState when the fill must run on a live stream
    (stream_stateful_running is that machinery)."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.round(F.col("value") * 10).cast("bigint")
        ).alias("x"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return s.select(
        "event_id",
        "user_id",
        F.col("x").alias("raw_x"),
        F.last("x", ignorenulls=True).over(w).alias("filled_x"),
    )


_TRAIL_ORACLE = """
WITH s AS (
  SELECT event_id, user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s,
         CAST(ROUND(value * 10) AS BIGINT) AS x
  FROM events)
SELECT event_id, user_id,
       CAST(SUM(x) OVER (
         PARTITION BY user_id ORDER BY epoch_s
         RANGE BETWEEN 172800 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS trail_2d_sum,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY epoch_s
         RANGE BETWEEN 172800 PRECEDING AND CURRENT ROW) AS trail_2d_n
FROM s
"""


@register("win_time_range_frame", oracle=_TRAIL_ORACLE, category="E")
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAILING EVENT-TIME WINDOW — per-user rolling 48-hour sum/count
    (rate limiting, rolling spend caps, trailing engagement scores):
    a RANGE frame over TIME, the sibling win_range_frame's value-range
    frame doesn't cover. Both engines order by integer epoch SECONDS
    and bound the frame numerically (172800 s) — expressing the
    interval bound as a number sidesteps the one real divergence
    (DuckDB's INTERVAL arithmetic runs at full timestamp precision,
    Spark's rangeBetween needs a numeric sort key anyway). RANGE (not
    ROWS) means ties on the boundary second are all-in or all-out
    identically on both engines, and the frame is defined by TIME, so
    bursty users get wide frames and idle users narrow ones. The
    summed value is 0.1-quantized bigint — exact under any
    accumulation order.

    Scale: one user_id shuffle; Spark evaluates the running range
    frame with a sliding two-pointer over the sorted partition — O(1)
    amortized per row, no per-row rescan."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").alias(
            "epoch_s"
        ),
        F.round(F.col("value") * 10).cast("bigint").alias("x"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-172800, 0)
    )
    return s.select(
        "event_id",
        "user_id",
        F.sum("x").over(w).alias("trail_2d_sum"),
        F.count("*").over(w).alias("trail_2d_n"),
    )


_SEASONAL_ORACLE = """
WITH s AS (
  SELECT event_id, event_type,
         CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hod,
         CAST(ROUND(value * 10) AS BIGINT) AS x
  FROM events),
p AS (
  SELECT event_type, hod, COUNT(*) AS n, SUM(x) AS sx
  FROM s GROUP BY event_type, hod)
SELECT s.event_id, s.event_type, s.hod,
       CAST(ROUND(CAST(CAST(p.sx AS DOUBLE) / p.n / 10
                       AS DECIMAL(18,6)), 4) AS DOUBLE) + 0.0 AS hod_mean,
       CAST(ROUND(CAST(CAST(s.x AS DOUBLE) / 10
                       - CAST(p.sx AS DOUBLE) / p.n / 10
                       AS DECIMAL(18,6)), 4) AS DOUBLE) + 0.0 AS residual
FROM s JOIN p ON s.event_type = p.event_type AND s.hod = p.hod
"""


@register("ts_seasonal_profile", oracle=_SEASONAL_ORACLE, category="H")
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL PROFILE + RESIDUAL — the hour-of-day mean per event
    type, and each event's deviation from its slot's mean: the
    detrending step every drift monitor and anomaly detector runs
    BEFORE thresholding (ts_zscore_anomaly on raw values alarms on
    rush hour; on these residuals it alarms on genuinely unusual
    values). Two-pass shape: a (type, hod)-keyed profile aggregate
    over exact quantized-bigint sums — at most types×24 rows, a pure
    broadcast — joined back onto the events scan; mean and residual
    are fixed double expressions in identical association order on
    both engines, so every residual hashes bitwise.

    Scale: the profile is metadata-sized regardless of corpus size
    (the groupBy partial-aggregates map-side down to types×24), the
    join-back broadcasts it — the fact table never shuffles. The same
    two-pass profile-then-broadcast shape carries any low-cardinality
    seasonal key (day-of-week, month) at 100 TB."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.round(F.col("value") * 10).cast("bigint").alias("x"),
    )
    p = s.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx")
    )
    # raw-double ROUND(.,4) is engine-divergent exactly here: when n
    # divides a power of 10 the true mean/residual TERMINATE at ≤6
    # decimals, so the 4-decimal rounding sits on a half-way tie —
    # route through DECIMAL(18,6) first (the money4 discipline): the
    # conversion recovers the terminating value exactly and the
    # decimal ROUND is identical on both engines
    mean = F.col("sx").cast("double") / F.col("n") / 10
    d6 = "decimal(18,6)"
    return (
        s.join(F.broadcast(p), ["event_type", "hod"])
        .select(
            "event_id",
            "event_type",
            "hod",
            (
                F.round(mean.cast(d6), 4).cast("double") + 0.0
            ).alias("hod_mean"),
            (
                F.round(
                    (F.col("x").cast("double") / 10 - mean).cast(d6), 4
                ).cast("double")
                + 0.0
            ).alias("residual"),
        )
    )


_CALENDAR_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS lo,
         CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) AS hi
  FROM events),
cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds),
e AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_id, user_id
  FROM events)
SELECT cal.day,
       isodow(cal.day) <= 5 AS is_business,
       CAST(COUNT(e.event_id) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM cal LEFT JOIN e ON e.day = cal.day
GROUP BY cal.day
"""


@register("ts_calendar_join", oracle=_CALENDAR_ORACLE, category="F")
def ts_calendar_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension join — the reporting primitive a bare GROUP BY
    date gets wrong: days with ZERO events must still appear (a gap in
    the fact table is a business fact, not a missing row), and each day
    carries derived calendar attributes (ISO weekday → business-day
    flag). The dim is GENERATED in-plan from the fact's own bounds
    (sequence + explode of a 2-row aggregate) — no calendar file to
    version, and the generation is metadata-sized however large the
    fact side grows.

    Scale: the calendar side is tiny by construction (days, not rows)
    → Spark broadcasts it; the fact side aggregates per day FIRST
    (partial-agg shuffle on date), so the join moves one row per day,
    not one per event. distinct-user counts ride the same shuffle."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    per_day = (
        ev.select(F.to_date("ts").alias("day"), "event_id", "user_id")
        .groupBy("day")
        .agg(
            F.count("event_id").alias("_ne"),
            F.countDistinct("user_id").alias("_nu"),
        )
    )
    # ISO weekday from Spark's 1=Sunday dayofweek: ((dow + 5) % 7) + 1
    return (
        cal.join(per_day, "day", "left")
        .select(
            "day",
            (((F.dayofweek("day") + 5) % 7 + 1) <= 5).alias("is_business"),
            F.coalesce(F.col("_ne"), F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(F.col("_nu"), F.lit(0)).cast("bigint").alias("n_users"),
        )
    )


_TIME_BUCKET_ORACLE = """
SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) AS bucket_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) + 0.0 AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("ts_time_bucket", oracle=_TIME_BUCKET_ORACLE, category="F")
def ts_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width time bucketing — the batch twin of the streaming
    tumbling window, via Spark's native `window()` expression (the same
    bucketing primitive the streaming engine uses, here with no
    watermark machinery because the input is bounded). DuckDB states
    the identical semantics as `time_bucket`. Money-exact sums via the
    DECIMAL quantization discipline; `+ 0.0` normalizes the zero sign
    on both engines.

    Scale: bucket assignment is a map-side expression (epoch div
    width); the aggregate is one partial-agg shuffle on (bucket, type).
    Unlike a calendar join, no dimension is materialized — buckets
    exist only where events do (pair with ts_gap_fill when empty
    buckets must appear)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "15 minutes").start.alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            (dsum("value", "_s") + F.lit(0.0)).alias("sum_value"),
        )
    )


_EWMA_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CAST(value AS DOUBLE) AS x
  FROM events),
seq AS (
  SELECT user_id,
         list(x ORDER BY ts, event_id) AS xs
  FROM ev GROUP BY user_id)
SELECT user_id,
       CAST(len(xs) AS BIGINT) AS n_events,
       ROUND(list_reduce(xs, (acc, x) -> 0.25 * x + 0.75 * acc), 6) + 0.0
         AS ewma
FROM seq
"""


@register("ts_ewma", oracle=_EWMA_ORACLE, category="I")
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIALLY WEIGHTED MOVING AVERAGE per key — the recursive
    smoother (y_t = α·x_t + (1-α)·y_{t-1}) behind anomaly baselines and
    online feature decay. SQL window frames cannot express the
    recursion (every prefix would need its own geometric re-weighting),
    so the engine folds each key's time-ordered value sequence with a
    JVM higher-order `aggregate` over `sort_array(collect_list(...))` —
    one shuffle on user_id, no UDF, no driver state. α = 0.25 and
    1-α = 0.75 are EXACT binary fractions and both engines fold in the
    identical (ts, event_id) order, so every intermediate double is
    bit-identical — the fold is deterministic without float tolerance
    (the closed-form Σ α(1-α)^k rewrite was rejected: powers overflow/
    underflow at long horizons and reorder the arithmetic).

    Scale: state per key is one double; the collected sequence is one
    user's history (the same per-key-bounded assumption every
    session-window operator makes — a key whose history outgrows a task
    would move to the incremental streaming form, which is this exact
    fold applied per micro-batch with the carry in the state store).
    The struct sort is in-array (no secondary shuffle), and the fold is
    whole-stage-codegen'd."""
    ev = table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", F.col("value").alias("x")))
        ).alias("s")
    )
    # project the value array ONCE: Catalyst does not CSE higher-order
    # expressions, so referencing transform(s, e->e.x) in both the slice
    # and the init would evaluate it twice per row
    xs = seq.select(
        "user_id", F.transform("s", lambda e: e.x).alias("xs")
    )
    return xs.select(
        "user_id",
        F.size("xs").cast("bigint").alias("n_events"),
        (
            F.round(
                F.aggregate(
                    F.slice("xs", 2, F.size("xs") - 1),
                    F.element_at("xs", 1).cast("double"),
                    lambda acc, x: F.lit(0.25) * x + F.lit(0.75) * acc,
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("ewma"),
    )


_AUTOCORR_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(ROUND(value * 10) AS BIGINT) AS x
  FROM events),
lagged AS (
  SELECT user_id, event_id, ts, x,
         LAG(x) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
  FROM ev),
pairs AS (SELECT * FROM lagged WHERE y IS NOT NULL),
m AS (
  SELECT user_id, event_id,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
         CAST(SUM(y * y) OVER w AS BIGINT) AS syy
  FROM pairs
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT user_id, event_id, n,
       CASE WHEN n >= 3 AND (n * sxx - sx * sx) > 0
                 AND (n * syy - sy * sy) > 0
            THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 4) + 0.0
            END AS autocorr
FROM m
"""


@register("ts_autocorr", oracle=_AUTOCORR_ORACLE, category="I")
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING LAG-1 AUTOCORRELATION per key — the regime-change
    detector (a metric that suddenly starts predicting itself signals
    stuck sensors, retry storms, bot traffic): Pearson r between each
    user's value series and its one-step lag over a trailing 20-pair
    window. The ts_zscore_anomaly exactness recipe extended to a
    BIVARIATE statistic: values are quantized once to BIGINT tenths,
    all six window moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact
    integer ROWS-frame sums, and r is ONE fixed double expression at
    the end (NULL below 3 pairs or under zero variance — no 0/0).

    Scale: one shuffle partitioning by user_id covers the lag AND the
    rolling window (same partition order reused); frames are ROWS-
    bounded so each task holds one key's rows with O(1) running state
    per moment. Nothing global, nothing single-partition — the exact
    shape that survives a billion keys."""
    ev = table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 10).cast("bigint")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "event_id", "ts", x.alias("x")
    ).withColumn("y", F.lag("x").over(wo))
    pairs = lagged.filter(F.col("y").isNotNull())
    wf = wo.rowsBetween(-19, W.currentRow)
    m = pairs.select(
        "user_id", "event_id",
        F.count("*").over(wf).cast("bigint").alias("n"),
        F.sum("x").over(wf).cast("bigint").alias("sx"),
        F.sum("y").over(wf).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wf).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wf).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(wf).cast("bigint").alias("syy"),
    )
    nvar_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    nvar_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return m.select(
        "user_id", "event_id", "n",
        F.when(
            (F.col("n") >= 3) & (nvar_x > 0) & (nvar_y > 0),
            F.round(
                num / F.sqrt(nvar_x.cast("double") * nvar_y.cast("double")), 4
            )
            + F.lit(0.0),
        ).alias("autocorr"),
    )


_VWAP_ORACLE = """
WITH ev AS (
  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hr,
         event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS price_cents,
         event_id % 10 + 1 AS vol
  FROM events)
SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       CAST(SUM(vol) AS BIGINT) AS total_vol,
       CAST((200 * SUM(price_cents * vol) + SUM(vol))
            // (2 * SUM(vol)) AS BIGINT) / 10000.0 AS vwap
FROM ev
GROUP BY hr, event_type
"""


@register("ts_vwap_hourly", oracle=_VWAP_ORACLE, category="I")
def ts_vwap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOURLY VWAP per instrument (event_type as the symbol, value as
    price, a deterministic synthetic lot size as volume) — the
    volume-weighted average price every market-data pipeline
    materializes next to OHLC (ts_ohlc_hourly). Exactness recipe:
    price quantized ONCE to integer cents, the volume-weighted sum
    Σ(price·vol) and Σvol as exact integer partial aggregates, and the
    4-decimal rounding done in INTEGER arithmetic — half-up as
    (200·Σpv + Σv) div (2·Σv), positive inputs — because the ratio is
    a terminating decimal that can land exactly ON a double ROUND(.,4)
    tie, where the engines' last-ulp renderings disagree (caught live:
    48.31625 → 48.3163 vs 48.3162). The only float op left is one
    division by 10⁴ of the same integer on both sides.

    Scale: bucket assignment is map-side; one partial-agg shuffle on
    (hour, symbol) — the same shape as ts_time_bucket, with the
    weighted numerator riding the same combine."""
    ev = table(spark, sf_dir, "events")
    price = F.round(F.col("value") * 100).cast("bigint")
    vol = (F.col("event_id") % 10 + 1).cast("bigint")
    return (
        ev.select(
            F.window("ts", "1 hour").start.alias("hr"),
            "event_type",
            price.alias("price_cents"),
            vol.alias("vol"),
        )
        .groupBy("hr", "event_type")
        .agg(
            F.sum("vol").cast("bigint").alias("total_vol"),
            (
                F.expr(
                    "(200 * sum(price_cents * vol) + sum(vol))"
                    " div (2 * sum(vol))"
                ).cast("bigint")
                / F.lit(10000.0)
            ).alias("vwap"),
        )
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type", "total_vol", "vwap",
        )
    )


_HOLT_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CAST(value AS DOUBLE) AS x
  FROM events),
seq AS (
  SELECT user_id,
         list([x, 0.0::DOUBLE] ORDER BY ts, event_id) AS xs
  FROM ev GROUP BY user_id),
folded AS (
  SELECT user_id, CAST(len(xs) AS BIGINT) AS n_events,
         -- acc is a 2-array [level, trend]: DuckDB's list_reduce
         -- mutates a STRUCT accumulator field-by-field (the trend
         -- expression would see the already-updated level — verified
         -- empirically), while array construction evaluates both
         -- elements against the OLD accumulator
         list_reduce(xs, (acc, e) ->
           [0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
            0.25 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
              + 0.75 * acc[2]]) AS st
  FROM seq)
SELECT user_id, n_events,
       ROUND(st[1], 6) + 0.0 AS level,
       ROUND(st[2], 6) + 0.0 AS trend,
       ROUND(st[1] + st[2], 6) + 0.0 AS forecast_1
FROM folded
"""


@register("ts_holt_winters", oracle=_HOLT_ORACLE, category="I")
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT double exponential smoothing per key (level + trend — the
    next rung above ts_ewma's single smoother; the trend term is what
    turns a decay baseline into a one-step FORECAST): level_t =
    α·x_t + (1-α)(level+trend), trend_t = β(level_t−level) + (1-β)trend,
    α=0.5, β=0.25 — both exact binary fractions, folded in (ts,
    event_id) order, so every intermediate double is bit-identical to
    the oracle's identical-shape DuckDB list_reduce (the ts_ewma
    recipe, extended from a scalar accumulator to 2-value state;
    DuckDB 1.0's list_reduce has no init argument, so elements are
    pre-lifted to [x, 0] pairs and the first element IS the init —
    trend starts at 0 by declared contract. The oracle's accumulator
    is an ARRAY, not a struct: DuckDB mutates a struct accumulator
    field-by-field mid-lambda, which silently changes the recurrence —
    caught by the differential and verified with prefix folds). Seasonal
    (triple) smoothing is the same fold with a per-period state array.

    Scale: identical envelope to ts_ewma — one user_id shuffle, state
    per key is two doubles, in-array struct sort, codegen'd fold; a
    key whose history outgrows a task moves to the incremental
    streaming form with the (level, trend) carry in the state store."""
    ev = table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", F.col("value").alias("x")))
        ).alias("s")
    )
    xs = seq.select(
        "user_id", F.transform("s", lambda e: e.x).alias("xs")
    )

    def step(acc, e):
        lvl = 0.5 * e + 0.5 * (acc.l + acc.t)
        return F.struct(
            lvl.alias("l"),
            (0.25 * (lvl - acc.l) + 0.75 * acc.t).alias("t"),
        )

    folded = xs.select(
        "user_id",
        F.size("xs").cast("bigint").alias("n_events"),
        F.aggregate(
            F.slice("xs", 2, F.size("xs") - 1),
            F.struct(
                F.element_at("xs", 1).alias("l"), F.lit(0.0).alias("t")
            ),
            step,
        ).alias("st"),
    )
    return folded.select(
        "user_id",
        "n_events",
        (F.round(F.col("st.l"), 6) + F.lit(0.0)).alias("level"),
        (F.round(F.col("st.t"), 6) + F.lit(0.0)).alias("trend"),
        (F.round(F.col("st.l") + F.col("st.t"), 6) + F.lit(0.0)).alias("forecast_1"),
    )
