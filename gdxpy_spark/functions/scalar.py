"""SURVEY §2.2 category G — scalar function surface.

string / regex / date / timestamp / math / conditional / cast / GDX
special values / array (higher-order fns) / JSON / pivot / unpivot.

Dialect notes encoded in the oracles:
- Spark ``dayofweek`` is 1=Sunday; DuckDB's is 0=Sunday → oracle adds 1.
- DuckDB ``regexp_replace`` replaces the first match unless the 'g' flag
  is given; Spark always replaces all → oracle passes 'g'.
- Spark array indexing (element_at/slice) and DuckDB list indexing are
  both 1-based; Spark ``posexplode`` positions are 0-based → oracle
  subtracts 1 from generate_series.
- events.ts is TIMESTAMP_NS in DuckDB, µs NTZ in Spark → oracles CAST to
  TIMESTAMP first (same truncation the Spark loader applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdxpy_spark.operators._util import davg, dsum, r4, sql_davg, sql_dsum
from gdxpy_spark.registry import register
from gdxpy_spark.tables import table


@register(
    "fn_string_basic",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substr(p_name, 1, 5) AS name_pfx,
       CAST(length(p_name) AS INT) AS name_len,
       trim(concat(' ', p_name, ' ')) AS name_trim,
       lpad(p_brand, 10, '*') AS brand_pad,
       p_name || '-' || p_type AS name_type
FROM part
""",
    category="G",
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/length/trim/lpad/concat."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").cast("int").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.lpad("p_brand", 10, "*").alias("brand_pad"),
        F.concat_ws("-", "p_name", "p_type").alias("name_type"),
    )


@register(
    "fn_string_regex",
    oracle=r"""
SELECT c_custkey,
       CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS id_num,
       regexp_replace(c_name, '0+', '-', 'g') AS squashed,
       string_split(c_name, '#')[2] AS name_suffix
FROM customer
""",
    category="G",
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract (capture group), regexp_replace (global), split.

    Patterns stay in the portable RE2/PCRE intersection (\\d, +, literal
    text) — regex dialects diverge on lookaround/anchors, not these.
    """
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint").alias("id_num"),
        F.regexp_replace("c_name", "0+", "-").alias("squashed"),
        F.element_at(F.split("c_name", "#"), 2).alias("name_suffix"),
    )


@register(
    "fn_date_parts",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
FROM orders
""",
    category="G",
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/dayofweek/date_trunc (dow normalized to Spark's 1=Sunday)."""
    od = table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


@register(
    "fn_date_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       strftime(CAST(l_shipdate AS DATE) + 30, '%Y-%m-%d') AS ship_plus_30,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
            AS INT) AS days_to_ship,
       strftime(o_orderdate, '%Y-%m') AS order_month
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
""",
    category="G",
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_add / datediff / month bucketing across a join."""
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    j = li.join(od, li.l_orderkey == od.o_orderkey)
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.date_format(F.date_add(F.col("l_shipdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "ship_plus_30"
        ),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("int").alias("days_to_ship"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
    )


@register(
    "fn_timestamp_unix",
    oracle="""
SELECT event_id,
       epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s,
       strftime(date_trunc('minute', CAST(ts AS TIMESTAMP)),
                '%Y-%m-%d %H:%M:%S') AS minute_floor
FROM events
""",
    category="G",
)
def fn_timestamp_unix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch seconds + floor-to-minute on the events stream table."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").alias("epoch_s"),
        F.date_format(F.date_trunc("minute", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "minute_floor"
        ),
    )


@register(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(sqrt(l_quantity), 4) AS sqrt_qty,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       ROUND(abs(-l_discount), 4) + 0.0 AS abs_disc,
       ROUND(ln(l_extendedprice), 4) AS ln_price,
       ROUND(exp(l_discount), 4) AS exp_disc,
       ROUND(power(l_quantity, 2), 4) AS qty_sq,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
       CAST(sign(l_tax - 0.04) AS INT) AS tax_sign
FROM lineitem
""",
    category="G",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/ceil/abs/sqrt/ln/exp/power/mod/sign."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.sqrt("l_quantity"), "sqrt_qty"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        (F.round(F.abs(-F.col("l_discount")), 4) + F.lit(0.0)).alias("abs_disc"),
        r4(F.log("l_extendedprice"), "ln_price"),
        r4(F.exp("l_discount"), "exp_disc"),
        r4(F.pow("l_quantity", 2), "qty_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.signum(F.col("l_tax") - 0.04).cast("int").alias("tax_sign"),
    )


@register(
    "fn_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 200000 THEN 'mid'
            ELSE 'high' END AS price_band,
       coalesce(NULLIF(o_orderstatus, 'F'), 'finished') AS status_or_default,
       ROUND(least(o_totalprice, 100000.0), 4) AS capped,
       ROUND(greatest(o_totalprice, 10000.0), 4) AS floored
FROM orders
""",
    category="G",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bands, coalesce/nullif, least/greatest."""
    od = table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("F")), F.lit("finished")).alias(
            "status_or_default"
        ),
        r4(F.least("o_totalprice", F.lit(100000.0)), "capped"),
        r4(F.greatest("o_totalprice", F.lit(10000.0)), "floored"),
    )


@register(
    "fn_cast",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
       CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(trunc(o_totalprice) AS BIGINT) AS price_int
FROM orders
""",
    category="G",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts: double→DECIMAL(12,2) (rendered with fixed scale), string→int,
    int→string, double→bigint. Spark's double→int cast truncates toward
    zero while DuckDB's rounds — the oracle applies trunc() explicitly to
    pin the (Spark) truncation semantics."""
    od = table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("bigint").alias("price_int"),
    )


@register(
    "fn_special_values",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(isnan(v) AS INT) AS is_nan,
       CAST(v = CAST('inf' AS DOUBLE) AS INT) AS is_pinf,
       CAST(v = CAST('-inf' AS DOUBLE) AS INT) AS is_minf,
       CAST(abs(v) < 1e-299 AS INT) AS is_eps,
       CASE WHEN isnan(v) THEN NULL
            WHEN v = CAST('inf' AS DOUBLE) THEN NULL
            WHEN v = CAST('-inf' AS DOUBLE) THEN NULL
            WHEN abs(v) < 1e-299 THEN 0.0
            ELSE ROUND(v, 4) END AS normalized
FROM (SELECT l_orderkey, l_linenumber,
             CASE CAST(l_orderkey % 5 AS INT)
                  WHEN 0 THEN CAST('inf' AS DOUBLE)
                  WHEN 1 THEN CAST('-inf' AS DOUBLE)
                  WHEN 2 THEN CAST('nan' AS DOUBLE)
                  WHEN 3 THEN 5e-300
                  ELSE l_quantity END AS v
      FROM lineitem) t
""",
    category="G",
)
def fn_special_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDX special-value semantics on plain doubles (SURVEY §1.1): the six
    GDX sentinels map to IEEE specials on read — +INF/-INF stay infinite,
    NA/UNDEF→NaN→NULL, EPS ("present but numerically zero", |x|<1e-299)
    →0.0 while *membership survives* via the is_eps flag. This is the
    scan-normalization contract of the GDX reader, exercised on synthetic
    sentinels so it is oracle-checkable."""
    li = table(spark, sf_dir, "lineitem")
    v = (
        F.when(F.col("l_orderkey") % 5 == 0, F.lit(float("inf")))
        .when(F.col("l_orderkey") % 5 == 1, F.lit(float("-inf")))
        .when(F.col("l_orderkey") % 5 == 2, F.lit(float("nan")))
        .when(F.col("l_orderkey") % 5 == 3, F.lit(5e-300))
        .otherwise(F.col("l_quantity"))
    )
    t = li.select("l_orderkey", "l_linenumber", v.alias("v"))
    return t.select(
        "l_orderkey",
        "l_linenumber",
        F.isnan("v").cast("int").alias("is_nan"),
        (F.col("v") == float("inf")).cast("int").alias("is_pinf"),
        (F.col("v") == float("-inf")).cast("int").alias("is_minf"),
        (F.abs("v") < 1e-299).cast("int").alias("is_eps"),
        F.when(F.isnan("v"), F.lit(None).cast("double"))
        .when(F.col("v") == float("inf"), F.lit(None).cast("double"))
        .when(F.col("v") == float("-inf"), F.lit(None).cast("double"))
        .when(F.abs("v") < 1e-299, F.lit(0.0))
        .otherwise(F.round("v", 4))
        .alias("normalized"),
    )


@register(
    "fn_array_basic",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT) AS n_dims,
       ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_val,
       ROUND(CAST(embedding[64] AS DOUBLE), 4) + 0.0 AS last_val,
       CAST(list_contains(embedding, embedding[1]) AS INT) AS has_first
FROM embeddings
""",
    category="G",
)
def fn_array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/array_contains on the embedding ArrayType column
    (1-based indexing on both engines)."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("n_dims"),
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + F.lit(0.0)).alias(
            "first_val"
        ),
        (F.round(F.element_at("embedding", 64).cast("double"), 4) + F.lit(0.0)).alias(
            "last_val"
        ),
        F.array_contains("embedding", F.element_at("embedding", 1))
        .cast("int")
        .alias("has_first"),
    )


@register(
    "fn_array_explode",
    oracle="""
SELECT vec_id, CAST(i - 1 AS INT) AS pos,
       CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
WHERE i <= len(embedding)
""",
    category="G",
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: vector → (vec_id, 0-based position, value) rows."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val_f")
    ).select("vec_id", F.col("pos").cast("int"), F.col("val_f").cast("double").alias("val"))


@register(
    "fn_array_lambda",
    oracle="""
SELECT vec_id,
       ROUND(sqrt(list_aggregate(
           list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
           'sum')), 4) AS l2_norm
FROM embeddings
""",
    category="G",
)
def fn_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions: L2 norm via transform + aggregate (a
    sequential fold — same summation order on both engines)."""
    e = table(spark, sf_dir, "embeddings")
    sq = F.transform(
        F.col("embedding"), lambda v: v.cast("double") * v.cast("double")
    )
    return e.select(
        "vec_id",
        F.round(
            F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)), 4
        ).alias("l2_norm"),
    )


@register(
    "fn_json_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val
FROM events
""",
    category="G",
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events props column."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "fn_pivot",
    oracle="""
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
FROM events GROUP BY user_id
""",
    category="G",
)
def fn_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long → wide: event counts per user × type. This is gdxpy's pandas
    MultiIndex ``unstack`` (SURVEY §2.1 R9) as a Spark pivot; the value
    list is explicit so the plan is a single pass (no distinct-values
    pre-query) and the output schema is stable."""
    ev = table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


@register(
    "fn_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, value
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem)
UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount))
""",
    category="G",
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long (melt/stack): three measures into (measure, value) rows
    — gdxpy's MultiIndex ``stack`` equivalent."""
    li = table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "fn_map_ops",
    oracle="""
SELECT event_id,
       CAST(len(json_keys(props)) AS INT) AS n_keys,
       json_keys(props)[1] AS first_key,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val
FROM events
""",
    category="G",
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON props column into map<string,int>
    and use map_keys/element_at — the typed-map view of semi-structured
    data (vs fn_json_extract's per-path access)."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").cast("int").alias("k_val"),
    )


@register(
    "fn_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 15 AS with_low_bits,
       xor(o_orderkey, o_custkey) AS key_xor,
       o_orderkey << 2 AS shl2,
       o_orderkey >> 3 AS shr3,
       CAST(bit_count(o_orderkey) AS INT) AS popcount
FROM orders
""",
    category="G",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise integer surface: AND/OR/XOR, shifts, popcount — the
    primitives behind bitmask set-Jaccard (operators/llm.py), Morton
    z-ordering (plans/layout.py), and SimHash banding, exposed as a
    query so the cross-engine semantics (64-bit two's-complement, shift
    widths, popcount of non-negative keys) are hash-pinned. All
    codegen'd JVM expressions; map-only, fuses with the scan."""
    od = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return od.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(15)).alias("with_low_bits"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).cast("int").alias("popcount"),
    )


# URL construction shared VERBATIM between the Spark query (F.expr) and
# the DuckDB oracle, so both engines parse the same strings: host and
# path on every row, query string absent on every 4th row (exercising
# parse_url's NULL-for-missing-component contract), fragment always
# present. Built from part-table keys so the mix is deterministic.
_URL_EXPR = (
    "'https://w' || CAST(p_partkey % 50 AS STRING)"
    " || '.example.org/parts/' || CAST(p_partkey AS STRING)"
    " || CASE WHEN p_partkey % 4 = 0 THEN ''"
    "         ELSE '?size=' || CAST(p_size AS STRING)"
    "              || '&mfgr=m' || CAST(p_partkey % 5 AS STRING) END"
    " || '#s' || CAST(p_partkey % 3 AS STRING)"
)


@register(
    "fn_url_parse",
    oracle=f"""
WITH u AS (SELECT p_partkey, {_URL_EXPR} AS url FROM part)
SELECT p_partkey,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       NULLIF(regexp_extract(url, '\\?([^#]*)', 1), '') AS query,
       NULLIF(regexp_extract(url, '[?&]size=([^&#]*)', 1), '') AS q_size,
       regexp_extract(url, '#(.*)$', 1) AS frag
FROM u
""",
    category="G",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — the per-row parse every web-scale corpus
    pipeline runs on its source URLs (dedup by host, robots/quality
    rules by domain, campaign params stripped before URL-keyed joins).
    Spark's parse_url is a JVM intrinsic (PROTOCOL/HOST/PATH/QUERY/REF
    plus keyed query-parameter lookup) and returns NULL for a missing
    component — exercised here on every 4th row, which carries no query
    string. The oracle reconstructs the identical decomposition with
    anchored RE2 extracts (DuckDB has no parse_url), NULLIF-normalized
    because regexp_extract signals a miss with '' instead of NULL.

    Scale: map-only JVM expression over a generated column — fuses into
    the scan, no shuffle, no Python; at 100 TB this is the canonical
    \"stay JVM-side\" scalar chain (a row-at-a-time Python urlparse UDF
    here would be the classic 10-100x regression)."""
    p = table(spark, sf_dir, "part")
    url = F.expr(_URL_EXPR)
    return p.select(
        "p_partkey",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("size")).alias("q_size"),
        F.parse_url(url, F.lit("REF")).alias("frag"),
    )


@register(
    "fn_try_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_linenumber - 1 = 0 THEN NULL
            ELSE ROUND(l_extendedprice / (l_linenumber - 1), 4) END
         AS unit_price,
       CASE WHEN l_orderkey % 64 = 63 THEN NULL
            ELSE 9223372036854775745 + l_orderkey % 64 END AS near_max,
       TRY_CAST(CASE WHEN l_orderkey % 64 = 63 THEN l_returnflag
                     ELSE CAST(l_suppkey AS VARCHAR) END
                AS INTEGER) AS flag_as_int
FROM lineitem
""",
    category="G",
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-SAFE arithmetic (the ANSI-mode escape hatches): Spark 4
    runs with ANSI SQL semantics by default, where division by zero and
    bigint overflow are runtime ERRORS that kill the job — try_divide /
    try_add / try_cast return NULL instead, which is what a 100 TB
    pipeline wants (one malformed row must not abort a million-task
    job; the NULLs are then counted/quarantined downstream). Exercised
    on real-but-RARE error rows, matching the production profile where
    errors are the exception: the bigint literal overflows only when
    l_orderkey % 64 = 63 (~1.6% of rows at every SF), the same rare
    rows carry an unparseable letter into try_cast, and l_linenumber−1
    is zero for every first line item (try_divide's zero check is a
    cheap branch, not a JVM throw — ~14% zero-divisors cost nothing).
    The error DENSITY is the whole performance story: both
    long-overflow inside try_add and parse failure inside
    string→int try_cast are detected via a thrown-and-caught JVM
    exception (measured on this box: ~1.8 s per 86k overflow rows,
    ~4.5 s per 600k failed casts at sf0.1), so a fixture where most
    rows error benchmarks exception unwinding — a throughput cliff no
    real pipeline has — while at a few percent the columns cost the
    same as untyped arithmetic. That is also why flag_as_int feeds
    try_cast a mostly-NUMERIC string (suppkey digits, letters only on
    the rare rows) instead of casting the always-a-letter returnflag:
    a 100%-failing try_cast is the same anti-fixture as a
    100%-overflowing try_add. The oracle expresses the identical
    null-on-error semantics with guards (CASE short-circuits per row,
    so the guarded literal never overflows DuckDB either) and a
    genuine TRY_CAST on both engines."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide("l_extendedprice", F.col("l_linenumber") - 1), 4
        ).alias("unit_price"),
        F.try_add(
            F.lit(9223372036854775745), F.col("l_orderkey") % 64
        ).alias("near_max"),
        F.expr(
            "try_cast(CASE WHEN l_orderkey % 64 = 63 THEN l_returnflag"
            "              ELSE CAST(l_suppkey AS STRING) END AS int)"
        ).alias("flag_as_int"),
    )


@register(
    "fn_variant_json",
    oracle="""
SELECT event_id,
       CAST(props->>'k' AS INTEGER) AS k_int,
       CAST(props->>'k' AS VARCHAR) AS k_str,
       CAST(props->>'missing' AS INTEGER) AS absent,
       (props->>'k') IS NOT NULL AS has_k
FROM events
""",
    category="G",
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion — the engine's native answer to
    schemaless JSON columns: parse_json turns the props string into an
    open VariantType value ONCE (a binary encoding that keeps field
    access O(field) instead of re-parsing text per extraction — the
    reason variant beats repeated get_json_object at 100 TB), then
    variant_get pulls typed fields with cast-on-read semantics and
    missing paths surface as NULL rather than errors. The oracle
    expresses identical semantics with DuckDB's JSON operators (->> +
    CAST), so typed extraction, string extraction, absent-path NULL,
    and existence all hash-check.

    Scale: map-only, scan-fused; one parse per row feeding all four
    extractions (Catalyst keeps the common parse_json subexpression),
    no UDF, no shuffle."""
    ev = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "int").alias("absent"),
        F.variant_get(v, "$.k", "string").isNotNull().alias("has_k"),
    )


# XML fragment shared VERBATIM between the Spark query and the oracle:
# attribute + nested elements + an optional element (absent on every
# 3rd row) — the missing-element NULL contract is part of the check.
_XML_EXPR = (
    "'<item id=\"' || CAST(p_partkey AS STRING) || '\">"
    "<size>' || CAST(p_size AS STRING) || '</size>"
    "<brand>' || p_brand || '</brand>' ||"
    " CASE WHEN p_partkey % 3 = 0 THEN ''"
    "      ELSE '<container>' || p_type || '</container>' END"
    " || '</item>'"
)


@register(
    "fn_xml_extract",
    oracle=f"""
WITH x AS (SELECT p_partkey, {_XML_EXPR} AS xml FROM part)
SELECT p_partkey,
       CAST(regexp_extract(xml, 'id="([0-9]+)"', 1) AS BIGINT) AS id_attr,
       CAST(regexp_extract(xml, '<size>([0-9]+)</size>', 1) AS INT) AS size,
       regexp_extract(xml, '<brand>([^<]*)</brand>', 1) AS brand,
       NULLIF(regexp_extract(xml, '<container>([^<]*)</container>', 1), '')
         AS container
FROM x
""",
    category="G",
)
def fn_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion — the third wire format next to JSON/CSV: from_xml
    parses each row's fragment against a declared struct schema (Spark
    4 built-in; attributes surface as `_name` fields, missing elements
    as NULL — exercised on every 3rd row, which omits <container>).
    The oracle reconstructs the same extraction with anchored regex
    captures + NULLIF (DuckDB has no XML reader), so typed attribute,
    nested-element, and absent-element semantics all hash-check.

    Scale: map-only single-pass parse fused into the scan — the same
    stay-JVM-side argument as parse_url/parse_json; at 100 TB a
    row-at-a-time Python ElementTree UDF here is the classic
    regression."""
    p = table(spark, sf_dir, "part")
    xml = F.expr(_XML_EXPR)
    schema = "_id BIGINT, size INT, brand STRING, container STRING"
    v = F.from_xml(xml, schema)
    return p.select(
        "p_partkey",
        v.getField("_id").alias("id_attr"),
        v.getField("size").alias("size"),
        v.getField("brand").alias("brand"),
        v.getField("container").alias("container"),
    )


@register(
    "fn_hash_digests",
    oracle="""
SELECT doc_id,
       md5(text) AS md5_hex,
       sha256(text) AS sha256_hex,
       substr(sha256(text), 1, 16) AS shard_key
FROM documents
""",
    category="G",
)
def fn_hash_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRYPTOGRAPHIC DIGESTS — the content-addressing surface every
    dedup/caching/provenance layer keys on: md5 and sha-256 of the
    document bytes, plus the truncated-digest shard key (the first 64
    bits of sha-256 — how content-addressed stores bucket blobs).
    These are STANDARD algorithms, so unlike engine-native hashes
    (xxhash64, DuckDB's hash()) the hex strings are identical across
    every engine and language — which is exactly why pipelines use
    them at trust boundaries, and why this op is hash-oracle-checkable
    while llm_simhash/minhash are weak by contract.

    Scale: JVM intrinsics (commons-codec under the hood), scan-fused,
    no shuffle; sha-256 over text costs ~1 GB/s/core — at 100 TB you
    budget for it, which is why exact-dedup keys on ONE digest and
    derives everything else (shard, bucket) by truncation rather than
    hashing twice with different algorithms."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.substring(F.sha2("text", 256), 1, 16).alias("shard_key"),
    )


# Synthetic coordinates shared VERBATIM between both engines: customers
# placed on a deterministic lat/lon grid from their key; nation 0's
# "hub" is the fixed reference point.
_GEO_LAT = "(CAST(c_custkey % 180 AS DOUBLE) - 89.5)"
_GEO_LON = "(CAST((c_custkey * 7) % 360 AS DOUBLE) - 179.5)"


@register(
    "fn_geo_haversine",
    oracle=f"""
SELECT c_custkey,
       ROUND({_GEO_LAT}, 4) AS lat,
       ROUND({_GEO_LON}, 4) AS lon,
       ROUND(2 * 6371.0 * asin(sqrt(
         pow(sin(radians(({_GEO_LAT}) - 40.0) / 2), 2)
         + cos(radians({_GEO_LAT})) * cos(radians(40.0))
           * pow(sin(radians(({_GEO_LON}) - (-74.0)) / 2), 2)
       )), 2) + 0.0 AS km_to_hub
FROM customer
""",
    category="G",
)
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEO DISTANCE — great-circle (haversine) kilometers from each
    customer's synthetic coordinates to a fixed hub (40°N 74°W): the
    scalar behind geo-fencing, nearest-warehouse routing, and
    location-based dedup radii. The formula is spelled out in
    sin/cos/asin primitives in the IDENTICAL shape on both engines;
    transcendentals are not IEEE-correctly-rounded across libm
    implementations, so the result is rounded to 2 decimals (≈10 m) —
    far coarser than any last-ulp divergence, the same discipline
    fn_math applies to ln/exp. (+0.0 normalizes the zero-sign corner.)

    Scale: map-only codegen'd math, scan-fused, no shuffle; at 100 TB
    a geo join would bucket by geohash/S2 cell first and use this as
    the in-bucket verify — the distance kernel is this expression
    either way."""
    c = table(spark, sf_dir, "customer")
    lat = F.expr(_GEO_LAT)
    lon = F.expr(_GEO_LON)
    dlat = F.radians(lat - 40.0) / 2
    dlon = F.radians(lon - F.lit(-74.0)) / 2
    h = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians(lat)) * F.cos(F.radians(F.lit(40.0)))
        * F.pow(F.sin(dlon), 2)
    )
    return c.select(
        "c_custkey",
        F.round(lat, 4).alias("lat"),
        F.round(lon, 4).alias("lon"),
        (F.round(2 * 6371.0 * F.asin(F.sqrt(h)), 2) + 0.0).alias(
            "km_to_hub"
        ),
    )


@register(
    "fn_format_strings",
    oracle="""
SELECT s_suppkey,
       printf('%08d', s_suppkey) AS id_pad,
       printf('%x', s_suppkey * 2654435761) AS id_hex,
       lpad(CAST(s_suppkey AS VARCHAR), 6, '0') || '-'
         || rpad(s_nationkey::VARCHAR, 3, '_') AS composite_key,
       translate(s_name, '#e', '.3') AS name_leet,
       reverse(CAST(s_suppkey AS VARCHAR)) AS rev_key,
       repeat('*', CAST(s_suppkey % 5 AS INTEGER)) || s_name AS starred
FROM supplier
""",
    category="G",
)
def fn_format_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING FORMATTING — the printf/pad/translate surface behind
    shard-key minting, fixed-width export records, and log rendering:
    zero-padded decimal (%08d), lowercase hex of a Knuth-hashed key
    (%x — the bucket-dir naming idiom), lpad/rpad composite keys,
    translate for separator normalization, reverse for hot-prefix key
    scattering (the classic HBase/Bigtable trick: sequential ids
    reversed so writes spread across ranges). Spark's format_string is
    java.util.Formatter, DuckDB's printf is C fmt — %d/%x/%s agree
    exactly; FLOAT formats (%.2f) do NOT (HALF_UP vs round-half-even)
    and are deliberately excluded — floats format through
    round()+cast, never printf.

    Scale: map-only codegen'd string ops, scan-fused, no shuffle."""
    s = table(spark, sf_dir, "supplier")
    key = F.col("s_suppkey")
    return s.select(
        "s_suppkey",
        F.format_string("%08d", key).alias("id_pad"),
        F.format_string("%x", key * F.lit(2654435761)).alias("id_hex"),
        F.concat(
            F.lpad(key.cast("string"), 6, "0"),
            F.lit("-"),
            F.rpad(F.col("s_nationkey").cast("string"), 3, "_"),
        ).alias("composite_key"),
        F.translate("s_name", "#e", ".3").alias("name_leet"),
        F.reverse(key.cast("string")).alias("rev_key"),
        F.concat(
            F.repeat(F.lit("*"), (key % 5).cast("int")), F.col("s_name")
        ).alias("starred"),
    )


@register(
    "fn_base64_binary",
    oracle="""
SELECT doc_id,
       base64(CAST(substr(text, 1, 32) AS BLOB)) AS b64,
       decode(from_base64(base64(CAST(substr(text, 1, 32) AS BLOB))))
         AS roundtrip,
       lower(hex(CAST(substr(text, 1, 16) AS BLOB))) AS hex16,
       octet_length(CAST(substr(text, 1, 32) AS BLOB)) AS n_bytes
FROM documents
""",
    category="G",
)
def fn_base64_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY ENCODING surface — base64 encode/decode roundtrip and hex
    rendering of text prefixes treated as bytes: the wire-format
    conversions every multimodal/binary-column pipeline does at its
    edges (payloads into JSON envelopes, checksum hex in manifests,
    mm_* columns travel exactly like this). Base64 (RFC 4648) and hex
    are standard encodings, so both engines' outputs are identical and
    hash-checkable; the decode(encode(x)) roundtrip pins losslessness,
    octet_length pins that the byte view matches the char view on this
    ASCII corpus (on UTF-8 data they'd differ — that's the point of
    measuring bytes, not chars).

    Scale: map-only codegen'd byte ops, scan-fused, no shuffle; at
    100 TB base64 inflates payloads 4/3× — the engine keeps binary
    columns raw and encodes only at the serving edge, as here."""
    docs = table(spark, sf_dir, "documents")
    pre32 = F.substring("text", 1, 32).cast("binary")
    return docs.select(
        "doc_id",
        F.base64(pre32).alias("b64"),
        F.unbase64(F.base64(pre32)).cast("string").alias("roundtrip"),
        F.lower(F.hex(F.substring("text", 1, 16).cast("binary"))).alias(
            "hex16"
        ),
        F.octet_length(pre32).cast("bigint").alias("n_bytes"),
    )


@register(
    "fn_regex_extract_all",
    oracle=r"""
WITH m AS (
  SELECT event_id,
         regexp_extract_all(props, '\d+') AS nums
  FROM events)
SELECT event_id,
       unnest(range(0, len(nums))) AS pos,
       unnest(nums) AS num_str
FROM m
""",
    category="G",
)
def fn_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-MATCH regex extraction — every digit run in the events
    props JSON, exploded to (row, position, match) — the log-scraping /
    token-mining primitive where regexp_extract's first-match-only
    isn't enough. Both engines have a native regexp_extract_all; the
    pattern stays in the portable RE2/PCRE intersection (\\d+). The
    array explodes WITH its position (posexplode / parallel-unnest
    range) so downstream joins can reconstruct match order after any
    shuffle — emitting matches without ordinal is the classic
    silently-nondeterministic output.

    Scale: map-side explode with bounded fan-out (matches per row);
    scan-fused, no shuffle."""
    ev = table(spark, sf_dir, "events")
    m = ev.select(
        "event_id",
        # group 0 = the whole match (Spark defaults to group 1; the
        # pattern has no capture group)
        F.regexp_extract_all("props", F.lit(r"\d+"), 0).alias("nums"),
    )
    return m.select(
        "event_id", F.posexplode("nums").alias("pos", "num_str")
    )


@register(
    "fn_levenshtein",
    oracle="""
SELECT p_partkey,
       CAST(levenshtein(p_brand, p_type) AS INT) AS lev,
       CAST(CASE WHEN levenshtein(p_brand, p_type) <= 8
                 THEN levenshtein(p_brand, p_type) ELSE -1 END
            AS INT) AS lev_capped,
       CAST(levenshtein(lower(p_brand), lower(p_type)) AS INT) AS lev_ci
FROM part
""",
    category="G",
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance — the fuzzy-matching scalar both engines implement
    natively (dynamic-programming Levenshtein): raw distance, a
    threshold-capped variant (Spark's 3-arg levenshtein short-circuits
    the DP band and returns -1 past the cap — the form to use in a
    similarity-join prefilter, where most pairs are far apart and the
    full O(len²) table is wasted work), and a case-folded variant.

    Scale: map-only, scan-fused, whole-stage codegen; no shuffle. The
    capped form is the one that matters at 100 TB — banded DP is
    O(len·k) instead of O(len²)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").alias("lev"),
        F.levenshtein("p_brand", "p_type", 8).alias("lev_capped"),
        F.levenshtein(F.lower("p_brand"), F.lower("p_type")).alias("lev_ci"),
    )


@register(
    "fn_char_jaccard",
    oracle="""
SELECT p_partkey,
       jaccard(lower(p_name), lower(p_brand)) AS sim
FROM part
""",
    category="G",
)
def fn_char_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-set Jaccard similarity — DuckDB ships it as the
    `jaccard` scalar; Spark has no native equivalent, so the engine
    composes it from higher-order array functions (split to chars →
    distinct → intersect/union cardinalities), staying JVM-side and
    codegen-friendly — the pattern for porting any set-algebra scalar
    a dialect lacks. The ratio is an exact small-integer division, so
    the comparison needs no rounding tolerance.

    Scale: map-only over bounded-length strings; no shuffle."""
    p = table(spark, sf_dir, "part")
    ca = F.array_distinct(F.split(F.lower("p_name"), ""))
    cb = F.array_distinct(F.split(F.lower("p_brand"), ""))
    ca = F.array_remove(ca, "")
    cb = F.array_remove(cb, "")
    inter = F.size(F.array_intersect(ca, cb)).cast("double")
    union = F.size(F.array_union(ca, cb)).cast("double")
    return p.select(
        "p_partkey",
        (inter / union).alias("sim"),
    )


_IP_CIDR_ORACLE = """
WITH ip AS (
  SELECT c_custkey,
         c_custkey % 223 + 1 AS o1,
         (c_custkey * 7) % 256 AS o2,
         (c_custkey * 13) % 256 AS o3,
         (c_custkey * 31) % 256 AS o4
  FROM customer),
n AS (
  SELECT c_custkey,
         CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
           || CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR) AS ip_str,
         CAST(o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS BIGINT) AS ip_num
  FROM ip)
SELECT c_custkey, ip_str, ip_num,
       CASE WHEN ip_num >> 24 = 10 THEN '10.0.0.0/8'
            WHEN ip_num >> 20 = (172 * 16 + 1) THEN '172.16.0.0/12'
            WHEN ip_num >> 16 = (192 * 256 + 168) THEN '192.168.0.0/16'
            ELSE 'public' END AS subnet
FROM n
"""


@register("fn_ip_cidr", oracle=_IP_CIDR_ORACLE, category="B")
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 PARSE + CIDR CLASSIFICATION — octets → dotted string →
    packed uint32 → RFC-1918 membership via PREFIX SHIFTS (ip >> (32-p)
    == prefix >> (32-p)): the log-enrichment scalar behind bot
    filtering, geo joins, and PII scoping of crawl data. The 0x-shift
    form is the actual CIDR algorithm (not a string prefix hack), and
    every step is exact integer/string math — map-only, codegen'd,
    scan-fused; a CIDR TABLE (vs the 3 fixed blocks here) would
    broadcast and range-join on (ip_num >> suffix_bits). Synthetic
    octets are pure functions of c_custkey so the oracle reconstructs
    them bit-for-bit."""
    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    o1, o2, o3, o4 = (
        (k % 223 + 1),
        (k * 7) % 256,
        (k * 13) % 256,
        (k * 31) % 256,
    )
    ip_num = (o1 * 16777216 + o2 * 65536 + o3 * 256 + o4).cast("bigint")
    return c.select(
        "c_custkey",
        F.concat_ws(
            ".",
            o1.cast("string"), o2.cast("string"),
            o3.cast("string"), o4.cast("string"),
        ).alias("ip_str"),
        ip_num.alias("ip_num"),
        F.when(F.shiftright(ip_num, 24) == 10, "10.0.0.0/8")
        # >>20 keeps the top 12 bits: (172 << 4) | (16 >> 4) = 172·16 + 1
        # (the first review shipped 172·256+16, a dead branch — pinned by
        # test_ip_cidr_every_branch_reachable)
        .when(F.shiftright(ip_num, 20) == 172 * 16 + 1, "172.16.0.0/12")
        .when(F.shiftright(ip_num, 16) == 192 * 256 + 168, "192.168.0.0/16")
        .otherwise("public")
        .alias("subnet"),
    )


_COLLATE_ORACLE = """
WITH v AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS label
  FROM documents)
SELECT lower(label) AS label_lc,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(label) AS min_raw_form
FROM v
GROUP BY lower(label)
"""


@register("fn_collate_group", oracle=_COLLATE_ORACLE, category="B")
def fn_collate_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION-AWARE GROUPING (Spark 4 collations): group a mixed-case
    label under the UTF8_LCASE collation so 'WEB' and 'web' land in one
    group WITHOUT rewriting every predicate through lower() — the way
    entity names, language tags, and email domains actually get
    normalized in ingest pipelines (collation keeps the ORIGINAL bytes
    available; a lower() projection destroys them). The mixed-case
    input is derived deterministically (even doc_ids upper-case their
    source). Output keys are re-rendered through lower() and the
    representative via binary MIN because a collated group's "first"
    raw value is partition-order-dependent — the one nondeterminism
    collation introduces, solved the same way on both engines. The
    oracle is the classic lower()-rewrite, proving the collated plan
    computes exactly the classic semantics.

    Scale: the collation is hash-aware (Spark hashes the collation key,
    so the groupBy stays one partial-agg shuffle — no sort-based
    fallback); at 100 TB this beats the lower() rewrite wherever the
    original form must survive to the output."""
    docs = table(spark, sf_dir, "documents")
    label = F.when(
        F.col("doc_id") % 2 == 0, F.upper("source")
    ).otherwise(F.col("source"))
    v = docs.select(F.collate(label, "UTF8_LCASE").alias("label"))
    return (
        v.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min(F.collate(F.col("label"), "UTF8_BINARY")).alias(
                "min_raw_form"
            ),
        )
        .select(
            F.lower(F.col("label")).cast("string").alias("label_lc"),
            "n_docs",
            F.col("min_raw_form").cast("string").alias("min_raw_form"),
        )
    )


def _morton_spread_sql(v: str) -> str:
    """SQL text for the classic 16→32-bit Morton bit-spread (insert a 0
    between adjacent bits) — portable across Spark SQL and DuckDB
    (both support <<, >>, &, | on BIGINT)."""
    s1 = f"((({v}) | (({v}) << 8)) & 16711935)"          # 0x00FF00FF
    s2 = f"((({s1}) | (({s1}) << 4)) & 252645135)"       # 0x0F0F0F0F
    s3 = f"((({s2}) | (({s2}) << 2)) & 858993459)"       # 0x33333333
    return f"((({s3}) | (({s3}) << 1)) & 1431655765)"    # 0x55555555


def _morton_compact_sql(v: str) -> str:
    """Inverse of _morton_spread_sql: drop the interleaved zero bits."""
    c0 = f"(({v}) & 1431655765)"
    c1 = f"((({c0}) | (({c0}) >> 1)) & 858993459)"
    c2 = f"((({c1}) | (({c1}) >> 2)) & 252645135)"
    c3 = f"((({c2}) | (({c2}) >> 4)) & 16711935)"
    return f"((({c3}) | (({c3}) >> 8)) & 65535)"         # 0x0000FFFF


def morton_z_sql(x: str, y: str) -> str:
    """z = interleave(x, y), x in even bits, y in odd bits (x, y < 2^16)."""
    return f"({_morton_spread_sql(x)} | ({_morton_spread_sql(y)} << 1))"


_ZORDER_ORACLE = f"""
WITH d AS (
  SELECT event_id,
         CAST(user_id & 65535 AS BIGINT) AS ux,
         CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 60000000) & 65535 AS BIGINT)
           AS tb
  FROM events)
SELECT event_id, ux, tb,
       CAST({morton_z_sql('ux', 'tb')} AS BIGINT) AS z,
       CAST({_morton_compact_sql(morton_z_sql('ux', 'tb'))} AS BIGINT) AS ux_back,
       CAST({_morton_compact_sql('(' + morton_z_sql('ux', 'tb') + ') >> 1')}
            AS BIGINT) AS tb_back
FROM d
"""


@register("fn_zorder", oracle=_ZORDER_ORACLE, category="G")
def fn_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) curve encode/decode — THE multi-dimensional
    data-layout key at 100 TB: interleaving the bits of two dimension
    buckets makes rows close in (user, time) close on the curve, so a
    z-sorted parquet layout gives row-group min/max pruning on BOTH
    dimensions at once (src_parquet_zorder demonstrates the layout;
    this op pins the bit math). Classic magic-number spread/compact —
    5 shift/mask stages each way, all literal shift counts, pure JVM
    scan-fused codegen, zero shuffle. The round-trip columns (ux_back,
    tb_back) prove the encode is bijective on every row; the oracle
    runs the identical shift chain, and tests/test_r10_ops.py pins the
    math against a pure-Python third source (the fn_ip_cidr lesson:
    a differential twin cannot catch a constant copied wrong to both
    sides)."""
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "event_id",
        F.expr("CAST(user_id & 65535 AS BIGINT)").alias("ux"),
        F.expr(
            "CAST((unix_micros(CAST(ts AS TIMESTAMP)) div 60000000) & 65535"
            " AS BIGINT)"
        ).alias("tb"),
    )
    z = morton_z_sql("ux", "tb")
    return d.select(
        "event_id",
        "ux",
        "tb",
        F.expr(f"CAST({z} AS BIGINT)").alias("z"),
        F.expr(f"CAST({_morton_compact_sql(z)} AS BIGINT)").alias("ux_back"),
        F.expr(
            f"CAST({_morton_compact_sql('(' + z + ') >> 1')} AS BIGINT)"
        ).alias("tb_back"),
    )
