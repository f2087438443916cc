"""Round-9 hardening tests: the oracle result-type guard (the r7/r8
HUGEINT driver-fail class), declared-length WARC framing, and the
host-clamped driver-memory default."""

from __future__ import annotations

import pyarrow as pa
import pytest

from gdxpy_spark.oracle_types import arrow_family, spark_family, type_mismatches


# ---- oracle_types guard: does it actually catch the r7/r8 classes? --------


def test_type_guard_flags_hugeint(duck, spark):
    """An uncast SUM(<integer>) in DuckDB yields HUGEINT → decimal128 on
    the Arrow fetch path; the guard must flag it against Spark's int64
    (this exact pattern kept six oracles driver-red in r07+r08)."""
    tbl = duck.execute(
        "SELECT CAST(1 AS BIGINT) AS ok, SUM(x) AS bad "
        "FROM (SELECT CAST(5 AS BIGINT) AS x)"
    ).arrow()
    sdf = spark.sql("SELECT CAST(1 AS BIGINT) AS ok, CAST(5 AS BIGINT) AS bad")
    mm = type_mismatches(sdf.schema, tbl.schema)
    assert len(mm) == 1 and mm[0].startswith("bad:"), mm


def test_type_guard_flags_decimal_and_family_mismatch(spark):
    """DECIMAL on either side is non-portable (the r7 agg_histogram
    class); int-vs-float family crossings render differently ('5' vs
    '5.0') and must be flagged; int-WIDTH differences render the same
    and must pass."""
    sdf = spark.sql(
        "SELECT CAST(1 AS INT) AS a, CAST(1 AS BIGINT) AS b, "
        "CAST(1.5 AS DOUBLE) AS c"
    )
    arrow = pa.schema(
        [("a", pa.int64()), ("b", pa.float64()), ("c", pa.decimal128(18, 6))]
    )
    mm = type_mismatches(sdf.schema, arrow)
    flagged = {m.split(":")[0] for m in mm}
    assert flagged == {"b", "c"}, mm


def test_type_guard_passes_clean_families(spark):
    sdf = spark.sql(
        "SELECT 1L AS i, 1.5D AS f, 'x' AS s, true AS b, "
        "DATE '2020-01-01' AS d, TIMESTAMP '2020-01-01 00:00:00' AS t, "
        "array(1L, 2L) AS arr"
    )
    arrow = pa.schema(
        [
            ("i", pa.int64()),
            ("f", pa.float64()),
            ("s", pa.string()),
            ("b", pa.bool_()),
            ("d", pa.date32()),
            ("t", pa.timestamp("us")),
            ("arr", pa.list_(pa.int32())),
        ]
    )
    assert type_mismatches(sdf.schema, arrow) == []


def test_family_mappers_cover_unknowns():
    assert arrow_family(pa.decimal128(38, 0)) == "DECIMAL"
    from pyspark.sql import types as T

    assert spark_family(T.DecimalType(38, 0)) == "DECIMAL"
    assert spark_family(T.MapType(T.StringType(), T.LongType())).startswith(
        "UNKNOWN"
    )


# ---- llm_warc_parse: declared-length framing -------------------------------


def test_warc_framing_survives_version_line_in_body(spark):
    """A record body that CONTAINS the version-line byte sequence must
    not open a phantom record: framing is by declared Content-Chars,
    and a candidate delimiter inside a declared body span is body
    content (r8 advice — the old delimiter-split parser mis-framed
    this). Container layout mirrors the fixture writer exactly: each
    record row is terminated by the text sink's '\\n'."""
    from gdxpy_spark.operators.llm import parse_warc_containers

    body1 = "alpha beta WARC/1.0\ngamma delta"  # contains the delimiter
    body2 = "plain body"
    recs = []
    for did, body in ((7, body1), (8, body2)):
        recs.append(
            f"WARC/1.0\nWARC-Record-ID: {did}\n"
            f"Content-Chars: {len(body)}\n\n{body}"
        )
    container = "\n".join(recs) + "\n"  # text-sink row terminators
    raw = spark.createDataFrame([(container,)], "value string")
    got = {
        r.doc_id: (r.content_len, r.len_ok, r.n_tokens)
        for r in parse_warc_containers(raw).collect()
    }
    # split-on-' ': alpha | beta | WARC/1.0\ngamma | delta → 4 tokens;
    # exactly two records — the in-body delimiter opened no phantom row
    assert got == {
        7: (len(body1), True, 4),
        8: (len(body2), True, 2),
    }


def test_warc_tokens_exact(spark):
    from gdxpy_spark.operators.llm import parse_warc_containers

    body = "one two  three"
    container = (
        f"WARC/1.0\nWARC-Record-ID: 1\nContent-Chars: {len(body)}\n\n{body}\n"
    )
    raw = spark.createDataFrame([(container,)], "value string")
    rows = parse_warc_containers(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_id, r.content_len, r.len_ok, r.n_tokens) == (
        1, len(body), True, 3,
    )


# ---- session: host-clamped driver memory default ---------------------------


def test_default_driver_mem_clamps(monkeypatch):
    import gdxpy_spark.session as sess

    got = sess._default_driver_mem()
    assert got.endswith("g")
    gib = int(got[:-1])
    assert 2 <= gib <= 16
