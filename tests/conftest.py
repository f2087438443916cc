"""Shared fixtures: one SparkSession per test session, a DuckDB oracle
connection with the driver's view names, and the differential compare
helper that mirrors the driver's row-count + schema + order-insensitive
value check (but stricter: exact value equality, so any float-discipline
breach surfaces here before the driver sees it)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from gdxpy_spark.tables import TABLES

# default matches the driver's correctness gate scale (sf0.01); override
# with GDXPS_TEST_SF_DIR=/root/testdata/sf0.001 for a faster local loop
SF_DIR = os.environ.get("GDXPS_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from gdxpy_spark.session import get_spark

    s = get_spark(app="gdxpy_spark_tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # keep -0.0 distinct: queries must canonicalize the zero sign
        # themselves (engines disagree on ROUND(-tiny)); a pessimistic
        # driver hash would see -0.0 != 0.0, so our tests must too
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return v
    if isinstance(v, bool):
        return int(v)
    return v


def _rows_to_multiset(rows, col_order):
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i]) for i in col_order))
    return sorted(out, key=repr)


def assert_frames_match(spark_df, duck_rel, name=""):
    """Order-insensitive, column-name-keyed exact comparison.

    DuckDB values are fetched through Arrow — the driver's fetch path —
    NOT fetchall(): a fetchall() harness renders DuckDB HUGEINT/DECIMAL
    as Python ints and is structurally blind to the type-promotion
    class that kept six oracles driver-red for two rounds (r8 verdict).
    The Arrow schema also feeds a column-by-column render-family guard
    so any future uncast SUM() fails HERE, loudly, before the driver.
    """
    from gdxpy_spark.oracle_types import type_mismatches

    d_tbl = duck_rel.arrow()
    s_cols = list(spark_df.columns)
    d_cols = list(d_tbl.column_names)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    tmm = type_mismatches(spark_df.schema, d_tbl.schema)
    assert not tmm, f"{name}: oracle/engine result-type guard: {tmm}"
    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = list(zip(*(c.to_pylist() for c in d_tbl.columns))) \
        if d_tbl.num_rows else []
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_ms = _rows_to_multiset(s_rows, s_order)
    d_ms = _rows_to_multiset(d_rows, d_order)
    if s_ms != d_ms:
        diffs = [
            (a, b) for a, b in zip(s_ms, d_ms) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark, duck): {diffs}"
        )
