"""Round-11 operator tests: the partsupp-derived TPC-H shapes
(Q9/Q11/Q20 — the three queries previously schema-blocked by the
missing partsupp table, unblocked via the deterministic derived
relation), plan-shape pins for each, and the derived-partsupp
invariants themselves."""

import re

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name, sf=SF_DIR):
    from gdxpy_spark.plans.inspect import formatted_plan
    from gdxpy_spark.registry import all_queries

    return formatted_plan(all_queries()[name].fn(spark, sf))


# ---- derived partsupp invariants --------------------------------------------


def test_partsupp_is_deterministic_and_bounded(spark):
    """The derived partsupp must be a pure function of the lineitem
    pair set: one row per DISTINCT (partkey, suppkey), measures inside
    their documented integer ranges, and bit-identical across two
    independent builds (no RNG stream anywhere)."""
    from gdxpy_spark.operators.tpch_shapes import _partsupp

    ps = _partsupp(spark, SF_DIR)
    rows = ps.collect()
    n_pairs = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .count()
    )
    assert len(rows) == n_pairs
    assert all(10000 <= r.cost_c <= 99999 for r in rows)
    assert all(1 <= r.ps_availqty <= 9999 for r in rows)
    again = {(r.ps_partkey, r.ps_suppkey): (r.cost_c, r.ps_availqty)
             for r in _partsupp(spark, SF_DIR).collect()}
    assert {(r.ps_partkey, r.ps_suppkey): (r.cost_c, r.ps_availqty)
            for r in rows} == again


# ---- Q9: six-table profit rollup --------------------------------------------


def test_q9_no_bnlj_and_selective_filter_pushed(spark):
    """The 6-table profit join must be all equi-joins (no BNLJ, no
    cartesian), with the one selective predicate — the part-name
    family — pushed into the part SCAN, and the lineitem scan pruned
    to the five columns the query touches."""
    plan = _plan(spark, "tpch_q9_shape")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan, plan
    # LIKE '%gear%' pushes to the part scan as a StringContains filter
    assert "StringContains(p_name,gear)" in plan, plan
    # lineitem ReadSchema is pruned: untouched columns appear nowhere
    assert "l_tax" not in plan and "l_returnflag" not in plan, plan


def test_q9_profit_milli_to_cents_half_up_ties(spark):
    """The milli→cents conversion (the final presentation step) must
    round HALF-UP away from zero in exact integer arithmetic — the
    sf0.01 differential caught a +5-milli tie (…255 milli) where a raw
    double /1000 flipped the last cent between engines."""
    df = spark.createDataFrame(
        [(1266986255,), (-1266986255,), (15,), (-15,), (14,), (-14,)],
        "s_m long",
    ).select(
        F.expr(
            "CASE WHEN s_m >= 0 THEN (s_m + 5) div 10 "
            "ELSE -((-s_m + 5) div 10) END"
        ).alias("cents")
    )
    assert [r.cents for r in df.collect()] == [
        126698626, -126698626, 2, -2, 1, -1]


# ---- Q11: group threshold via reused aggregate -------------------------------


def test_q11_threshold_is_single_row_cross(spark):
    """The HAVING-with-global-scalar must surface as exactly ONE
    BroadcastNestedLoopJoin whose build side is the 1-row total — not
    a per-row correlated probe and not a second join of partsupp."""
    plan = _plan(spark, "tpch_q11_shape")
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_q11_total_reuses_group_stage_not_a_rescan(spark):
    """The nation total must come from the per-part groups, physically
    REUSING their shuffle stage: the AQE final plan reads lineitem at
    most once (the tot branch consumes a reused ShuffleQueryStage).
    Run at sf0.01 — at sf0.001 the result is empty and AQE collapses
    the plan to EmptyRelation, which would vacuously pass."""
    from gdxpy_spark.registry import all_queries

    df = all_queries()["tpch_q11_shape"].fn(spark, "/root/testdata/sf0.01")
    assert len(df.collect()) > 0
    final = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    final_section = final.split("== Initial Plan ==")[0]
    assert final_section.count("lineitem.parquet") <= 1, final_section


# ---- Q20: excess-stock suppliers ---------------------------------------------


def test_q20_equi_joins_only_and_date_pushed(spark):
    """Decorrelated Q20 must be equi-joins + aggregates only, with the
    ship-year window pushed into the lineitem SCAN (the aggregate runs
    over one year, not all years filtered later)."""
    plan = _plan(spark, "tpch_q20_shape")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("GreaterThanOrEqual(l_shipdate" in ln for ln in pushed), plan


def test_q20_inner_join_drops_unshipped_pairs(spark):
    """TPC-H's `availqty > 0.5*(SELECT SUM ...)` is NULL-false when no
    lineitem matched the year window — pairs with zero shipped rows
    must NOT appear. Every returned supplier must hold at least one
    in-window shipment of a matching part (checked independently of
    the query path)."""
    from gdxpy_spark.registry import all_queries

    got = {r.s_suppkey
           for r in all_queries()["tpch_q20_shape"].fn(spark, SF_DIR).collect()}
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(
        F.col("p_name").like("small%")
    )
    shippers = {
        r.l_suppkey
        for r in li.join(part, li.l_partkey == part.p_partkey)
        .select("l_suppkey").distinct().collect()
    }
    assert got <= shippers
