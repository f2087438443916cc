"""Semantic + plan tests for the round-7 operators. Cross-engine value
equality is covered by test_oracle_parity (all six are full hash
oracles); these tests pin the SEMANTIC contracts a hash match alone
would not explain (every PII class actually redacts, URL disguises
actually collapse, chunk windows actually overlap, lerp lies between
its neighbors) and the plan properties that carry the 100 TB claims
(no Exchange in the scan-fused ops, no O(n²) UnboundedFollowing window
frame, partial aggregation before the z-score window)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from gdxpy_spark import registry
from gdxpy_spark.plans.inspect import formatted_plan
from tests.conftest import SF_DIR

ALL = registry.all_queries()


# ---------------------------------------------------------------- PII text


def test_pii_text_redacts_every_planted_class(spark):
    rows = ALL["llm_pii_text"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # one of each class is planted per doc, so every audit count is
        # >= 1 and every placeholder appears in the redacted text
        for cls, tag in [("n_email", "<EMAIL>"), ("n_ssn", "<SSN>"),
                         ("n_phone", "<PHONE>"), ("n_ip", "<IP>")]:
            assert r[cls] >= 1, (r["doc_id"], cls)
            assert tag in r["redacted"], (r["doc_id"], tag)


def test_pii_text_leaves_no_residual_matches(spark):
    from gdxpy_spark.operators.llm import _PII_PATTERNS

    rows = ALL["llm_pii_text"].fn(spark, SF_DIR).collect()
    for r in rows:
        for cls, pat, _ in _PII_PATTERNS:
            assert not re.search(pat, r["redacted"]), (
                f"doc {r['doc_id']}: un-redacted {cls} survives"
            )


def test_pii_text_plan_is_shuffle_free(spark):
    plan = formatted_plan(ALL["llm_pii_text"].fn(spark, SF_DIR))
    assert "Exchange" not in plan


# ---------------------------------------------------------------- URL ops


def test_url_parse_plan_is_shuffle_free(spark):
    plan = formatted_plan(ALL["fn_url_parse"].fn(spark, SF_DIR))
    assert "Exchange" not in plan


def test_url_normalize_collapses_all_disguises(spark):
    rows = ALL["llm_url_normalize"].fn(spark, SF_DIR).collect()
    by_url = {r["canonical_url"]: r for r in rows}
    # sf0.01 has 500 docs over 150 (doc_id % 150) targets -> exactly 150
    # canonical URLs, and no decoration survives normalization
    assert len(by_url) == 150
    for u, r in by_url.items():
        assert not u.startswith("www."), u
        assert "utm_" not in u and "#" not in u and "?" not in u, u
        assert not u.endswith("/"), u
        assert u == u.lower(), u
        # kept_id is the minimum doc_id of the group: doc_id % 150 == k
        k = r["kept_id"]
        assert k < 150, r
        assert f"ex{k}.example.com/p/{k}" == u


# ---------------------------------------------------------------- chunking


def test_chunk_overlap_window_and_stride(spark):
    from gdxpy_spark.tables import table

    out = ALL["llm_chunk_overlap"].fn(spark, SF_DIR)
    rows = out.filter(F.col("doc_id") == 1).orderBy("chunk_idx").collect()
    toks = [
        t
        for t in table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") == 1)
        .first()["text"]
        .split(" ")
        if t
    ]
    assert rows, "doc 1 produced no chunks"
    for r in rows:
        start = r["chunk_start"]
        assert start == r["chunk_idx"] * 24
        want = toks[start : start + 32]
        assert r["chunk_text"].split(" ") == want
        assert r["n_tok"] == len(want)
    # stride < window => consecutive chunks share exactly W-S=8 tokens
    # (full chunks only; the tail chunk is shorter by contract)
    for a, b in zip(rows, rows[1:]):
        if a["n_tok"] == 32:
            assert a["chunk_text"].split(" ")[24:] == b[
                "chunk_text"
            ].split(" ")[: min(8, b["n_tok"])]


def test_chunk_overlap_covers_every_token(spark):
    # union of [start, start+n_tok) must cover [0, n_tokens) per doc
    out = ALL["llm_chunk_overlap"].fn(spark, SF_DIR)
    cov = (
        out.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_start") + F.col("n_tok")).alias("hi"),
            F.min("chunk_start").alias("lo"),
        )
        .collect()
    )
    from gdxpy_spark.tables import table

    ntok = {
        r["doc_id"]: r["n"]
        for r in table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            F.size(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("n"),
        )
        .collect()
    }
    assert cov
    for r in cov:
        assert r["lo"] == 0
        assert r["hi"] == ntok[r["doc_id"]]


# ---------------------------------------------------------------- ts ops


def test_interpolate_observed_hours_keep_their_mean(spark):
    lerp = ALL["ts_interpolate"].fn(spark, SF_DIR)
    gap = ALL["ts_gap_fill"].fn(spark, SF_DIR)
    j = (
        lerp.filter(F.col("n_events") > 0)
        .select("user_id", "hour", "value_lerp")
        .join(
            gap.filter(F.col("n_events") > 0).select(
                "user_id", "hour", "value_ffill"
            ),
            ["user_id", "hour"],
        )
    )
    bad = j.filter(
        F.abs(F.col("value_lerp") - F.col("value_ffill")) > 1e-9
    ).count()
    assert bad == 0  # at observed hours lerp == ffill == the hourly mean


def test_interpolate_gap_values_lie_between_neighbors(spark):
    rows = (
        ALL["ts_interpolate"].fn(spark, SF_DIR)
        .orderBy("user_id", "hour")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for seq in by_user.values():
        obs = [i for i, r in enumerate(seq) if r["n_events"] > 0]
        for a, b in zip(obs, obs[1:]):
            lo = min(seq[a]["value_lerp"], seq[b]["value_lerp"])
            hi = max(seq[a]["value_lerp"], seq[b]["value_lerp"])
            for i in range(a + 1, b):
                v = seq[i]["value_lerp"]
                assert v is not None
                assert lo - 1e-9 <= v <= hi + 1e-9
                checked += 1
    assert checked > 0, "corpus produced no interior gaps to check"


def test_interpolate_has_no_unbounded_following_frame(spark):
    # Spark's UnboundedFollowing window frame is O(rows^2) per
    # partition (SCALE.md r7); the forward neighbor must run as a
    # running frame over DESC order instead
    plan = formatted_plan(ALL["ts_interpolate"].fn(spark, SF_DIR))
    assert "unboundedfollowing$()" not in plan.lower().replace(" ", "")


def test_zscore_null_under_min_history_and_flag_consistency(spark):
    rows = ALL["ts_zscore_anomaly"].fn(spark, SF_DIR).collect()
    assert rows
    n_spikes = 0
    for r in rows:
        if r["z"] is None:
            assert r["is_spike"] is None
        else:
            assert r["is_spike"] == (abs(r["z"]) > 2.5)
            n_spikes += bool(r["is_spike"])
    # per-type series are hundreds of hours at sf0.01: scored rows exist
    assert any(r["z"] is not None for r in rows)


def test_zscore_matches_python_recompute(spark):
    import math

    rows = (
        ALL["ts_zscore_anomaly"].fn(spark, SF_DIR)
        .filter(F.col("event_type") == "click")
        .orderBy("hour")
        .collect()
    )
    ms = [int(round(r["hourly_value"] * 100)) for r in rows]
    for i, r in enumerate(rows):
        w = ms[max(0, i - 23) : i + 1]
        n = len(w)
        if r["z"] is None:
            continue
        s, q = sum(w), sum(x * x for x in w)
        z = (n * ms[i] - s) / math.sqrt((n * q - s * s) * n / (n - 1.0))
        assert abs(z - r["z"]) < 1e-9, (r["hour"], z, r["z"])


def test_zscore_aggregates_before_window(spark):
    # the window input must be the hourly rollup, not raw events: the
    # plan has a partial_count/partial_sum hash aggregate below the
    # Window operator
    plan = formatted_plan(ALL["ts_zscore_anomaly"].fn(spark, SF_DIR))
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)]
    win_ids = [int(m) for m in re.findall(r"\((\d+)\) Window", plan)]
    assert agg_ids and win_ids
    # lower node id = executes earlier: the rollup runs below the window
    assert max(agg_ids) < min(win_ids)
    assert "partial_sum" in plan  # map-side combine before the exchange
