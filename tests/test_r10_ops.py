"""Round-10 operator tests: WARC head-corruption resync, the TPC-H
decision-support spine completion (Q4/Q13/Q21/Q22 shapes), the served
(persisted-index) ANN path, and corpus-scale BPE apply."""

import pytest

from pyspark.sql import functions as F


# ---- llm_warc_parse: head-corruption resync (r9 advice) --------------------


def test_warc_leading_garbage_degrades_not_drops(spark):
    """A container with leading garbage before the first version line
    must parse every well-formed record after the garbage — the old
    fold initialized nxt=1 (accept only a position-0 boundary) and
    silently yielded ZERO records for the whole container. Head
    corruption now enters resync mode like mid-container corruption:
    one corrupt head costs the head bytes, not the container."""
    from gdxpy_spark.operators.llm import parse_warc_containers

    body1 = "first body survives"
    body2 = "second too"
    container = (
        "GARBAGE bytes, not a version line\n"
        f"WARC/1.0\nWARC-Record-ID: 1\nContent-Chars: {len(body1)}\n\n{body1}\n"
        f"WARC/1.0\nWARC-Record-ID: 2\nContent-Chars: {len(body2)}\n\n{body2}\n"
    )
    raw = spark.createDataFrame([(container,)], "value string")
    got = {r.doc_id: (r.len_ok, r.n_tokens) for r in
           parse_warc_containers(raw).collect()}
    assert got == {1: (True, 3), 2: (True, 2)}


def test_warc_clean_head_still_exact(spark):
    """Regression guard for the resync-init change: a clean container
    (starts exactly with the version line) parses identically."""
    from gdxpy_spark.operators.llm import parse_warc_containers

    body = "alpha beta"
    container = (
        f"WARC/1.0\nWARC-Record-ID: 9\nContent-Chars: {len(body)}\n\n{body}\n"
    )
    raw = spark.createDataFrame([(container,)], "value string")
    rows = parse_warc_containers(raw).collect()
    assert [(r.doc_id, r.len_ok, r.n_tokens) for r in rows] == [(9, True, 2)]


# ---- TPC-H spine completion: plan-shape assertions --------------------------

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    from gdxpy_spark.plans.inspect import formatted_plan
    from gdxpy_spark.registry import all_queries

    return formatted_plan(all_queries()[name].fn(spark, SF_DIR))


def test_q4_exists_is_semi_join_not_bnlj(spark):
    """The EXISTS must decorrelate to ONE left-semi join on orderkey
    (the correlated date predicate riding as a join condition) — never
    a per-row BroadcastNestedLoop probe."""
    plan = _plan(spark, "tpch_q4_shape")
    assert "LeftSemi" in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_q13_never_broadcasts_the_fact_side(spark):
    """Q13's orders side is fact-sized at every real scale: the MERGE
    hint pins a SortMergeJoin so the plan that passes at sf0.01 is the
    plan that survives sf1000 — a BroadcastHashJoin here would mean
    AQE built a hash table out of the fact table."""
    plan = _plan(spark, "tpch_q13_shape")
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "LeftOuter" in plan, plan


def test_q21_decorrelates_to_aggregates(spark):
    """Q21's EXISTS/NOT-EXISTS pair must become per-order aggregates
    (n_supp / n_late_supp), not correlated per-row probes: the plan
    has hash aggregates and equi-joins only."""
    plan = _plan(spark, "tpch_q21_shape")
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q22_anti_join_and_scan_side_date_filter(spark):
    """NOT EXISTS must be a LeftAnti equi-join on custkey, and the
    lapsed-window date predicate must sit on the orders SCAN (pushed
    below the join), not above the anti join where it would change
    semantics."""
    from gdxpy_spark.plans.inspect import pushed_filters

    import re

    plan = _plan(spark, "tpch_q22_shape")
    assert "LeftAnti" in plan, plan
    # the only BNLJ allowed is the 1-row threshold broadcast cross
    # (formatted explain lists each operator twice: tree + "(n) Op")
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1, plan
    from gdxpy_spark.registry import all_queries

    df = all_queries()["tpch_q22_shape"].fn(spark, SF_DIR)
    pf = pushed_filters(df)  # newline-joined "PushedFilters: [...]" lines
    assert "o_orderdate" in pf, pf


# ---- llm_ann_ivf_served: build-once / query-many ----------------------------


def test_ivf_served_equals_rebuild_variant(spark):
    """Same spec (k=_ivf_k(n), md5-seeded Lloyd, nprobe=2) from a
    persisted index must reproduce llm_ann_ivf's rebuild-per-query
    results exactly."""
    from gdxpy_spark.registry import all_queries

    ALL = all_queries()
    served = sorted(
        tuple(r) for r in ALL["llm_ann_ivf_served"].fn(spark, SF_DIR).collect()
    )
    rebuilt = sorted(
        tuple(r) for r in ALL["llm_ann_ivf"].fn(spark, SF_DIR).collect()
    )
    assert served and served == rebuilt


def test_ivf_served_never_refits_at_query_time(spark, monkeypatch):
    """The production serving contract: once the index exists, the
    query path must not contain a quantizer fit. Poison the Lloyd fit
    (r12: _kmeans_fit/_lloyd_ivf_fit replaced MLlib behind the index)
    after ensuring the index — the served query must still run."""
    from gdxpy_spark.operators import llm
    from gdxpy_spark.registry import all_queries

    llm._ensure_ivf_index(spark, SF_DIR)  # build (or reuse) the index

    def _boom(*a, **k):
        raise AssertionError("quantizer fit called on the serving path")

    monkeypatch.setattr(llm, "_kmeans_fit", _boom)
    monkeypatch.setattr(llm, "_lloyd_ivf_fit", _boom)
    rows = all_queries()["llm_ann_ivf_served"].fn(spark, SF_DIR).collect()
    assert len(rows) > 0


def test_ivf_index_layout_is_cell_partitioned(spark):
    """The persisted index must be partitioned by cell so a probe scan
    prunes unprobed cells at file level."""
    import os

    from gdxpy_spark.operators.llm import _ensure_ivf_index

    idx = _ensure_ivf_index(spark, SF_DIR)
    cells = os.listdir(os.path.join(idx, "cells"))
    assert sum(1 for d in cells if d.startswith("cell=")) >= 2
    assert os.path.exists(os.path.join(idx, "centers", "_SUCCESS"))


# ---- llm_bpe_apply: corpus-scale encoding vs pure-Python reference ---------


def test_bpe_apply_matches_reference_tokenizer(spark):
    """Encoding with the learned merge table must reproduce the
    pure-Python reference BPE apply EXACTLY for every document — token
    totals and fertility, not a sample."""
    from tests.test_r8_ops import _ref_bpe
    from gdxpy_spark.registry import all_queries

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    wf: dict[str, int] = {}
    for r in docs:
        for w in r["text"].split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    merges = _ref_bpe(wf, 10)

    # reference APPLY: greedy left-to-right merge passes per word
    def encode(word: str) -> int:
        syms = list(word)
        for _step, l, r, _cnt in merges:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms = out
        return len(syms)

    from decimal import ROUND_HALF_UP, Decimal

    n_tok = {w: encode(w) for w in wf}
    expect = {}
    for r in docs:
        words = [w for w in r["text"].split(" ") if w]
        if not words:
            continue
        toks = sum(n_tok[w] for w in words)
        # Spark F.round is HALF_UP on the double's shortest decimal;
        # Python round() is banker's — 121/32 = 3.78125 exposes it
        fert = float(
            Decimal(repr(toks / len(words))).quantize(
                Decimal("0.0001"), ROUND_HALF_UP
            )
        )
        expect[r["doc_id"]] = (len(words), toks, fert)

    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["fertility"])
        for r in all_queries()["llm_bpe_apply"].fn(spark, SF_DIR).collect()
    }
    assert got == expect


def test_bpe_apply_broadcasts_the_vocabulary(spark):
    """The vocab join must be a broadcast hash join — a sort-merge join
    here shuffles the full corpus token stream AND skews on stopwords."""
    from gdxpy_spark.plans.inspect import formatted_plan
    from gdxpy_spark.registry import all_queries

    plan = formatted_plan(all_queries()["llm_bpe_apply"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# ---- llm_span_corruption: masking-geometry semantics ------------------------


def test_span_corruption_geometry(spark):
    """Each 20-token block corrupts at most one 3-token span, the span
    offset is in [0, 17] (never straddles the block boundary), and the
    corpus-wide corruption rate sits near the 15% design point. Value
    equality vs the SQL twin is covered by oracle parity; this pins
    the GEOMETRY the hash recipe is supposed to produce."""
    from gdxpy_spark.registry import all_queries

    rows = all_queries()["llm_span_corruption"].fn(spark, SF_DIR).collect()
    assert rows
    tot_t = sum(r["n_tokens"] for r in rows)
    tot_c = sum(r["n_corrupted"] for r in rows)
    for r in rows:
        n_blocks = (r["n_tokens"] - 1) // 20 + 1
        assert r["n_spans"] <= n_blocks, r
        assert r["n_corrupted"] <= 3 * r["n_spans"], r
        # full blocks always host a complete span: >= blocks-1 spans
        assert r["n_spans"] >= (r["n_tokens"] // 20) - 1 >= -1
    assert 0.10 <= tot_c / tot_t <= 0.20, tot_c / tot_t


# ---- wave 3: z-order layout + Holt smoother ---------------------------------


def test_zorder_bit_math_against_python_reference(spark):
    """The morton spread/compact constants are pinned against a pure-
    Python third source (the fn_ip_cidr lesson: the SQL oracle twin
    shares the constants and cannot catch one copied wrong)."""
    from gdxpy_spark.registry import all_queries

    def spread(v):
        v &= 0xFFFF
        v = (v | v << 8) & 0x00FF00FF
        v = (v | v << 4) & 0x0F0F0F0F
        v = (v | v << 2) & 0x33333333
        v = (v | v << 1) & 0x55555555
        return v

    rows = all_queries()["fn_zorder"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["z"] == (spread(r["ux"]) | spread(r["tb"]) << 1), r
        assert (r["ux_back"], r["tb_back"]) == (r["ux"], r["tb"]), r


def test_zorder_layout_clusters_both_dimensions(spark):
    """The persisted z-ordered layout must actually CLUSTER: each file's
    user_id span should cover a fraction of the domain (a time-only
    sort would give every file the full user range, killing user-side
    row-group pruning). Also both 2-D predicates must reach the scan."""
    import glob
    import os
    import tempfile

    from gdxpy_spark.registry import all_queries

    all_queries()["src_parquet_zorder"].fn(spark, SF_DIR)  # ensure built
    base = os.path.join(tempfile.gettempdir(), "gdxpy_spark_io")
    dirs = sorted(glob.glob(os.path.join(base, "zorder_v1_sf0.001_*")))
    assert dirs, "persisted z-order layout missing"
    import pyarrow.parquet as pq

    spans = []
    lo_all, hi_all = None, None
    for f in glob.glob(os.path.join(dirs[-1], "*.parquet")):
        t = pq.read_table(f, columns=["user_id"])
        u = t.column("user_id").to_pylist()
        if not u:
            continue
        spans.append(max(u) - min(u))
        lo_all = min(lo_all, *u) if lo_all is not None else min(u)
        hi_all = max(hi_all, *u) if hi_all is not None else max(u)
    assert len(spans) >= 4
    domain = hi_all - lo_all
    # at least half the files must span < 80% of the user domain —
    # a non-clustering layout gives ~every file the full domain
    narrow = sum(1 for s in spans if s < 0.8 * domain)
    assert narrow >= len(spans) / 2, (spans, domain)


def test_holt_fold_matches_hand_recurrence(spark):
    """Pin the Holt recurrence itself (level/trend/forecast) against a
    pure-Python fold over one user's ordered values — a third source
    independent of the SQL twin's expression shape."""
    from gdxpy_spark.registry import all_queries

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        r["user_id"]: (r["n_events"], r["level"], r["trend"], r["forecast_1"])
        for r in all_queries()["ts_holt_winters"].fn(spark, SF_DIR).collect()
    }
    rows = sorted(
        ((r["user_id"], r["ts"], r["event_id"], float(r["value"]))
         for r in ev.collect()),
        key=lambda t: (t[0], t[1], t[2]),
    )
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)) + 0.0

    series: dict[int, list[float]] = {}
    for uid, _ts, _eid, x in rows:
        series.setdefault(uid, []).append(x)
    for uid, xs in series.items():
        l, t = xs[0], 0.0
        for x in xs[1:]:
            nl = 0.5 * x + 0.5 * (l + t)
            t = 0.25 * (nl - l) + 0.75 * t
            l = nl
        assert got[uid] == (len(xs), r6(l), r6(t), r6(l + t)), uid


def test_interval_overlap_is_equi_join_with_no_dedup(spark):
    """The overlap join must be a hash EQUI join on (key, bucket) — no
    BroadcastNestedLoop, no CartesianProduct — and no Deduplicate node:
    the canonical-bucket filter emits each pair exactly once by
    construction (value equality vs the inequality-join oracle is the
    no-duplicate proof; this pins the plan)."""
    plan = _plan(spark, "join_interval_overlap")
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Deduplicate" not in plan and "distinct" not in plan.lower(), plan
