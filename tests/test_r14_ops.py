"""r14 operator tests: llm_substring_cut (the Lee-et-al rewrite stage),
mm_e2e_dedup (the three-tier media dedup funnel), and the phash
signature-cache reuse the r13 verdict asked for."""

from __future__ import annotations

from gdxpy_spark import registry
from tests.conftest import SF_DIR

ALL = registry.all_queries()


def test_substring_cut_consistent_with_dedup_stats(spark):
    """Cross-op pin (r13 verdict #4): llm_substring_cut's coverage must
    agree with llm_substring_dedup's measured statistics on the same
    corpus — dup_spans counts the duplicated START positions, and each
    start covers exactly k words, so per doc:

        dup_spans <= cut_words <= k * dup_spans   (union of k-windows)

    and the set of docs with anything cut IS the set with dup_spans>0."""
    from gdxpy_spark.operators.llm import _SUBSTR_K

    cut = {
        r["doc_id"]: r
        for r in ALL["llm_substring_cut"].fn(spark, SF_DIR).collect()
    }
    stats = {
        r["doc_id"]: r
        for r in ALL["llm_substring_dedup"].fn(spark, SF_DIR).collect()
    }
    # substring_dedup only emits docs with >= k words; cut emits all —
    # every doc in stats must be in cut, and shorter docs must be uncut
    assert set(stats) <= set(cut)
    n_dup_docs = 0
    for doc_id, c in cut.items():
        s = stats.get(doc_id)
        dup_spans = s["dup_spans"] if s else 0
        if dup_spans:
            n_dup_docs += 1
            assert dup_spans <= c["cut_words"] <= _SUBSTR_K * dup_spans, (
                doc_id,
                dup_spans,
                c["cut_words"],
            )
        else:
            assert c["cut_words"] == 0, doc_id
            assert c["n_words"] == len(c["clean_text"].split(" ")), doc_id
    assert n_dup_docs > 0, "corpus plants near-dups; expected some cuts"


def test_substring_cut_rebuilds_uncut_text_exactly(spark):
    """For an uncut doc, clean_text must be the space-normalized
    original (the excision machinery must not disturb kept words)."""
    from pyspark.sql import functions as F

    from gdxpy_spark.tables import table

    cut = ALL["llm_substring_cut"].fn(spark, SF_DIR)
    docs = table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.array_join(
            F.array_remove(F.split("text", " "), ""), " "
        ).alias("norm_text"),
    )
    mism = (
        cut.filter(F.col("cut_words") == 0)
        .join(docs, "doc_id")
        .filter(F.col("clean_text") != F.col("norm_text"))
        .count()
    )
    assert mism == 0


def test_mm_e2e_dedup_funnel_monotone(spark):
    """The survivor funnel must be monotone non-increasing through
    raw → exact → perceptual → semantic, anchored at the corpus size,
    and every tier must actually remove something on this corpus (it
    plants exact, perceptual, and semantic duplicates)."""
    from gdxpy_spark.tables import table

    rows = {
        r["stage"]: r["n_docs"]
        for r in ALL["mm_e2e_dedup"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {"raw", "exact", "perceptual", "semantic"}
    n_docs = table(spark, SF_DIR, "documents").count()
    assert rows["raw"] == n_docs
    assert rows["raw"] >= rows["exact"] >= rows["perceptual"] >= rows["semantic"]
    assert rows["semantic"] < rows["raw"], "no tier removed anything"


def test_phash_signature_subtree_is_shared(spark):
    """r13 verdict #2: the banded self-join must read the (doc_id,
    phash) signature frame from ONE materialization — both sides of
    the join (and mm_phash_clusters' pairs stage) scan the cached
    InMemoryRelation instead of rebuilding the scan→shingle→64-vote
    pipeline per subtree. Structural assertions: the cached scan
    appears on both join sides, and the raw documents scan appears at
    most once in the whole formatted plan (inside the cached plan),
    not once per side."""
    from tests.test_plans import formatted_plan

    plan = formatted_plan(ALL["mm_phash_neardup"].fn(spark, SF_DIR))
    assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
    assert plan.count("documents.parquet") <= 1, plan[:2000]
    spark.catalog.clearCache()

    # mm_phash_clusters' final plan is the CC star forest over a
    # localCheckpointed edge RDD (the signature work happens during the
    # contraction's materialization), so the shared subtree can't show
    # in its explain — instead pin the mechanism: building it registers
    # exactly ONE managed cache, the (doc_id, phash) signature frame.
    from gdxpy_spark.operators import _util

    _util.release_managed_caches()
    df = ALL["mm_phash_clusters"].fn(spark, SF_DIR)
    sigs = [c for c in _util._live_caches if set(c.columns) == {"doc_id", "phash"}]
    assert len(sigs) == 1, [c.columns for c in _util._live_caches]
    assert df.count() >= 0
    _util.release_managed_caches()
