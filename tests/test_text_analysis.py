"""Semantic tests for the hash-based (weak) text/multimodal operators —
the oracle-checkable ones are covered by test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdxpy_spark import registry
from gdxpy_spark.tables import table
from tests.conftest import SF_DIR

ALL = registry.all_queries()


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory):
    """documents dir with guaranteed exact duplicates (the sf0.001 corpus
    has none): 5 texts re-inserted under doc_ids shifted by +100000."""
    docs = table(spark, SF_DIR, "documents")
    dupes = docs.orderBy("doc_id").limit(5).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    out = str(tmp_path_factory.mktemp("dupdocs"))
    docs.unionByName(dupes).coalesce(1).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return out


def test_simhash_identical_docs_collide(spark, dup_dir):
    """Exact-duplicate texts must produce identical signatures, land in
    the same band, and appear as hamming-0 pairs."""
    pairs = ALL["llm_simhash"].fn(spark, dup_dir)
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    for doc_id in range(5):
        assert found.get((doc_id, doc_id + 100000)) == 0, (
            f"exact dup pair {doc_id} missing or hamming > 0"
        )


def test_minhash_agrees_with_jaccard_direction(spark, dup_dir):
    """Exact-dup docs must share all 4 MinHash signature components."""
    sigs = {
        r["doc_id"]: (r["sig0"], r["sig1"], r["sig2"], r["sig3"])
        for r in ALL["llm_minhash_sig"].fn(spark, dup_dir).collect()
    }
    for doc_id in range(5):
        assert sigs[doc_id] == sigs[doc_id + 100000]


def test_feature_extract_shape_and_determinism(spark):
    df = ALL["mm_feature_extract"].fn(spark, SF_DIR)
    rows = {r["doc_id"]: r["feature"] for r in df.collect()}
    assert all(len(v) == 8 for v in rows.values())
    assert all(abs(sum(v) - 1.0) < 1e-3 for v in rows.values())  # normalized hist
    rows2 = {r["doc_id"]: r["feature"] for r in df.collect()}
    assert rows == rows2  # deterministic fake → stable across runs


def test_decode_real_is_a_marked_stub():
    import pytest

    from gdxpy_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(b"\x00", "png")


def test_connected_components_transitive_chain(spark):
    """A~B, B~C, D~E (A≁C directly) → components {A,B,C} and {D,E}."""
    from gdxpy_spark.operators.llm import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a BIGINT, doc_b BIGINT",
    )
    cc = {r["doc_id"]: r["component_id"] for r in connected_components(spark, edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_dedup_clusters_on_corpus(spark):
    """Every emitted (dup, kept) pair must be consistent: kept < dup, and
    kept is itself never a dup."""
    out = ALL["llm_dedup_clusters"].fn(spark, SF_DIR).collect()
    dups = {r["dup_id"] for r in out}
    keeps = {r["kept_id"] for r in out}
    assert all(r["kept_id"] < r["dup_id"] for r in out)
    assert not (dups & keeps), "a kept doc may not also be a duplicate"
