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
