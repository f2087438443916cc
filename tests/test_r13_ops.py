"""r13 operator tests: mm_phash_neardup (content-defined perceptual
near-dup on the media binary column) and the llm_semdedup_pq support
machinery not already covered in test_ann.py."""

from __future__ import annotations

import hashlib

import pytest

from gdxpy_spark import registry
from gdxpy_spark.tables import table
from tests.conftest import SF_DIR

ALL = registry.all_queries()
N_PLANT = 20


def _py_phash(t: str) -> int:
    """Pure-python third source of the 4-gram SimHash (the oracle is
    SQL, the engine is Spark — this pins both against a reference
    implementation on planted data)."""
    gs = {t[i : i + 4] for i in range(len(t) - 3)}
    v = [0] * 64
    for g in gs:
        h = int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
        for j in range(64):
            v[j] += 1 if (h >> j) & 1 else -1
    return sum((1 << j) for j in range(64) if v[j] > 0)


@pytest.fixture(scope="module")
def phash_planted_dir(spark, tmp_path_factory):
    """documents dir with planted media near-copies:
    - doc 200000+i = doc i's text + a 4-char trailer (the corpus's own
      re-encode perturbation shape, i in 0..N_PLANT),
    - doc 300000+i = doc i's text EXACTLY (identical payload wrapped in
      a different container header — media_table derives the header
      from doc_id, i in 0..4)."""
    base = (
        table(spark, SF_DIR, "documents")
        .filter("n_chars >= 64")
        .orderBy("doc_id")
        .limit(N_PLANT)
        .collect()
    )
    rows = [
        (r["doc_id"], r["text"], r["n_chars"])
        for r in table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    ]
    for i, r in enumerate(base):
        t2 = r["text"] + " re."
        rows.append((200000 + r["doc_id"], t2, len(t2)))
        if i < 5:
            rows.append((300000 + r["doc_id"], r["text"], r["n_chars"]))
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, n_chars INT")
    out = str(tmp_path_factory.mktemp("phash_planted"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


@pytest.mark.slow
def test_phash_banded_join_is_exact_vs_brute_force(spark, phash_planted_dir):
    """The pigeonhole claim, pinned on data with real near-pairs: the
    4-band join's output must EQUAL the all-pairs hamming<=3 set over
    the pure-python signatures — no pair lost to banding, none added."""
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in ALL["mm_phash_neardup"].fn(spark, phash_planted_dir).collect()
    }
    docs = (
        table(spark, phash_planted_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    sigs = {r["doc_id"]: _py_phash(r["text"]) for r in docs if len(r["text"]) >= 4}
    ids = sorted(sigs)
    want = {}
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want


def test_phash_identical_payload_different_container_hamming0(
    spark, phash_planted_dir
):
    """A byte-identical payload re-wrapped in a different container
    header (different doc_id => different fmt/width header fields) must
    pair at hamming 0 — the hash reads only payload bytes, and
    hamming 0 <= t is ALWAYS found (pigeonhole needs no luck at 0)."""
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in ALL["mm_phash_neardup"].fn(spark, phash_planted_dir).collect()
    }
    base = (
        table(spark, SF_DIR, "documents")
        .filter("n_chars >= 64")
        .orderBy("doc_id")
        .limit(5)
        .collect()
    )
    for r in base:
        assert got.get((r["doc_id"], 300000 + r["doc_id"])) == 0


def test_phash_trailer_neardup_recall_floor(spark, phash_planted_dir):
    """Calibrated t=3 operating point on the re-encode perturbation the
    corpus itself plants (payload + 4-byte trailer). Measured: a 4-char
    trailer moves 4 shingles, flipping bits where |vote| < 4 — on this
    corpus's ~300-byte payloads that lands 10/20 synthetic pairs within
    t=3 (and 19/22 of the corpus's own planted pairs, which the
    all-pairs ORACLE certifies every round). Pin a >=8/20 floor so a
    hash regression (changed shingle width, broken vote sign — both
    push hamming to ~32) fails loudly while the distribution's
    straddle of t doesn't."""
    got = {
        (r["doc_a"], r["doc_b"])
        for r in ALL["mm_phash_neardup"].fn(spark, phash_planted_dir).collect()
    }
    base = (
        table(spark, SF_DIR, "documents")
        .filter("n_chars >= 64")
        .orderBy("doc_id")
        .limit(N_PLANT)
        .collect()
    )
    hits = sum(1 for r in base if (r["doc_id"], 200000 + r["doc_id"]) in got)
    assert hits >= 8, f"trailer near-dup recall {hits}/{N_PLANT}"


@pytest.mark.slow
def test_phash_head_digest_blindspot_is_covered(spark, phash_planted_dir):
    """The division of labor vs mm_exact_dedup, stated as a test: a
    MID-PAYLOAD single-byte edit defeats the 128-byte head digest only
    when it lands in the head — while the content hash degrades
    gracefully (a 1-char edit moves ~8 shingles => usually hamming<=6).
    Verify the planted trailer copies are INVISIBLE to a full-payload
    equality (they differ) yet found by phash, i.e. the op adds pairs
    no exact digest emits."""
    sd = ALL["mm_phash_neardup"].fn(spark, phash_planted_dir)
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, phash_planted_dir, "documents").collect()
    }
    rows = sd.collect()
    assert any(docs[r["doc_a"]] != docs[r["doc_b"]] for r in rows), (
        "every emitted pair is byte-identical — the perceptual hash adds "
        "nothing over exact dedup on this corpus"
    )


def test_kmeans_assign_blas_matches_join_path(spark):
    """_kmeans_assign's two physical strategies (codegen'd equi-join at
    k<=64, broadcast-BLAS mapInPandas above) must produce the SAME
    assignment on the same centroids: run both shapes explicitly on
    sf0.01 embeddings with k=80 centroids (past the switch) and with
    k=20 (under it), comparing (vec_id, cell) exactly and d2 to 1e-9 —
    the accepted float-association ulp class."""
    from pyspark.sql import functions as F

    from gdxpy_spark.operators import llm

    e = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    ve = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    seeds = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(80)
        .select(F.transform("embedding", lambda v: v.cast("double")).alias("c"))
        .collect()
    )
    cents = [list(r["c"]) for r in seeds]
    for k in (20, 80):
        sub = cents[:k]
        # force each physical path regardless of the k switch
        saved = llm._KMEANS_JOIN_ASSIGN_MAX_K
        try:
            llm._KMEANS_JOIN_ASSIGN_MAX_K = 10 ** 9
            join_res = {
                r["vec_id"]: (r["cell"], r["d2"])
                for r in llm._kmeans_assign(spark, sub, ve, e).collect()
            }
            llm._KMEANS_JOIN_ASSIGN_MAX_K = 0
            blas_res = {
                r["vec_id"]: (r["cell"], r["d2"])
                for r in llm._kmeans_assign(spark, sub, ve, e).collect()
            }
        finally:
            llm._KMEANS_JOIN_ASSIGN_MAX_K = saved
        assert set(join_res) == set(blas_res)
        for vid, (cell, d2) in join_res.items():
            bcell, bd2 = blas_res[vid]
            assert bcell == cell, f"k={k} vec {vid}: join {cell} vs blas {bcell}"
            assert abs(bd2 - d2) <= 1e-9 * max(1.0, abs(d2)), (vid, d2, bd2)


def test_phash_clusters_oracle_cc_rounds_converged(duck):
    """The unrolled star-contraction depth must be converged: running
    the clusters oracle at _PHASH_CC_ROUNDS and at +1 rounds must give
    identical (dup_id, kept_id) sets (the _semdedup_oracle discipline
    applied to the phash dup graph)."""
    from gdxpy_spark.operators import multimodal as mm

    base = mm._phash_clusters_oracle()
    deeper_n = mm._PHASH_CC_ROUNDS + 1
    saved = mm._PHASH_CC_ROUNDS
    try:
        mm._PHASH_CC_ROUNDS = deeper_n
        deeper = mm._phash_clusters_oracle()
    finally:
        mm._PHASH_CC_ROUNDS = saved
    r1 = sorted(duck.execute(base).fetchall())
    r2 = sorted(duck.execute(deeper).fetchall())
    assert r1 == r2


@pytest.mark.slow
def test_phash_clusters_match_union_find_on_planted(spark, phash_planted_dir):
    """Groups must equal a pure-python union-find over the brute-force
    hamming<=3 pairs of the python signatures — third-source pin of
    pairs + CC together on data with real multi-member groups."""
    got = {
        (r["dup_id"], r["kept_id"])
        for r in ALL["mm_phash_clusters"].fn(spark, phash_planted_dir).collect()
    }
    docs = (
        table(spark, phash_planted_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    sigs = {r["doc_id"]: _py_phash(r["text"]) for r in docs if len(r["text"]) >= 4}
    ids = sorted(sigs)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {(i, find(i)) for i in ids if find(i) != i}
    assert got == want
