"""SURVEY §2.2 category K — LLM-data-pipeline operators.

Dedup, text analysis, and similarity search over the `documents` and
`embeddings` tables. These are the ops a 100 TB training-data pipeline
runs, so each docstring notes the scale path; MinHash/LSH variants live
here too (signature generation oracle-weak — hash functions are
engine-specific by nature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from gdxpy_spark.operators._util import davg, r4, sql_davg
from gdxpy_spark.registry import register
from gdxpy_spark.tables import table


@register(
    "llm_exact_dedup",
    oracle="""
SELECT sha256(text) AS text_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY sha256(text)
""",
    category="K",
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content hash → keep the smallest doc_id per hash.
    Scale: the groupBy shuffles 32-byte hashes + ids, never text bodies;
    Spark's partial aggregation collapses duplicates map-side first."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.sha2("text", 256).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@register(
    "llm_token_wordcount",
    oracle="""
SELECT token, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
WHERE token <> ''
GROUP BY token
""",
    category="K",
)
def llm_token_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequencies (split → explode → count). The explode
    multiplies rows before the shuffle, but partial aggregation collapses
    per-partition counts so the shuffle carries |vocab| rows per task."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "llm_tf",
    oracle="""
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents) t
  WHERE token <> ''
  GROUP BY doc_id, token)
SELECT doc_id, token AS top_token, cnt AS top_cnt
FROM (SELECT doc_id, token, cnt,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, token ASC) AS rn
      FROM tf) r
WHERE rn = 1
""",
    category="K",
)
def llm_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document term frequency; emit the top term per document
    (tiebreak: token ascending)."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("token").alias("top_token"), F.col("cnt").alias("top_cnt"))
    )


@register(
    "llm_doc_stats",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       {sql_davg('n_chars', 'avg_chars')},
       {sql_davg("len(string_split(text, ' '))", 'avg_tokens')}
FROM documents
GROUP BY lang
""",
    category="K",
)
def llm_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats: doc count, avg chars, avg token count —
    the quality-scoring primitives of a data pipeline."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        davg("n_chars", "avg_chars"),
        davg(F.size(F.split("text", " ")), "avg_tokens"),
    )


# --- cosine similarity machinery -------------------------------------------

def _with_norm(e: DataFrame) -> DataFrame:
    sq = F.transform(F.col("embedding"), lambda v: v.cast("double") * v.cast("double"))
    return e.withColumn(
        "norm", F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_COS_ORACLE = """
WITH e AS (SELECT vec_id, label, embedding,
                  sqrt(list_aggregate(list_transform(embedding,
                       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')) AS norm
           FROM embeddings)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.label,
       ROUND(SUM(CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                 * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE))
             / (a.norm * b.norm), 4) + 0.0 AS cos_sim
FROM e a
JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
CROSS JOIN generate_series(1, 64) AS t(i)
WHERE i <= len(a.embedding)
GROUP BY a.vec_id, b.vec_id, a.label, a.norm, b.norm
"""


@register("llm_cosine_pairs", oracle=_COS_ORACLE, category="K")
def llm_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity within each label block (vec_id_a <
    vec_id_b). Blocking by label keeps the self-join O(n²/blocks); the
    dot product is a JVM-side higher-order fold (zip_with + aggregate) —
    no Python in the hot path. At 100 TB the label would be an LSH/IVF
    bucket id from llm_minhash_sig-style hashing."""
    e = _with_norm(table(spark, sf_dir, "embeddings"))
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            F.col("a.label").alias("label"),
            (
                F.round(
                    _dot(F.col("a.embedding"), F.col("b.embedding"))
                    / (F.col("a.norm") * F.col("b.norm")),
                    4,
                )
                + F.lit(0.0)  # canonicalize -0.0 (see _util.r4z)
            ).alias("cos_sim"),
        )
    )


_KNN_ORACLE = """
WITH e AS (SELECT vec_id, label, embedding,
                  sqrt(list_aggregate(list_transform(embedding,
                       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')) AS norm
           FROM embeddings),
pairs AS (
  SELECT a.vec_id, b.vec_id AS nn_id,
         SUM(CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
             * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE))
           / (a.norm * b.norm) AS cos_sim
  FROM e a
  JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
  CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE i <= len(a.embedding)
  GROUP BY a.vec_id, b.vec_id, a.norm, b.norm
)
SELECT vec_id, nn_id, ROUND(cos_sim, 4) + 0.0 AS cos_sim
FROM (SELECT vec_id, nn_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, nn_id ASC) AS rn
      FROM pairs) t
WHERE rn = 1
"""


@register("llm_knn_topk", oracle=_KNN_ORACLE, category="K")
def llm_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 nearest neighbor per vector within its label block (brute
    force cosine + row_number). The baseline ANN path: exact within a
    block, blocks bounded — the IVF pattern where `label` is the coarse
    centroid assignment."""
    e = _with_norm(table(spark, sf_dir, "embeddings"))
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("nn_id"),
        (
            _dot(F.col("a.embedding"), F.col("b.embedding"))
            / (F.col("a.norm") * F.col("b.norm"))
        ).alias("cos_sim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("nn_id").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "nn_id",
            (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"),
        )
    )


# Fixed (a, b, p) permutation parameters — deterministic across runs.
_MINHASH_PERMS = [(1299721, 217645177), (15485863, 982451653),
                  (32452843, 57885161), (49979687, 715225739)]
_MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime; keeps a·crc32+b in-range)


def _perm_hash(a: int, b: int):
    """One-arg lambda factory (Spark binds higher-order-function lambdas
    by arity, so the permutation constants must be closed over)."""

    def f(t):
        return (F.crc32(t) * F.lit(a) + F.lit(b)) % F.lit(_MINHASH_P)

    return f


@register("llm_minhash_sig", oracle=None, category="K")  # weak: hash fns are engine-specific
def llm_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (4 permutations) per document over its distinct
    token set: sig_i = min over tokens of (a_i·crc32(token) + b_i mod p).
    Entirely JVM-side array math (transform + array_min) — per-doc cost
    is O(tokens × perms) with no shuffle at all; the LSH band join built
    on top is llm_length_blocking's bucket pattern. Weak-checked: CRC32
    keys are portable in principle but DuckDB exposes no matching hash."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tokens")
    )
    cols = []
    for i, (a, b) in enumerate(_MINHASH_PERMS):
        hashed = F.transform(F.col("tokens"), _perm_hash(a, b))
        cols.append(F.array_min(hashed).alias(f"sig{i}"))
    return toks.filter(F.size("tokens") > 0).select("doc_id", *cols)


_BLOCK_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, n_chars // 100 AS bucket,
         unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM tok a JOIN tok b
    ON a.bucket = b.bucket AND a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - n_common), 4)
           AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - n_common) >= 0.2
"""


def bitmask_jaccard_pairs(
    spark: SparkSession, items: DataFrame, threshold: float
) -> DataFrame:
    """Blocked exact set-Jaccard over (doc_id, bucket, token) rows via
    dictionary-encoded bitmasks.

    Token sets become fixed-width bitmasks (⌈|vocab|/64⌉ longs per doc),
    the pair join carries only (doc_id, bucket, n_tok, mask), and
    Jaccard = popcount(a AND b) / (n_a + n_b - popcount). Measured at
    sf0.1 this is ~3× faster than the exploded (bucket, token) join and
    ~8× faster than per-pair string array_intersect — the verify step is
    pure bit ops inside whole-stage codegen, and shuffled rows are a few
    dozen bytes regardless of document length. The dictionary is built
    with a row_number over the distinct vocabulary (dimension-sized
    here); a web-scale vocabulary would use a 64-bit token hash and
    b-bit signatures instead (accepting SimHash-style collisions). At
    100 TB the blocking key becomes MinHash bands (llm_minhash_sig) —
    same join shape, bounded block sizes."""
    vocab = items.select("token").distinct()
    n_vocab = vocab.count()  # tiny metadata job, sizes the bitmask width
    n_words = max(1, (n_vocab + 63) // 64)
    dic = vocab.select(
        "token", (F.row_number().over(W.orderBy("token")) - 1).alias("tid")
    )
    ids = (
        items.join(F.broadcast(dic), "token")
        .groupBy("doc_id", "bucket")
        .agg(F.collect_set("tid").alias("ids"), F.count("*").alias("n_tok"))
    )
    mask = F.expr(
        f"aggregate(ids, array_repeat(0L, {n_words}),"
        " (acc, id) -> transform(acc, (w, i) ->"
        "   CASE WHEN id div 64 = i THEN w | shiftleft(1L, CAST(id % 64 AS INT))"
        "        ELSE w END))"
    )
    # cache the per-doc masks: one row per doc (dimension-sized), but the
    # self-join would otherwise recompute the explode+dictionary+groupBy
    # lineage twice (measured ~30% of wall time at sf0.1)
    m = ids.select("doc_id", "bucket", "n_tok", mask.alias("mask")).cache()
    a = m.alias("a")
    b = m.alias("b")
    and_ = F.zip_with(F.col("a.mask"), F.col("b.mask"), lambda x, y: x.bitwiseAND(y))
    inter = F.aggregate(
        F.transform(and_, lambda x: F.bit_count(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    jac = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        (
            inter.cast("double") / (F.col("a.n_tok") + F.col("b.n_tok") - inter)
        ).alias("jaccard_raw"),
    )
    return jac.filter(F.col("jaccard_raw") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard")
    )


@register("llm_length_blocking", oracle=_BLOCK_ORACLE, category="K")
def llm_length_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates: block by length bucket (n_chars // 100), then
    token-set Jaccard ≥ 0.2 within a block (see bitmask_jaccard_pairs
    for the physical strategy)."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        (F.col("n_chars") / 100).cast("bigint").alias("bucket"),
        F.explode(F.array_remove(F.array_distinct(F.split("text", " ")), "")).alias(
            "token"
        ),
    )
    return bitmask_jaccard_pairs(spark, tok, 0.2)


_BRUTE_ORACLE = """
WITH e AS (SELECT vec_id, embedding,
                  sqrt(list_aggregate(list_transform(embedding,
                       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')) AS norm
           FROM embeddings),
pairs AS (
  SELECT a.vec_id, b.vec_id AS nn_id,
         SUM(CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
             * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE))
           / (a.norm * b.norm) AS cos_sim
  FROM e a
  JOIN e b ON a.vec_id <> b.vec_id
  CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE i <= len(a.embedding)
  GROUP BY a.vec_id, b.vec_id, a.norm, b.norm
)
SELECT vec_id, nn_id, ROUND(cos_sim, 4) + 0.0 AS cos_sim
FROM (SELECT vec_id, nn_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, nn_id ASC) AS rn
      FROM pairs) t
WHERE rn = 1
"""


@register("llm_knn_brute", oracle=_BRUTE_ORACLE, category="K")
def llm_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global brute-force nearest neighbor (no blocking) — the exact
    baseline every ANN variant (llm_knn_topk's IVF-style label blocks,
    llm_ann_lsh's hyperplane buckets) is measured against.

    Physical strategy: the embedding matrix is broadcast once and each
    partition computes its block's similarity rows with a single numpy
    (BLAS) matmul inside mapInPandas — O(n²·d) flops but no O(n²) join
    rows ever materialize (a join+HOF-fold formulation measured 33 s at
    sf0.1 vs ~2 s for the matmul). This is the standard pattern when one
    side fits in executor memory; at 100 TB the broadcast side is a
    sample or the IVF centroid table, never the full corpus."""
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = e.collect()
    rows.sort(key=lambda r: r["vec_id"])  # ties → smallest nn_id wins
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def nn(it):
        b_ids, b_mat, b_norms = bc.value
        index = {int(v): i for i, v in enumerate(b_ids)}
        for pdf in it:
            q = np.array(list(pdf["embedding"]), dtype=np.float64)
            qn = np.sqrt((q * q).sum(axis=1))
            cos = (q @ b_mat.T) / (qn[:, None] * b_norms[None, :])
            for row_i, vid in enumerate(pdf["vec_id"]):
                cos[row_i, index[int(vid)]] = -np.inf  # mask self
            best = cos.argmax(axis=1)  # first max → smallest nn_id on ties
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "nn_id": b_ids[best],
                    "cos_sim": np.round(cos[np.arange(len(best)), best], 4) + 0.0,
                }
            )

    return e.mapInPandas(nn, schema="vec_id BIGINT, nn_id BIGINT, cos_sim DOUBLE")


_EMBED_DEDUP_ORACLE = """
WITH e AS (SELECT vec_id, embedding,
                  sqrt(list_aggregate(list_transform(embedding,
                       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')) AS norm
           FROM embeddings),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         SUM(CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
             * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE))
           / (a.norm * b.norm) AS cos_sim
  FROM e a
  JOIN e b ON a.vec_id < b.vec_id
  CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE i <= len(a.embedding)
  GROUP BY a.vec_id, b.vec_id, a.norm, b.norm
)
SELECT vec_b AS dup_id, MIN(vec_a) AS kept_id,
       ROUND(MAX(cos_sim), 4) + 0.0 AS max_cos
FROM pairs WHERE cos_sim >= 0.4
GROUP BY vec_b
"""


@register("llm_embed_dedup", oracle=_EMBED_DEDUP_ORACLE, category="K")
def llm_embed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dedup: a vector is a duplicate if some
    lower-id vector has cosine ≥ τ (τ=0.4 here — this corpus's vectors
    are near-orthogonal, max pairwise cos ≈ 0.51, so only genuine
    near-pairs qualify); emit (dup_id, kept lower id, max_cos). The
    lower-id-survives rule is the same greedy rule as llm_exact_dedup's
    MIN(doc_id). Same broadcast-matmul strategy as llm_knn_brute; at
    scale the pair generation is LSH-bucketed (llm_ann_lsh) and the
    survivor rule is unchanged."""
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = e.collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def dedup(it):
        b_ids, b_mat, b_norms = bc.value
        for pdf in it:
            q = np.array(list(pdf["embedding"]), dtype=np.float64)
            qn = np.sqrt((q * q).sum(axis=1))
            cos = (q @ b_mat.T) / (qn[:, None] * b_norms[None, :])
            out = []
            for row_i, vid in enumerate(pdf["vec_id"]):
                lower = b_ids < int(vid)  # only lower-id vectors can keep
                hits = lower & (cos[row_i] >= 0.4)
                if hits.any():
                    out.append(
                        (
                            int(vid),
                            int(b_ids[hits].min()),
                            round(float(cos[row_i][hits].max()), 4) + 0.0,
                        )
                    )
            yield pd.DataFrame(out, columns=["dup_id", "kept_id", "max_cos"])

    return e.mapInPandas(
        dedup, schema="dup_id BIGINT, kept_id BIGINT, max_cos DOUBLE"
    )


def _lsh_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed-seed PRNG, ±1 entries)."""
    import random

    rng = random.Random(42)
    return [[rng.choice((-1.0, 1.0)) for _ in range(dim)] for _ in range(n_planes)]


@register("llm_ann_lsh", oracle=None, category="K")  # weak: approximate by design
def llm_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbor: 6 fixed random-
    hyperplane sign bits form the bucket key; candidate pairs form only
    within a bucket, then exact cosine + top-1 per vector. Recall
    against llm_knn_brute is a planted-near-duplicate test
    (tests/test_ann.py) — on this corpus's near-orthogonal vectors
    bucket collisions are rare by construction, which is precisely the
    property that makes the join linear-ish at 100 TB: E[pairs] =
    n²·P(collision), and P is driven down exponentially by adding bits."""
    e = _with_norm(table(spark, sf_dir, "embeddings"))
    planes = _lsh_planes(6, 64)
    sig = None
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        proj = F.aggregate(
            F.zip_with(F.col("embedding"), plane, lambda v, w: v.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseXOR(term)
    bucketed = e.withColumn("bucket", sig).cache()
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("nn_id"),
        (
            _dot(F.col("a.embedding"), F.col("b.embedding"))
            / (F.col("a.norm") * F.col("b.norm"))
        ).alias("cos_sim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("nn_id").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "nn_id",
            (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"),
        )
    )


@register("llm_ann_ivf", oracle=None, category="K")  # weak: approximate by design
def llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbor: k-means (MLlib, fixed seed)
    partitions the vectors into 16 coarse cells; each query probes its 2
    nearest centroids (nprobe=2) and runs exact cosine against the
    vectors indexed in those cells, then top-1 per query.

    This is the inverted-file layout at any scale: the index side is
    partitioned by cell (co-located, prunable), query fan-out is
    nprobe/k of the corpus, and recall is tuned by nprobe — measured in
    tests/test_ann.py against llm_knn_brute (~0.5 at nprobe=2 on this
    near-uniform corpus, ≈1.0 on planted near-duplicates, which is the
    distribution real dedup workloads have)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = table(spark, sf_dir, "embeddings").withColumn(
        "fvec", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=16, seed=42, featuresCol="fvec", predictionCol="cell").fit(e)
    indexed = _with_norm(
        model.transform(e).select("vec_id", "embedding", "cell")
    ).cache()

    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell INT, center ARRAY<DOUBLE>",
    )
    # nprobe=2: each query joins the 2 cells whose centroids are nearest
    dist = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("center"),
            lambda v, c: (v.cast("double") - c) * (v.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = W.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cell").asc())
    probes = (
        indexed.select("vec_id", "embedding", "norm")
        .crossJoin(F.broadcast(centers))
        .withColumn("d2", dist)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select("vec_id", "embedding", "norm", "cell")
    )
    q = probes.alias("q")
    x = indexed.alias("x")
    cand = q.join(
        x,
        (F.col("q.cell") == F.col("x.cell"))
        & (F.col("q.vec_id") != F.col("x.vec_id")),
    ).select(
        F.col("q.vec_id").alias("vec_id"),
        F.col("x.vec_id").alias("nn_id"),
        (
            _dot(F.col("q.embedding"), F.col("x.embedding"))
            / (F.col("q.norm") * F.col("x.norm"))
        ).alias("cos_sim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("nn_id").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "nn_id",
            (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"),
        )
    )


def connected_components(
    spark: SparkSession, edges: DataFrame, max_iters: int = 20
) -> DataFrame:
    """Connected components by iterative min-label propagation over an
    undirected edge list (cols: doc_a, doc_b) → (doc_id, component_id =
    min doc_id in the component).

    The loop is driver-side control flow over distributed joins: each
    round every node adopts the smallest label among itself and its
    neighbors; convergence is checked with a count of changed labels
    (label sums strictly decrease, so termination is guaranteed;
    max_iters bounds the O(diameter) rounds). localCheckpoint() cuts the
    lineage each round — without it the plan doubles per iteration and
    the job dies long before 100 TB. This is the non-SQL-expressible
    iterative shape (SURVEY §5: the driver records rows-only for it)."""
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(edges.select(F.col("doc_b"), F.col("doc_a")))
    nodes = sym.select(F.col("src").alias("doc_id")).distinct()
    labels = nodes.withColumn("label", F.col("doc_id")).localCheckpoint()
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("component_id"))


@register("llm_dedup_clusters", oracle=None, category="K")  # weak: iterative algorithm
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: connected components over the
    llm_length_blocking candidate graph (A~B and B~C put A,C in one
    cluster even when A≁C directly — the correct dedup semantics; the
    pairwise survivor rule under-merges chains). Output: every clustered
    doc with its component id (= kept doc); singletons omitted."""
    pairs = llm_length_blocking(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(spark, pairs)
    return cc.filter(F.col("doc_id") != F.col("component_id")).select(
        F.col("doc_id").alias("dup_id"), F.col("component_id").alias("kept_id")
    )
