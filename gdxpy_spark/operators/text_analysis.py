"""Training-data-pipeline text analysis (north star extensions beyond
SURVEY §2.2 K): language-ID, quality scoring, n-gram Jaccard near-dup,
document fingerprinting (rolling hash), SimHash near-dup.

All operators run over `documents`; oracle-checkable ones carry DuckDB
SQL, hash-based ones (SimHash with engine-native xxhash64) are weak with
semantic tests in tests/test_text_analysis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdxpy_spark.operators._util import (
    fan_out,
    managed_cache,
    r4,
    shuffle_partitions,
    word_shingles,
)
from gdxpy_spark.operators.llm import blocked_jaccard_auto
from gdxpy_spark.registry import register
from gdxpy_spark.tables import table

# ---------------------------------------------------------------------------
# language-ID: fixed marker-token profiles, argmax with deterministic
# tiebreak. On this synthetic corpus every "language" shares one English
# vocabulary, so the honest outcome is that en markers dominate — the
# operator's *shape* (per-profile hit counts → argmax) is what a real
# pipeline runs with real profiles (stopword lists / char n-gram models).
# ---------------------------------------------------------------------------
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "und", "das", "ein", "ist"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "un", "est"),
}


def _marker_sql(lang: str) -> str:
    toks = ", ".join(f"'{t}'" for t in _LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), t -> t IN ({toks})))"
    )


_LANG_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_marker_sql('en')} AS s_en,
         {_marker_sql('de')} AS s_de,
         {_marker_sql('es')} AS s_es,
         {_marker_sql('fr')} AS s_fr
  FROM documents)
SELECT doc_id, lang AS labeled_lang,
       CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
       CAST(s_es AS BIGINT) AS s_es, CAST(s_fr AS BIGINT) AS s_fr,
       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS predicted_lang
FROM scored
"""


@register("llm_lang_id", oracle=_LANG_ORACLE, category="K")
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-profile language ID: count profile-token hits per language,
    argmax with a fixed preference order as tiebreak. JVM-side array
    filter over the token array — no shuffle at all; at 100 TB this is a
    pure map stage that pipelines with the scan."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def member_of(markers):
        # single-arg lambda factory: a two-param lambda would be bound as
        # (element, index) by Spark's higher-order-function arity rules
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, member_of(markers))).cast("bigint")
        for lang, markers in _LANG_MARKERS.items()
    }
    d = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[c.alias(f"s_{lang}") for lang, c in scores.items()],
    )
    return d.withColumn(
        "predicted_lang",
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_fr")), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr"),
    )


# ---------------------------------------------------------------------------
# quality scoring: length / punctuation / stopword / repetition signals
# ---------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")
_SW_LIST = ", ".join(f"'{t}'" for t in _STOPWORDS)

_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '), x -> x IN ({_SW_LIST})))
             AS n_stop,
         len(list_distinct(string_split(text, ' '))) AS n_uniq,
         length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g'))
             AS n_nonalpha
  FROM documents)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
       ROUND(CAST(n_uniq AS DOUBLE) / n_tokens, 4) AS uniq_ratio,
       ROUND(CAST(n_nonalpha AS DOUBLE) / n_chars, 4) AS nonalpha_ratio,
       ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS avg_token_len,
       CASE WHEN n_tokens BETWEEN 20 AND 1000
             AND CAST(n_uniq AS DOUBLE) / n_tokens >= 0.2
            THEN 1 ELSE 0 END AS keep
FROM t
"""


@register("llm_doc_quality", oracle=_QUALITY_ORACLE, category="K")
def llm_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (the C4/Gopher-style rule family):
    token count, stopword ratio, unique-token ratio (repetition), non-
    alpha ratio, mean token length, and a keep/drop rule. Pure per-row
    expressions — a map-only stage that fuses with the scan at any
    scale; the `keep` flag is the pushdown-able filter a pipeline would
    apply before every downstream shuffle."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    n_uniq = F.size(F.array_distinct(toks))
    n_nonalpha = F.length("text") - F.length(
        F.regexp_replace("text", "[^a-z ]", "")
    )
    d = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        r4(n_stop.cast("double") / n_tokens, "stopword_ratio"),
        r4(n_uniq.cast("double") / n_tokens, "uniq_ratio"),
        r4(n_nonalpha.cast("double") / F.col("n_chars"), "nonalpha_ratio"),
        r4(F.col("n_chars").cast("double") / n_tokens, "avg_token_len"),
        F.when(
            n_tokens.between(20, 1000) & (n_uniq.cast("double") / n_tokens >= 0.2),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )
    return d


_QUALITY_FILTER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_uniq
  FROM documents)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM t
WHERE n_tokens BETWEEN 20 AND 1000
  AND CAST(n_uniq AS DOUBLE) / n_tokens >= 0.2
"""


@register("llm_quality_filter", oracle=_QUALITY_FILTER_ORACLE, category="K")
def llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter STAGE of a training-data pipeline: apply the
    llm_doc_quality keep-rule and emit only surviving documents. Plan
    shape matters more than the rule: the predicate is pure per-row
    expressions over scanned columns, so Catalyst fuses it with the
    parquet scan and every downstream operator (dedup, tokenize, pack)
    sees the reduced row count before any shuffle."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("bigint")
    n_uniq = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"),
        (n_uniq.cast("double") / n_tokens).alias("_uniq_ratio"),
    ).filter(
        F.col("n_tokens").between(20, 1000) & (F.col("_uniq_ratio") >= 0.2)
    ).drop("_uniq_ratio")


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the regex family GPT-2-style tokenizers apply before BPE merges.
# Portable subset: Java regex (Spark) and RE2 (DuckDB) agree on it.
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

_BPE_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_bpe,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       ROUND(CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS bpe_per_word
FROM documents
"""


@register("llm_token_bpe", oracle=_BPE_ORACLE, category="K")
def llm_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (letter runs /
    digit runs / punctuation singles — the GPT-2 pre-tokenize family)
    next to the whitespace word count, plus their ratio (the
    tokens-per-word fertility a pipeline uses for cost estimates).
    regexp_extract_all is JVM-side; map-only, fuses with the scan."""
    docs = table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    words = F.split("text", " ")
    n_bpe = F.size(bpe).cast("bigint")
    n_words = F.size(words).cast("bigint")
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe"),
        n_words.alias("n_words"),
        r4(n_bpe.cast("double") / n_words, "bpe_per_word"),
    )


_TFIDF_ORACLE = """
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents) t
  WHERE token <> ''
  GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS dfreq FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         ROUND(tf.cnt * ln(CAST(n.n_docs AS DOUBLE) / df.dfreq), 4) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n)
SELECT doc_id, token AS top_token, tfidf + 0.0 AS tfidf
FROM (SELECT doc_id, token, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, token ASC) AS rn
      FROM scored) r
WHERE rn = 1
"""


@register("llm_tfidf", oracle=_TFIDF_ORACLE, category="K")
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: per-doc term frequency × ln(N / document frequency); emit
    each document's top term (tiebreak: rounded score desc, token asc —
    ordering on the ROUNDED score keeps the window deterministic across
    engines whose ln() may differ in the last ulp). Shape: two shuffles
    (tf groupBy, df groupBy) + a broadcast of the scalar N; df is
    vocabulary-sized so the join is shuffle-on-token with map-side
    partial aggregation — the standard scalable TF-IDF plan."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("cnt") * F.log(F.col("n_docs").cast("double") / F.col("dfreq")),
                4,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("token").alias("top_token"),
            (F.col("tfidf") + F.lit(0.0)).alias("tfidf"),
        )
    )


_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
  FROM documents),
bi AS (
  -- per-row series via unnest(range(...)) so the bound is each doc's
  -- own token count, not a magic constant that would silently drop
  -- bigrams past it (generate_series can't take a subquery bound)
  SELECT doc_id, ts[CAST(i AS INT)] AS w1, ts[CAST(i AS INT) + 1] AS w2
  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks)),
cb AS (SELECT w1, w2, COUNT(*) AS nb FROM bi GROUP BY w1, w2),
cu AS (SELECT w1, COUNT(*) AS nu FROM bi GROUP BY w1),
scored AS (
  SELECT bi.doc_id, (cb.nb * 1000000) // cu.nu AS p6
  FROM bi JOIN cb USING (w1, w2) JOIN cu USING (w1))
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(CAST(p6 AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) / 1000000, 4) AS avg_predictability
FROM scored
GROUP BY doc_id
"""


@register("llm_bigram_score", oracle=_BIGRAM_ORACLE, category="K")
def llm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score: each document's average
    conditional bigram probability P(w₂|w₁) = C(w₁w₂)/C(w₁) under the
    corpus's own MLE bigram model — the n-gram-LM predictability signal
    (low score ⇒ unusual word transitions ⇒ gibberish/boilerplate
    candidates; the log-perplexity variant is the same plan with ln).
    Determinism: per-bigram probability is INTEGER-scaled to parts-per-
    million with integer division (exact on both engines — no float
    division inside the aggregate), then a DECIMAL-routed average.
    Shape: two corpus-count groupBys (vocab²- and vocab-sized), two
    shuffle joins back to the bigram stream, one per-doc aggregate —
    all map-side-combinable, no vocabulary ever on the driver."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_remove(F.split("text", " "), "").alias("ts")
    ).filter(F.size("ts") >= 2)  # sequence(1, 0) would DESCEND in Spark
    # zip_with over two whole-array slices beats the per-position
    # transform/element_at HOF ~2× (see _util.word_shingles; this site
    # needs (w1, w2) structs rather than joined strings, so it inlines
    # the same two-slice trick)
    m = F.size("ts") - 1
    bi = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("ts", 1, m),
                F.slice("ts", 2, m),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    cb = bi.groupBy("w1", "w2").agg(F.count("*").alias("nb"))
    cu = bi.groupBy("w1").agg(F.count("*").alias("nu"))
    scored = (
        bi.join(cb, ["w1", "w2"])
        .join(cu, ["w1"])
        .select(
            "doc_id",
            F.expr("(nb * 1000000) div nu").alias("p6"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            F.sum(F.col("p6").cast("decimal(18,6)")).cast("double")
            / F.count("*")
            / 1_000_000,
            4,
        ).alias("avg_predictability"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (r11)
# ---------------------------------------------------------------------------
_DSIR_ORACLE = """
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), t -> t <> '') AS ts
  FROM documents),
feats AS MATERIALIZED (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 4096 AS f
  FROM (
    SELECT doc_id, lang, unnest(ts) AS g FROM toks
    UNION ALL
    SELECT doc_id, lang,
           ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] AS g
    FROM (SELECT doc_id, lang, ts, unnest(range(1, len(ts))) AS i
          FROM toks WHERE len(ts) >= 2)
  )),
raw AS MATERIALIZED (SELECT f, COUNT(*) AS cr FROM feats GROUP BY f),
tgt AS MATERIALIZED (
  SELECT f, COUNT(*) AS ct FROM feats WHERE lang = 'en' GROUP BY f),
tots AS (SELECT (SELECT SUM(cr) FROM raw) AS tr,
                (SELECT COALESCE(SUM(ct), 0) FROM tgt) AS tt),
model AS MATERIALIZED (
  SELECT raw.f,
         CAST(ROUND((
           ln((CAST(COALESCE(ct, 0) AS DOUBLE) + 1.0) / (tt + 4096.0))
           - ln((CAST(cr AS DOUBLE) + 1.0) / (tr + 4096.0))
         ) * 1000000.0) AS BIGINT) AS q
  FROM raw LEFT JOIN tgt USING (f) CROSS JOIN tots)
SELECT doc_id,
       COUNT(*) AS n_feats,
       ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000000.0, 4) + 0.0
           AS dsir_logratio
FROM feats JOIN model USING (f)
GROUP BY doc_id
"""


@register("llm_dsir_weights", oracle=_DSIR_ORACLE, category="K")
def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the mean log-ratio of a TARGET distribution to the RAW corpus
    distribution over hashed n-gram features — the published recipe for
    selecting pretraining data that "looks like" a target domain
    without training a classifier. Here: features are word unigrams AND
    bigrams hashed into 4096 buckets (md5-u32 mod 4096 — the
    engine-portable hash family), the target is the `lang = 'en'`
    slice, both distributions add-1 smoothed over the bucket space.
    Downstream selection is `ORDER BY dsir_logratio` sampling (the
    paper resamples with Gumbel noise; the deterministic score is the
    data-card-citable part).

    Cross-engine exactness: per-feature log-ratios quantize once to
    integer micro-nats (the llm_perplexity_proxy discipline), so
    per-doc sums are order-independent integer arithmetic in both
    engines; only the final mean is a rounded double.

    Scale: the feature stream is 2 map-only explodes (no shuffle until
    the counts); raw/target counts are two partial-aggregable groupBys
    over a 4096-bucket space — the model table is KILOBYTES at any
    corpus size (that is the point of hashed features), broadcast back
    onto the stream; one per-doc partial agg ends it. The target slice
    never needs a second scan (conditional aggregation rides the same
    pass in the oracle; the engine's filter-join reuses the cached
    feature frame)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.array_remove(F.split("text", " "), "").alias("ts")
    )
    m = F.size("ts") - 1
    uni = toks.select("doc_id", "lang", F.explode("ts").alias("g"))
    big = (
        toks.filter(F.size("ts") >= 2)
        .select(
            "doc_id", "lang",
            F.explode(
                F.zip_with(
                    F.slice("ts", 1, m), F.slice("ts", 2, m),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("g"),
        )
    )
    feats = managed_cache(
        uni.unionByName(big).select(
            "doc_id", "lang",
            (
                F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("bigint")
                % F.lit(4096)
            ).alias("f"),
        )
    )
    raw = feats.groupBy("f").agg(F.count("*").alias("cr"))
    tgt = feats.filter(F.col("lang") == "en").groupBy("f").agg(
        F.count("*").alias("ct")
    )
    tots = raw.agg(F.sum("cr").alias("tr")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    )
    q = (
        F.log(
            (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(1.0))
            / (F.col("tt") + F.lit(4096.0))
        )
        - F.log(
            (F.col("cr").cast("double") + F.lit(1.0))
            / (F.col("tr") + F.lit(4096.0))
        )
    )
    model = (
        raw.join(tgt, "f", "left")
        .crossJoin(F.broadcast(tots))
        .select("f", F.round(q * F.lit(1000000.0), 0).cast("bigint").alias("q"))
    )
    return (
        feats.join(F.broadcast(model), "f")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            (
                F.round(
                    F.sum("q").cast("double") / F.count("*") / F.lit(1000000.0),
                    4,
                )
                + F.lit(0.0)
            ).alias("dsir_logratio"),
        )
    )


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram LM scoring (r11)
# ---------------------------------------------------------------------------
_KN_ORACLE = """
WITH toks AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
  FROM documents),
bi AS MATERIALIZED (
  SELECT doc_id, ts[CAST(i AS INT)] AS w1, ts[CAST(i AS INT) + 1] AS w2
  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
        FROM toks WHERE len(ts) >= 2)),
cb AS MATERIALIZED (
  SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
ctx AS MATERIALIZED (
  SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f FROM cb GROUP BY w1),
cont AS MATERIALIZED (
  SELECT w2, COUNT(*) AS n1r FROM cb GROUP BY w2),
tot AS (SELECT COUNT(*) AS b FROM cb),
model AS MATERIALIZED (
  SELECT cb.w1, cb.w2,
         CAST(ROUND(ln(
           (CAST(c12 AS DOUBLE) - 0.75) / c1
           + 0.75 * n1f / c1 * (CAST(n1r AS DOUBLE) / b)
         ) * 1000000.0) AS BIGINT) AS q
  FROM cb JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000000.0, 4) + 0.0
           AS kn_logp
FROM bi JOIN model USING (w1, w2)
GROUP BY doc_id
"""


@register("llm_kneser_ney", oracle=_KN_ORACLE, category="K")
def llm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram LM quality score (Kneser & Ney 1995;
    the estimator real n-gram LMs ship) — per document, the mean log
    P_KN(w₂|w₁) with absolute discount d = 0.75:

        P_KN(w₂|w₁) = (c(w₁w₂) − d)/c(w₁)
                      + d · N₁₊(w₁•)/c(w₁) · N₁₊(•w₂)/B

    where N₁₊(w₁•) is how many distinct words follow w₁, N₁₊(•w₂) —
    the CONTINUATION count — is how many distinct words precede w₂
    (the insight that separates KN from MLE/backoff: "Francisco" is
    frequent but only ever follows "San", so its continuation mass is
    tiny), and B is the distinct-bigram total. Trained on the corpus
    itself, so every scored bigram has c ≥ 1 > d and the max(·,0)
    clamp is vacuous. Complements llm_bigram_score (MLE — the r5
    predictability signal) and llm_perplexity_proxy (unigram): low KN
    score ⇒ improbable transitions ⇒ gibberish/boilerplate candidates.

    Cross-engine exactness: per-bigram log-probs are quantized ONCE to
    integer micro-nats (round(ln(P)·10⁶) → BIGINT — the
    llm_perplexity_proxy discipline), so per-doc sums are integer
    arithmetic, order-independent and identical in both engines; only
    the final mean is a rounded double. The inner P expression is
    written with the same association order in both engines.

    Scale: two corpus-count groupBys (vocab²- and vocab-sized), two
    metadata-sized stat joins to assemble the model table, the
    distinct-bigram total rides as a 1-row broadcast (never a driver
    collect), one shuffle join of the bigram stream against the model,
    one per-doc partial agg. Nothing quadratic, no windows, no
    vocabulary on the driver."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_remove(F.split("text", " "), "").alias("ts")
    ).filter(F.size("ts") >= 2)
    m = F.size("ts") - 1
    bi = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("ts", 1, m),
                F.slice("ts", 2, m),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    cb = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    ctx = cb.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1f")
    )
    cont = cb.groupBy("w2").agg(F.count("*").alias("n1r"))
    tot = cb.agg(F.count("*").alias("b"))
    p = (F.col("c12").cast("double") - F.lit(0.75)) / F.col("c1") + F.lit(
        0.75
    ) * F.col("n1f") / F.col("c1") * (F.col("n1r").cast("double") / F.col("b"))
    model = (
        cb.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2",
            F.round(F.log(p) * F.lit(1000000.0), 0).cast("bigint").alias("q"),
        )
    )
    return (
        bi.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (
                F.round(
                    F.sum("q").cast("double") / F.count("*") / F.lit(1000000.0),
                    4,
                )
                + F.lit(0.0)
            ).alias("kn_logp"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram (character trigram) Jaccard near-dup — same bitmask machinery as
# llm_length_blocking, different shingling function
# ---------------------------------------------------------------------------
_NGRAM_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id, n_chars // 100 AS bucket,
         unnest(list_distinct(list_transform(
             generate_series(1, length(text) - 2),
             i -> substr(text, CAST(i AS INT), 3)))) AS token
  FROM documents WHERE length(text) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM sh GROUP BY doc_id),
inter AS (
  -- abs(Δbucket) <= 1: adjacent-bucket probing, same pair set as the
  -- engine's probe-replica scheme (each doc probes buckets b and b+1)
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b
    ON abs(a.bucket - b.bucket) <= 1 AND a.token = b.token
       AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - n_common), 4)
           AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - n_common) >= 0.8
"""


@register("llm_ngram_jaccard", oracle=_NGRAM_ORACLE, category="K")
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram shingle Jaccard ≥ 0.8 within length buckets —
    the shingling used by classic near-dup (Broder) pipelines. Routes
    through blocked_jaccard_auto: per-bucket matmul (measured 3.8 s →
    1.6 s over the distributed bitmask path at sf0.1) while the bucket
    fits a task, automatic bitmask_jaccard_pairs fallback for buckets
    that outgrow one (trigram vocab is bounded by alphabet³, but bucket
    POPULATIONS grow with the corpus — the n_docs² bound is the one
    that trips at scale).

    fan_out (r14): the trigram pack explode is the pre-shuffle wall on
    the single-split toy scan (A/B 0.48x, OPTIMIZATION_r14.md)."""
    docs = fan_out(
        table(spark, sf_dir, "documents").filter(F.length("text") >= 3),
        spark,
    )
    # shingle via a char array + element_at: substring(text, i, 3) per
    # position is O(i) on UTF8 strings (quadratic per doc); splitting
    # once and indexing is O(1) per element (measured ~2× on the explode).
    # Trigrams are packed into ONE BIGINT instead of a 3-char string:
    # c1·2⁴² + c2·2²¹ + c3 over the per-char codepoints is INJECTIVE
    # (codepoints < 2²¹, max value < 2⁶³), so distinct-counts and
    # intersections — hence every Jaccard value — are identical to the
    # string form, while the arrays Arrow-transfer at 8 B/shingle and
    # factorize at integer speed (the string shingles were most of the
    # pandas-path cost at sf0.1).
    shingles = F.array_distinct(
        F.expr(
            "transform(sequence(1, length(text) - 2),"
            " i -> element_at(cc, i) * 4398046511104L"
            "      + element_at(cc, i + 1) * 2097152L"
            "      + element_at(cc, i + 2))"
        )
    )
    sh = (
        docs.withColumn("cs", F.split("text", ""))
        .withColumn(
            "cc", F.expr("transform(cs, c -> CAST(ascii(c) AS BIGINT))")
        )
        .select(
            "doc_id",
            (F.col("n_chars") / 100).cast("bigint").alias("native"),
            shingles.alias("tokens"),
        )
    )
    # adjacent-bucket (|Δbucket| ≤ 1) pairing and big-bucket routing both
    # happen inside blocked_jaccard_auto (native-mode input)
    return blocked_jaccard_auto(spark, sh, 0.8)


# ---------------------------------------------------------------------------
# document fingerprint: polynomial rolling hash over the character stream,
# portable modular arithmetic → oracle-checkable across engines
# ---------------------------------------------------------------------------
_FP_MOD = 2147483647  # 2^31-1: h*31 + c stays < 2^36, no int64 overflow
_FP_ORACLE = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(1, length(text)),
                          i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
         (acc, c) -> (acc * 31 + c) % {_FP_MOD}) AS fingerprint
FROM documents
"""


@register("llm_fingerprint", oracle=_FP_ORACLE, category="K")
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint: left-fold polynomial rolling
    hash h = (h·31 + charcode) mod 2³¹-1 over the character stream —
    identical arithmetic on both engines, so (unusually for a hash op)
    it is exact-oracle-checkable. Map-only.

    Physical strategy: the fold has the closed form
    Σ c_i·31^(n-1-i) mod p, which vectorizes — one Arrow batch becomes a
    single concatenated codepoint array (UTF-32 view), a shared modpow
    table, and one reduceat per batch. Pure integer math (codepoints ==
    DuckDB ascii() for every input), no per-row Python, and ~6× faster
    than the per-character interpreted higher-order fold it replaces
    (Spark HOFs don't whole-stage-codegen). The content-defined-chunking
    cut-points of a dedup pipeline are windows of exactly this hash.
    fan_out (r14): parallelizes the per-character fold across cores on
    the single-split toy scan (A/B 0.66x, OPTIMIZATION_r14.md)."""
    import numpy as np
    import pandas as pd

    docs = fan_out(
        table(spark, sf_dir, "documents").select("doc_id", "text"), spark
    )
    P = _FP_MOD

    def fp(it):
        for pdf in it:
            texts = ["" if t is None else t for t in pdf["text"]]
            lens = np.fromiter(
                (len(t) for t in texts), dtype=np.int64, count=len(texts)
            )
            out = np.zeros(len(texts), dtype=np.int64)  # empty fold = 0
            nz = lens > 0
            if nz.any():
                cat = np.frombuffer(
                    "".join(texts).encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                ends = np.cumsum(lens)
                exps = np.repeat(ends, lens) - 1 - np.arange(len(cat))
                mx = int(lens.max())
                pow31 = np.empty(mx, dtype=np.int64)
                pow31[0] = 1
                for k in range(1, mx):
                    pow31[k] = (pow31[k - 1] * 31) % P
                terms = (cat % P) * pow31[exps] % P  # < p² never formed: p < 2³¹
                starts = (ends - lens)[nz]
                out[nz] = np.add.reduceat(terms, starts) % P
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(dtype="int64"), "fingerprint": out}
            )

    return docs.mapInPandas(fp, schema="doc_id BIGINT, fingerprint BIGINT")


# ---------------------------------------------------------------------------
# SimHash near-dup (md5-based token hash — cross-engine, full oracle)
# ---------------------------------------------------------------------------
def _simhash_oracle() -> str:
    """DuckDB twin of llm_simhash, generated (64 vote aggregates + 64
    signature bit terms are mechanical). The token hash is the first 64
    bits of md5 assembled as hi·2³² + lo in UBIGINT — the same bit
    pattern Spark builds signed via shiftleft(hi,32)|lo, so vote bits,
    band equality (top-16 bits) and bit_count(xor) hammings all agree
    even though one engine is unsigned and the other two's-complement.
    Signature bits are summed as literal powers of two (DuckDB's <<
    overflows CHECKED at bit 63, so no shift is used here)."""
    votes = ",\n".join(
        f"  SUM(CASE WHEN ((hu >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(64)
    )
    sig = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j}::UBIGINT ELSE 0::UBIGINT END)"
        for j in range(64)
    )
    return f"""
WITH tok AS MATERIALIZED (
  SELECT DISTINCT doc_id, token
  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents)
  WHERE token <> ''
),
h AS MATERIALIZED (
  SELECT doc_id,
         CAST(('0x' || substr(md5(token), 1, 8)) AS UBIGINT) * 4294967296
         + CAST(('0x' || substr(md5(token), 9, 8)) AS UBIGINT) AS hu
  FROM tok
),
votes AS MATERIALIZED (
  SELECT doc_id,
{votes}
  FROM h GROUP BY doc_id
),
sig AS MATERIALIZED (SELECT doc_id, {sig} AS simhash FROM votes)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b
  ON (a.simhash >> 48) = (b.simhash >> 48) AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register("llm_simhash", oracle=_simhash_oracle(), category="K")
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: each distinct token votes ±1 on every
    bit of its 64-bit hash; the signature's bit j is 1 iff the vote sum
    is positive. Near-dup pairs are then hamming(sig_a, sig_b) ≤ 3,
    blocked by the top-16-bit band (identical docs always share the
    band, so exact dups are never missed; the band bound trades recall
    for the O(n²)→O(n²/2¹⁶) join cut, the standard SimHash table trick).

    Full value-hash oracle since r11 (was weak): the token hash is the
    first 64 bits of md5 (hi·2³²|lo — see _simhash_oracle for the
    signed/unsigned parity argument), which DuckDB computes
    identically; semantics additionally pinned in
    tests/test_text_analysis.py: exact-duplicate texts ⇒ identical
    signatures and hamming 0."""
    docs = table(spark, sf_dir, "documents")
    md5c = F.md5("token")
    hi = F.conv(F.substring(md5c, 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(md5c, 9, 8), 16, 10).cast("bigint")
    tok = docs.select(
        "doc_id",
        F.explode(F.array_remove(F.array_distinct(F.split("text", " ")), "")).alias(
            "token"
        ),
    ).withColumn("h", F.shiftleft(hi, 32).bitwiseOR(lo))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    sig = None
    for j in range(64):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseXOR(term)
    sigs = votes.select("doc_id", sig.alias("simhash"))

    banded = sigs.withColumn("band", F.shiftright("simhash", 48))
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        ham.cast("int").alias("hamming"),
    )
    return pairs.filter(F.col("hamming") <= 3)


@register(
    "llm_fuzzy_match",
    oracle="""
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_dist
FROM customer a JOIN customer b
  ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) = 1
""",
    category="K",
)
def llm_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy matching: customer-name pairs at edit
    distance exactly 1 (single-character typo family), blocked by the
    16-char name prefix so the candidate join is per-block quadratic
    instead of corpus-quadratic. Levenshtein is a JVM built-in on both
    engines; at scale the blocking key is a phonetic/q-gram signature
    with the same join shape.

    The probe side is explicitly round-robin repartitioned: this join's
    cost is CPU in the join CONDITION (one banded-DP Levenshtein per
    candidate pair), not bytes, and Spark's sizing is bytes-based — a
    small table broadcasts, AQE coalesces the streamed side to one
    partition, and all ~740k candidate probes (sf0.1) run in a single
    task (measured 3.6 s; 0.8 s with the spread). The repartition costs
    one linear shuffle of the streamed side, which the condition-bound
    probe amortizes at any scale."""
    n_parts = shuffle_partitions(spark)
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = c.repartition(n_parts).alias("a")
    b = c.alias("b")
    # threshold-bounded Levenshtein (banded DP, O(len·k) not O(len²));
    # returns -1 when distance > 1, so `== 1` keeps identical semantics
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"), 1)
    # edit distance 1 implies |len(a) − len(b)| ≤ 1: an O(1) length
    # prefilter in the join condition prunes candidate pairs before
    # the Levenshtein DP runs (exact — no recall change)
    len_ok = (
        F.abs(F.length(F.col("a.c_name")) - F.length(F.col("b.c_name"))) <= 1
    )
    return (
        a.join(
            b,
            (
                F.substring(F.col("a.c_name"), 1, 16)
                == F.substring(F.col("b.c_name"), 1, 16)
            )
            & (F.col("a.c_custkey") < F.col("b.c_custkey"))
            & len_ok,
        )
        .filter(dist == 1)
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            dist.cast("int").alias("edit_dist"),
        )
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
# local fingerprinting algorithm): portable modular arithmetic end to
# end, so unlike most fingerprint schemes it is exact-oracle-checkable
# ---------------------------------------------------------------------------
_WINNOW_K = 4   # words per gram
_WINNOW_W = 5   # gram-hash window per selected fingerprint
_WINNOW_B = 131  # gram combine base

_WINNOW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
  FROM documents),
wh AS (
  SELECT doc_id,
         list_transform(ts, w ->
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, length(w)),
                 i -> CAST(ascii(substr(w, CAST(i AS INT), 1)) AS BIGINT))),
             (acc, c) -> (acc * 31 + c) % {_FP_MOD})) AS hs
  FROM toks WHERE len(ts) >= {_WINNOW_K}),
grams AS (
  SELECT doc_id, CAST(i AS INT) AS i,
         (((hs[CAST(i AS INT)] * {_WINNOW_B}
            + hs[CAST(i AS INT) + 1]) % {_FP_MOD} * {_WINNOW_B}
            + hs[CAST(i AS INT) + 2]) % {_FP_MOD} * {_WINNOW_B}
            + hs[CAST(i AS INT) + 3]) % {_FP_MOD} AS g
  FROM (SELECT doc_id, hs, unnest(range(1, len(hs) - {_WINNOW_K - 2})) AS i
        FROM wh)),
win AS (
  SELECT doc_id, i,
         MIN(g) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN {_WINNOW_W - 1} PRECEDING AND CURRENT ROW)
           AS fp
  FROM grams)
SELECT DISTINCT doc_id, fp
FROM win WHERE i >= {_WINNOW_W}
"""


@register("llm_winnowing", oracle=_WINNOW_ORACLE, category="K")
def llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINNOWING fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
    algorithm): hash every k=4-word gram, slide a w=5-gram window, keep
    each window's MINIMUM hash — the selected set is a position-robust
    document sketch with two guarantees the paper proves: any shared
    run of ≥ w+k−1 words between two documents yields at least one
    SHARED fingerprint (detection), and at most 2/(w+1) of gram hashes
    are kept (density). It is the local-fingerprint complement to
    MinHash: MinHash answers "how similar are two docs overall",
    winnowing answers "which docs share a SPAN with this one" — the
    plagiarism/attribution primitive.

    All arithmetic is the portable (·31, mod 2³¹−1) fold of
    llm_fingerprint composed per word then per gram (base 131), so the
    selected VALUES are engine-independent and the oracle hash-checks
    them; emitting values (not positions) also makes window-tie
    handling irrelevant to the result.

    Physical strategy: word hashes, gram combination, and the sliding
    window-min all run VECTORIZED inside one Arrow batch (numpy
    reduceat for per-word folds — the HOF fold doesn't codegen, see
    llm_fingerprint — and a stride-view min for the windows); each doc
    is one independent row, so the whole sketch stage is map-only and
    embarrassingly parallel. The only shuffle is the final DISTINCT on
    (doc_id, fp) — two longs, the same reduce-before-shuffle shape as
    every dedup stage here. 100 TB: linear scan, sketch output ~2/(w+1)
    of gram count."""
    import numpy as np
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    P, K, W, B = _FP_MOD, _WINNOW_K, _WINNOW_W, _WINNOW_B

    def winnow(it):
        for pdf in it:
            out_doc: list[int] = []
            out_fp: list[int] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in (text or "").split(" ") if w]
                if len(words) < K:
                    continue
                # per-word portable fold, vectorized: one concatenated
                # codepoint array, reduceat at word starts
                lens = np.fromiter(
                    (len(w) for w in words), dtype=np.int64, count=len(words)
                )
                cat = np.frombuffer(
                    "".join(words).encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                ends = np.cumsum(lens)
                exps = np.repeat(ends, lens) - 1 - np.arange(len(cat))
                pow31 = np.empty(int(lens.max()), dtype=np.int64)
                pow31[0] = 1
                for j in range(1, len(pow31)):
                    pow31[j] = (pow31[j - 1] * 31) % P
                terms = (cat % P) * pow31[exps] % P
                hs = np.add.reduceat(terms, ends - lens) % P
                n_g = len(hs) - K + 1
                if n_g < W:
                    continue
                g = hs[:n_g].copy()
                for j in range(1, K):
                    g = (g * B + hs[j : j + n_g]) % P
                mins = np.lib.stride_tricks.sliding_window_view(g, W).min(
                    axis=1
                )
                fps = np.unique(mins)
                out_doc.extend([int(doc_id)] * len(fps))
                out_fp.extend(fps.tolist())
            yield pd.DataFrame({"doc_id": out_doc, "fp": out_fp})

    return docs.mapInPandas(winnow, schema="doc_id BIGINT, fp BIGINT").distinct()


_ZIPF_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
freq AS (
  SELECT tok, COUNT(*) AS freq FROM tok
  WHERE length(tok) > 0 GROUP BY tok),
pts AS (
  SELECT CAST(ROUND(ln(ROW_NUMBER() OVER (ORDER BY freq DESC, tok ASC))
              * 10000) AS BIGINT) AS x,
         CAST(ROUND(ln(freq) * 10000) AS BIGINT) AS y,
         freq
  FROM freq),
m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx,
         CAST(SUM(freq) AS BIGINT) AS n_tokens
  FROM pts)
SELECT n AS n_types, n_tokens,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0 AS zipf_slope
FROM m
"""


@register("llm_zipf_slope", oracle=_ZIPF_ORACLE, category="K")
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF FIT — the log-log OLS slope of the corpus token
    rank-frequency curve (natural text sits near −1; synthetic, boiler-
    plate-heavy, or deduplicated-to-death corpora drift off it — a
    one-number corpus-health gauge next to llm_doc_quality's per-doc
    scores). Frequencies come from one token groupBy; ranks from the
    two-pass global_row_number (NO single-partition window over the
    vocabulary); then both coordinates are QUANTIZED — round(ln·10⁴) —
    into exact BIGINTs so Σx, Σy, Σxy, Σx² are partial-aggregable
    integer sums and the final slope is ONE fixed double expression:
    identical bits on both engines (ln's last-ulp libm divergence is
    ~10⁻¹¹ of the 10⁻⁴ quantization step — it cannot flip a rounding).

    Scale: the corpus-sized work is the token count (map-side partial
    agg on the shingle-free split); everything after is vocabulary-
    sized. The per-type moments Σx, Σxy, Σx² are bigint partial sums
    (safe: x,y ≤ ~1.4·10⁵ at this quantization), but the n-scaled
    COMBINE n·Σx² wraps int64 already at ~10⁵ vocabulary types, so it
    runs in 128-bit lanes — decimal(38,0) here, DuckDB's SUM(BIGINT)
    is HUGEINT natively — the same discipline as agg_regression_ols."""
    from gdxpy_spark.operators._util import global_row_number

    docs = table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    ranked = global_row_number(
        freq, [("freq", "desc"), "tok"], out_col="rank"
    )
    pts = ranked.select(
        F.round(F.log(F.col("rank")) * 10000).cast("bigint").alias("x"),
        F.round(F.log(F.col("freq")) * 10000).cast("bigint").alias("y"),
        "freq",
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    return (
        pts.agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum("freq").alias("n_tokens"),
        )
        .select(
            F.col("n").alias("n_types"),
            "n_tokens",
            (
                F.round(
                    (n.cast("decimal(38,0)") * sxy
                     - sx.cast("decimal(38,0)") * sy).cast("double")
                    / (n.cast("decimal(38,0)") * sxx
                       - sx.cast("decimal(38,0)") * sx).cast("double"),
                    6,
                )
                + 0.0
            ).alias("zipf_slope"),
        )
    )


_BOILER_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
              || ' ' || t[i+4] AS g
  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 5)
SELECT g AS shingle,
       CAST(COUNT(*) AS BIGINT) AS df,
       MIN(doc_id) AS first_doc
FROM sh
GROUP BY g
HAVING COUNT(*) >= 2
"""


@register("llm_boilerplate_ngrams", oracle=_BOILER_ORACLE, category="K")
def llm_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOILERPLATE DETECTION — 5-gram shingles appearing in ≥2 DISTINCT
    documents, with document frequency and the earliest carrier: the
    corpus-level signal behind nav-bar / cookie-banner / template
    stripping (CCNet and RefinedWeb run exactly this shape at line
    granularity; this corpus has no line structure, so the shingle IS
    the unit). Per-doc shingling is in-array (word_shingles zip_with —
    no per-position slice allocation), the per-doc DISTINCT collapses
    within-document repeats map-side via array_distinct BEFORE the
    explode, and the df count is one partial-aggregable groupBy on the
    shingle. At 100 TB the groupBy key would be xxhash64(shingle) with
    the text kept only on the surviving ≥threshold rows (the exact
    swap llm_fingerprint makes); at test scale the text key keeps the
    oracle honest. fan_out (r14): the 5-gram shingle explode dominated
    the single-split scan stage (A/B 0.37x, OPTIMIZATION_r14.md)."""
    docs = fan_out(table(spark, sf_dir, "documents"), spark)
    t = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.when(F.size(t) >= 5, word_shingles(t, 5)).otherwise(
                    F.array().cast("array<string>")
                )
            )
        ).alias("shingle"),
    )
    return (
        grams.groupBy("shingle")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("df") >= 2)
    )


_VOCAB_COV_ORACLE = """
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tokn
  FROM documents),
tok2 AS (SELECT doc_id, source, tokn FROM tok WHERE tokn <> ''),
vocab AS (
  SELECT tokn FROM tok2 GROUP BY tokn HAVING COUNT(*) >= 100)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE v.tokn IS NULL) AS BIGINT) AS n_oov,
       ROUND(CAST(COUNT(*) FILTER (WHERE v.tokn IS NULL) AS DOUBLE)
             / COUNT(*), 6) + 0.0 AS oov_rate
FROM tok2 LEFT JOIN vocab v USING (tokn)
GROUP BY source
"""


@register("llm_vocab_coverage", oracle=_VOCAB_COV_ORACLE, category="K")
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY COVERAGE / OOV RATE per source — the tokenizer-fit
    gauge run before committing a vocab to a training mix (a source
    whose OOV rate spikes fragments into byte-fallback tokens and
    silently eats sequence budget). Vocab = tokens with corpus
    frequency ≥ 100 (a frequency floor, not a top-K: no global rank
    machinery needed, deterministic under ties by construction). The
    vocab table is vocabulary-sized, so the membership probe is an
    explicitly BROADCAST left join onto the token stream (the
    llm_perplexity_proxy lesson: Catalyst sort-merge-joins this and
    skews on hot tokens); the per-source rollup is one partial-agg
    groupBy. One corpus pass builds the vocab, one scores — both
    token-granular, neither shuffles text beyond the token column."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.filter(F.split("text", " "), lambda x: x != F.lit(""))).alias(
            "tokn"
        ),
    )
    vocab = (
        tok.groupBy("tokn")
        .agg(F.count("*").alias("_f"))
        .filter(F.col("_f") >= 100)
        .select("tokn", F.lit(1).alias("_inv"))
    )
    return (
        tok.join(F.broadcast(vocab), "tokn", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            (
                F.round(
                    F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0)).cast(
                        "double"
                    )
                    / F.count("*"),
                    6,
                )
                + F.lit(0.0)
            ).alias("oov_rate"),
        )
    )


_MLM_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
masked AS (
  SELECT doc_id, len(t) AS n_tokens,
         list_transform(range(1, len(t) + 1),
           i -> CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                  CAST(i AS VARCHAR) || ':' || t[i]), 1, 2)
                          < '26'
                     THEN '<mask>' ELSE t[i] END) AS m
  FROM toks)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(len(list_filter(m, x -> x = '<mask>')) AS BIGINT) AS n_masked,
       array_to_string(m, ' ') AS masked_text
FROM masked
"""


@register("llm_mlm_mask", oracle=_MLM_ORACLE, category="K")
def llm_mlm_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLM-STYLE DETERMINISTIC MASKING — replace ~15 % of tokens with a
    sentinel, selected by md5(doc_id:position:token) hex-prefix
    < '26' (0x26/0x100 ≈ 14.8 %): the masked-language-model corruption
    step, made REPRODUCIBLE — the mask is a pure function of the
    example, not an RNG stream, so re-runs, resumed jobs, and
    train/debug reads of the same doc mask identically (and the choice
    of hex-prefix comparison over modulo matches the registry's
    hash-sampling family: llm_hash_sample, llm_train_split).

    Everything stays IN-ARRAY: split → indexed transform → re-join; no
    explode, no shuffle at all — a map-only plan whose cost is one md5
    per token, embarrassingly parallel at any corpus size. Spark's
    transform index is 0-based and DuckDB's list positions are 1-based;
    both sides key the hash on the 1-BASED position."""
    docs = table(spark, sf_dir, "documents")
    t = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    mask_tok = lambda x, i: F.when(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"),
                    (i + 1).cast("string"), F.lit(":"), x,
                )
            ),
            1, 2,
        )
        < "26",
        F.lit("<mask>"),
    ).otherwise(x)
    return docs.select(
        "doc_id", F.transform(t, mask_tok).alias("m")
    ).select(
        "doc_id",
        F.size("m").cast("bigint").alias("n_tokens"),
        F.size(F.filter("m", lambda x: x == F.lit("<mask>")))
        .cast("bigint")
        .alias("n_masked"),
        F.array_join("m", " ").alias("masked_text"),
    )


_BM25_TERMS = ("spark", "hash", "window")
_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
tf AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS dl,
         CAST(len(list_filter(t, x -> x = 'spark')) AS BIGINT) AS tf1,
         CAST(len(list_filter(t, x -> x = 'hash')) AS BIGINT) AS tf2,
         CAST(len(list_filter(t, x -> x = 'window')) AS BIGINT) AS tf3
  FROM toks),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS BIGINT) AS sdl,
         CAST(COUNT(*) FILTER (WHERE tf1 > 0) AS BIGINT) AS df1,
         CAST(COUNT(*) FILTER (WHERE tf2 > 0) AS BIGINT) AS df2,
         CAST(COUNT(*) FILTER (WHERE tf3 > 0) AS BIGINT) AS df3
  FROM tf)
SELECT doc_id, dl, tf1, tf2, tf3,
       ROUND(
         ln((CAST(n AS DOUBLE) - df1 + 0.5) / (df1 + 0.5) + 1.0)
           * (tf1 * CAST(2.2 AS DOUBLE))
           / (tf1 + CAST(1.2 AS DOUBLE)
                    * (0.25 + 0.75 * dl * n / CAST(sdl AS DOUBLE)))
       + ln((CAST(n AS DOUBLE) - df2 + 0.5) / (df2 + 0.5) + 1.0)
           * (tf2 * CAST(2.2 AS DOUBLE))
           / (tf2 + CAST(1.2 AS DOUBLE)
                    * (0.25 + 0.75 * dl * n / CAST(sdl AS DOUBLE)))
       + ln((CAST(n AS DOUBLE) - df3 + 0.5) / (df3 + 0.5) + 1.0)
           * (tf3 * CAST(2.2 AS DOUBLE))
           / (tf3 + CAST(1.2 AS DOUBLE)
                    * (0.25 + 0.75 * dl * n / CAST(sdl AS DOUBLE)))
       , 4) + 0.0 AS bm25
FROM tf, stats
"""


@register("llm_bm25_score", oracle=_BM25_ORACLE, category="K")
def llm_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 RETRIEVAL SCORING against a fixed 3-term query — the lexical
    ranking function behind corpus search, hard-negative mining, and
    the retrieval side of RAG data curation (k1 = 1.2, b = 0.75,
    Robertson/Lucene idf = ln((N-df+0.5)/(df+0.5)+1)). Everything
    upstream of the final expression is EXACT integers: per-doc term
    frequencies and doc length are in-array counts (no explode), df/N/
    Σdl are one metadata-sized aggregate broadcast back as a 1-row
    cross join. The score itself is one fixed double expression —
    three idf·tf·norm terms added in literal order, never a float
    AGGREGATE — so both engines produce bit-identical doubles (same
    discipline as ts_interpolate/llm_token_budget; ROUND(.,4)+0.0
    absorbs the zero corner). The dl·n/Σdl length norm is written
    with ONE double division so no engine reassociates it.

    Scale: tf extraction is map-only and scan-fused; the stats row is
    broadcast; scoring is map-only — the whole plan is one corpus pass
    with a metadata aggregate, embarrassingly parallel. A multi-term /
    query-table variant becomes a broadcast join on term instead of
    three literal filters (llm_tfidf has that shape).

    fan_out (r15, VERDICT #6): the per-token array filters ran on the
    single-split test scan's one core in BOTH the stats and the
    scoring pass; alternated A/B 0.86x
    (plans/r15/probes/ab_fanout_tail.json), identity at production
    split counts like every fan_out site."""
    docs = fan_out(table(spark, sf_dir, "documents"), spark)
    t = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    t1, t2, t3 = _BM25_TERMS
    tf = docs.select(
        "doc_id",
        F.size(t).cast("bigint").alias("dl"),
        F.size(F.filter(t, lambda x: x == F.lit(t1))).cast("bigint").alias("tf1"),
        F.size(F.filter(t, lambda x: x == F.lit(t2))).cast("bigint").alias("tf2"),
        F.size(F.filter(t, lambda x: x == F.lit(t3))).cast("bigint").alias("tf3"),
    )
    stats = tf.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("sdl"),
        F.sum((F.col("tf1") > 0).cast("bigint")).cast("bigint").alias("df1"),
        F.sum((F.col("tf2") > 0).cast("bigint")).cast("bigint").alias("df2"),
        F.sum((F.col("tf3") > 0).cast("bigint")).cast("bigint").alias("df3"),
    )

    def term(tfc, dfc):
        idf = F.log(
            (F.col("n").cast("double") - F.col(dfc) + 0.5) / (F.col(dfc) + 0.5)
            + 1.0
        )
        norm = 0.25 + 0.75 * F.col("dl") * F.col("n") / F.col("sdl").cast(
            "double"
        )
        return idf * (F.col(tfc) * 2.2) / (F.col(tfc) + 1.2 * norm)

    return tf.join(F.broadcast(stats), F.lit(True)).select(
        "doc_id", "dl", "tf1", "tf2", "tf3",
        (
            F.round(term("tf1", "df1") + term("tf2", "df2") + term("tf3", "df3"), 4)
            + F.lit(0.0)
        ).alias("bm25"),
    )


_GOPHER_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
grams AS (
  SELECT doc_id, n, g
  FROM toks,
       (VALUES (2), (3), (4), (5), (6)) sizes(n),
       unnest(range(1, len(t) - n + 2)) AS u(i),
       LATERAL (SELECT array_to_string(t[i:i+n-1], ' ') AS g)
  WHERE len(t) >= n),
pg AS (
  SELECT doc_id, n, g, COUNT(*) AS m, CAST(length(g) AS BIGINT) AS gl
  FROM grams GROUP BY doc_id, n, g),
per_n AS (
  SELECT doc_id, n,
         CAST(SUM(m * gl) AS BIGINT) AS total_mass,
         CAST(MAX(m * gl) AS BIGINT) AS top_mass,
         CAST(COALESCE(SUM(m * gl) FILTER (WHERE m >= 2), 0) AS BIGINT)
           AS dup_mass
  FROM pg GROUP BY doc_id, n)
SELECT doc_id,
       ROUND(CAST(MAX(CASE WHEN n = 2 THEN top_mass END) AS DOUBLE)
             / MAX(CASE WHEN n = 2 THEN total_mass END), 4) + 0.0 AS top2_frac,
       ROUND(CAST(MAX(CASE WHEN n = 3 THEN top_mass END) AS DOUBLE)
             / MAX(CASE WHEN n = 3 THEN total_mass END), 4) + 0.0 AS top3_frac,
       ROUND(CAST(MAX(CASE WHEN n = 4 THEN top_mass END) AS DOUBLE)
             / MAX(CASE WHEN n = 4 THEN total_mass END), 4) + 0.0 AS top4_frac,
       ROUND(CAST(MAX(CASE WHEN n = 5 THEN dup_mass END) AS DOUBLE)
             / MAX(CASE WHEN n = 5 THEN total_mass END), 4) + 0.0 AS dup5_frac,
       ROUND(CAST(MAX(CASE WHEN n = 6 THEN dup_mass END) AS DOUBLE)
             / MAX(CASE WHEN n = 6 THEN total_mass END), 4) + 0.0 AS dup6_frac
FROM per_n
GROUP BY doc_id
HAVING COUNT(*) = 5
"""


@register("llm_gopher_rep_stats", oracle=_GOPHER_ORACLE, category="K")
def llm_gopher_rep_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOPHER REPETITION SIGNALS (Rae et al. 2021, table A1 family) —
    per document, the character-mass concentration of repeated n-grams:
    for n ∈ {2,3,4} the share held by the HEAVIEST n-gram (top_frac),
    for n ∈ {5,6} the share held by all DUPLICATED n-grams (dup_frac).
    Character mass of a gram = occurrences × gram string length; the
    top-gram is the one with the largest mass (a deterministic MAX over
    m·len — Gopher's 'most common n-gram' argmax is tie-ambiguous
    across engines, this is the same signal with a total order;
    occurrence mass double-counts overlapping coverage on both engines
    identically). Docs shorter than 6 tokens are excluded (no n=6
    row). llm_repetition_filter carries the position-counted bigram
    rule; this is the full multi-n character-weighted panel.

    Plan: ONE n-tagged explode for all five gram sizes, with each gram
    REPLACED BY (xxhash64(gram), length(gram)) BEFORE the explode —
    the within-doc occurrence counting only needs equality and the
    char mass only needs the length, so the two shuffles carry
    24-byte integer structs instead of up-to-6-word gram STRINGS (the
    llm_fingerprint swap; measured 9.1 s → 5.6 s at sf0.1 best-of-2 in
    one clean session, and at 100 TB the shuffle-byte ratio is the
    whole game). Both groupBys stay Tungsten hash aggregates with
    map-side partial combine. Collision honesty: a 64-bit collision
    WITHIN one (doc, n) group would merge two gram runs; groups are
    ≤ doc-length grams, so corpus-wide odds are ~m²·docs/2⁶⁵ ≈ 10⁻¹⁰
    here — and the hash is deterministic, so the text-keyed oracle
    differential would expose it loudly, not silently. (An in-array
    sorted-run fold with O(1) state — zero shuffles — was built and
    rejected: HOF evaluation is interpreted, not codegen'd, and ran
    ~2× slower than this at 32 cores.)

    fan_out (r14): the five-size gram explode + per-gram xxhash64 was
    the single largest single-split cost in the inventory — the whole
    tagged explode ran on one core before the first partial-agg
    Exchange (A/B 0.23x with the fan-out, OPTIMIZATION_r14.md)."""
    docs = fan_out(table(spark, sf_dir, "documents"), spark)
    t = F.filter(F.split("text", " "), lambda x: x != F.lit(""))

    def tag(n):
        # single-arg lambda via factory: a 2-param lambda (even with a
        # default) is bound as (element, index) by Spark's HOF arity rules
        return lambda g: F.struct(
            F.lit(n).alias("n"),
            F.xxhash64(g).alias("g"),
            F.length(g).cast("bigint").alias("gl"),
        )

    tagged = docs.select(
        "doc_id",
        F.explode(
            F.flatten(
                F.array(*[
                    F.when(
                        F.size(t) >= n,
                        F.transform(word_shingles(t, n), tag(n)),
                    ).otherwise(F.array().cast(
                        "array<struct<n:int,g:bigint,gl:bigint>>"
                    ))
                    for n in (2, 3, 4, 5, 6)
                ])
            )
        ).alias("x"),
    ).select("doc_id", "x.n", "x.g", "x.gl")
    pg = (
        tagged.groupBy("doc_id", "n", "g")
        .agg(F.count("*").alias("m"), F.first("gl").alias("gl"))
        .select(
            "doc_id", "n",
            (F.col("m") * F.col("gl")).alias("mass"),
            (F.col("m") >= 2).alias("dup"),
        )
    )
    per_n = pg.groupBy("doc_id", "n").agg(
        F.sum("mass").alias("total_mass"),
        F.max("mass").alias("top_mass"),
        F.coalesce(
            F.sum(F.when(F.col("dup"), F.col("mass"))), F.lit(0)
        ).alias("dup_mass"),
    )

    def pick(n, col):
        return F.max(F.when(F.col("n") == n, F.col(col)))

    def frac(n, col, alias):
        # exact BIGINT masses, ONE double division, round, -0.0-normalize
        # — the same expression shape as the oracle (r9 advice: no
        # decimal intermediates on either side)
        return (
            F.round(
                pick(n, col).cast("double") / pick(n, "total_mass"), 4
            )
            + F.lit(0.0)
        ).alias(alias)

    return (
        per_n.groupBy("doc_id")
        .agg(
            frac(2, "top_mass", "top2_frac"),
            frac(3, "top_mass", "top3_frac"),
            frac(4, "top_mass", "top4_frac"),
            frac(5, "dup_mass", "dup5_frac"),
            frac(6, "dup_mass", "dup6_frac"),
            F.count("*").alias("_nn"),
        )
        .filter(F.col("_nn") == 5)
        .drop("_nn")
    )


_SPAN_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
pos AS (
  SELECT doc_id, len(t) AS n, unnest(range(1, len(t) + 1)) AS i
  FROM toks WHERE len(t) >= 1),
marked AS (
  SELECT doc_id, n, i,
         ((i - 1) % 20) BETWEEN s AND s + 2 AS corrupted
  FROM (SELECT *,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                   CAST((i - 1) // 20 AS VARCHAR)), 1, 4)
               )::INTEGER % 18 AS s
        FROM pos))
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE corrupted) AS BIGINT) AS n_corrupted,
       CAST(COUNT(DISTINCT CASE WHEN corrupted THEN (i - 1) // 20 END)
            AS BIGINT) AS n_spans,
       ROUND(CAST(COUNT(*) FILTER (WHERE corrupted) AS DOUBLE)
             / MAX(n), 4) + 0.0 AS corrupt_ratio
FROM marked
GROUP BY doc_id
"""


@register("llm_span_corruption", oracle=_SPAN_ORACLE, category="K")
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style SPAN CORRUPTION accounting (Raffel et al. 2020 §3.1.4,
    deterministic variant): each 20-token block corrupts one 3-token
    span whose offset is hash-derived (md5 of doc:block → first 4 hex
    chars → mod 18), giving ~15% corruption in contiguous spans — the
    denoising objective's masking geometry, reproducible across runs
    and engines with NO RNG stream (the llm_mlm_mask recipe extended
    from i.i.d. token masks to spans). Emits per-doc token/corrupted/
    span counts and the corruption ratio.

    Plan: map-only — token positions, block hashes, and span tests all
    run as JVM higher-order functions inside the scan projection; zero
    shuffle, zero Python. The oracle walks the identical positions via
    unnest and hex-cast md5 (hash-portable: both engines compute md5 of
    the same ASCII string). Spans cut short by the doc end count as
    spans with fewer corrupted tokens — identical clamping on both
    engines."""
    docs = table(spark, sf_dir, "documents")
    t = F.filter(F.split("text", " "), lambda x: x != F.lit(""))

    def span_start(block):
        hx = F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col("doc_id").cast("string"), block.cast("string")
                )
            ),
            1,
            4,
        )
        return F.conv(hx, 16, 10).cast("bigint") % 18

    def is_corrupted(i):
        # i is the 1-based token position (bigint); the block index must
        # stay an exact BIGINT — a double division here would render
        # "2.0" into the md5 input and silently diverge from the oracle
        off = (i - 1) % 20
        block = ((i - 1) - off) / F.lit(20)
        s = span_start(block.cast("bigint"))
        return off.between(s, s + 2)

    base = docs.select(
        "doc_id", F.size(t).cast("bigint").alias("n_tokens")
    ).filter(F.col("n_tokens") >= 1)
    flags = F.transform(
        F.sequence(F.lit(1).cast("bigint"), F.col("n_tokens")),
        lambda i: is_corrupted(i).cast("bigint"),
    )
    n_corr = F.aggregate(
        flags, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    # a block contributes a span iff its span start lands inside the doc
    n_blocks = F.floor((F.col("n_tokens") - 1) / 20).cast("bigint")
    spans = F.aggregate(
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), n_blocks),
            lambda b: (
                (b * 20 + span_start(b) + 1) <= F.col("n_tokens")
            ).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return base.select(
        "doc_id",
        "n_tokens",
        n_corr.alias("n_corrupted"),
        spans.alias("n_spans"),
        (
            F.round(n_corr.cast("double") / F.col("n_tokens"), 4) + F.lit(0.0)
        ).alias("corrupt_ratio"),
    )
