#!/usr/bin/env python
"""100× dedup-posture probe (r9 verdict stretch item): run the two
subquadratic dedup flagships — llm_minhash_dedup and
llm_substring_dedup — at 1× (sf0.1, 5k docs) and at a 100× DISJOINT-
SHARD corpus (500k docs), where the 10× probe's growth band cannot yet
separate n from n² behavior.

Corpus construction (the S10 method, sharpened): 100 copies of the
sf0.1 documents with every TOKEN suffixed per copy (`_c{i}`), so copies
are textually disjoint — each shard keeps the real corpus's dense
internal dup structure (median pairwise Jaccard 0.63), while across
shards nothing can collide in a MinHash band or share a 6-word span.
That makes the TRUE candidate volume exactly 100 × the 1× volume: a
banded/blocked pipeline must show ~linear growth in wall clock and in
verified-pair/duplicated-span counts, while any all-pairs or
corpus-global-state shape would show ~10,000×.

Usage: python scale_posture_100x.py   (builds the 100× corpus in /tmp
on first run; prints a table for SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

S1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 100


def _s100_dir() -> str:
    # content-keyed cache dir (r10 advice, completed r12): embed a
    # fingerprint of EVERY source table this corpus is derived from —
    # documents AND embeddings (r11 carried only documents, so a
    # regenerated embeddings table with unchanged documents would have
    # been served a stale 100× embeddings build). Same discipline as
    # the IVF/zorder/WARC caches (_util.files_fingerprint); pinned by
    # tests/test_r12_ops.py::test_posture_cache_key_covers_all_sources.
    from gdxpy_spark.operators._util import files_fingerprint

    fp = files_fingerprint(
        [
            os.path.join(S1, "documents.parquet"),
            os.path.join(S1, "embeddings.parquet"),
        ]
    )
    return f"/tmp/gdxpy_spark_scaleprobe/sfx100_{fp}"


S100 = _s100_dir()


def build_100x(spark) -> None:
    from pyspark.sql import functions as F

    from gdxpy_spark.tables import table

    out = S100 + "/documents.parquet"
    if os.path.exists(out + "/_SUCCESS"):
        return
    docs = table(spark, S1, "documents")
    copies = []
    for i in range(COPIES):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        if i:
            # suffix every token: shard i shares NO token with shard j,
            # so no cross-shard band collisions / shared spans exist —
            # true shard-disjoint scaling (unlike the 10× corpus's
            # appended-token perturbation, which keeps copies near-dup)
            tag = F.lit(f"_c{i}")
            c = c.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.filter(F.split("text", " "), lambda t: t != F.lit("")),
                        lambda t: F.concat(t, tag),
                    ),
                    " ",
                ),
            )
        copies.append(c)
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(64).write.mode("overwrite").parquet(out)


def build_100x_embeddings(spark) -> None:
    """100× DISJOINT-SHARD embeddings (r10 verdict directive #8): 100
    copies of the sf0.1 embeddings, shard i's vectors multiplied
    elementwise by a deterministic per-(shard, dim) ±1 sign mask.
    Within a shard every pairwise cosine is EXACTLY preserved (the
    mask cancels: cos(x⊙s, y⊙s) = cos(x, y)), so each shard keeps the
    real corpus's near-dup structure — while cross-shard cosines
    become random-sign dots ~N(0, 1/64-ish std 0.125), far below any
    dedup/ANN threshold. True candidate volume is therefore ~100 × the
    1× volume: IVF/semdedup pipelines must show ~linear wall growth,
    any all-pairs shape ~10,000×."""
    from pyspark.sql import functions as F

    from gdxpy_spark.tables import table

    out = S100 + "/embeddings.parquet"
    if os.path.exists(out + "/_SUCCESS"):
        return
    emb = table(spark, S1, "embeddings")
    copies = []
    for i in range(COPIES):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        if i:
            c = c.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda v, idx: v
                    * F.when(
                        F.pmod(F.xxhash64(F.lit(i) * 64 + idx), 2) == 1, -1.0
                    ).otherwise(1.0),
                ),
            )
        copies.append(c)
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(out)


def _d256_dirs() -> tuple:
    """Content-keyed dirs for the d=256 fixture pair (1× and 100×)."""
    from gdxpy_spark.operators._util import files_fingerprint

    fp = files_fingerprint([os.path.join(S1, "embeddings.parquet")])
    base = "/tmp/gdxpy_spark_scaleprobe"
    return f"{base}/sf1_d256_{fp}", f"{base}/sfx100_d256_{fp}"


def build_d256(spark) -> tuple:
    """Production-dimensionality fixture (r11 verdict #2): derive
    d=256 embeddings from the 64-d corpus and re-run the disjoint-shard
    probe at the dimensionality where its premise actually holds.

    Construction, and why each step is exact:
    - TILE ×4 with a fixed per-(tile, dim) ±1 sign mask shared by all
      shards: cos(X, Y) = 4·dot(x,y) / (2|x|·2|y|) = cos(x, y) — every
      pairwise cosine in the corpus is preserved EXACTLY, so the 1×
      dup structure (and llm_semdedup's planted-recall behavior) is
      unchanged by the lift.
    - THEN 100 disjoint shards via a per-(shard, dim) ±1 mask over all
      256 dims (the d=64 probe's construction, generalized): within a
      shard the mask cancels (cosines exact), across shards the dot
      becomes a sum of 256 INDEPENDENTLY sign-flipped terms, so
      cross-shard cosines concentrate ~N(0, 1/256) — std 0.0625, vs
      0.125 at d=64 where the τ=0.4 tail (z≈3.2) was still reachable
      by the 2×10¹⁰ cross-pair mass. At z≈6.4 it is not: the probe
      separates 'shard-local work' from 'corpus-global work' cleanly,
      which is the production-dimensionality posture the d=64 row
      couldn't show."""
    from pyspark.sql import functions as F

    from gdxpy_spark.tables import table

    d1, d100 = _d256_dirs()

    def tile_mask(t):
        # closure factory, NOT a defaulted lambda arg: PySpark counts
        # every parameter (defaults included) as a lambda variable, so
        # `lambda v, idx, t=t:` binds a 3-arg HOF and fails analysis
        return lambda v, idx: v.cast("double") * F.when(
            F.pmod(F.xxhash64(F.lit(7_000_000 + t * 64) + idx), 2) == 1,
            -1.0,
        ).otherwise(1.0)

    def tile256(col):
        return F.flatten(
            F.array(*[F.transform(col, tile_mask(t)) for t in range(4)])
        ).cast("array<float>")

    if not os.path.exists(d1 + "/embeddings.parquet/_SUCCESS"):
        emb = table(spark, S1, "embeddings")
        emb.select(
            "vec_id", tile256(F.col("embedding")).alias("embedding")
        ).repartition(8).write.mode("overwrite").parquet(
            d1 + "/embeddings.parquet"
        )
    if not os.path.exists(d100 + "/embeddings.parquet/_SUCCESS"):
        base = spark.read.parquet(d1 + "/embeddings.parquet")

        def shard_mask(i):
            return lambda v, idx: v * F.when(
                F.pmod(F.xxhash64(F.lit(i), idx), 2) == 1,
                F.lit(-1.0).cast("float"),
            ).otherwise(F.lit(1.0).cast("float"))

        copies = []
        for i in range(COPIES):
            c = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
            if i:
                c = c.withColumn("embedding", F.transform("embedding", shard_mask(i)))
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.repartition(32).write.mode("overwrite").parquet(
            d100 + "/embeddings.parquet"
        )
    return d1, d100


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from gdxpy_spark import registry

    t0 = time.perf_counter()
    build_100x(spark)
    build_100x_embeddings(spark)
    print(f"100x corpus ready in {time.perf_counter() - t0:.0f}s", flush=True)

    queries = registry.all_queries()

    def run(name, sf):
        t0 = time.perf_counter()
        n = queries[name].fn(spark, sf).count()
        return round(time.perf_counter() - t0, 1), n

    skip_default = (
        "--ktc" in sys.argv
        or "--phash" in sys.argv
        or "--cdc" in sys.argv
        or "--graph" in sys.argv
    )
    for name in () if skip_default else (
                 "llm_minhash_dedup", "llm_substring_dedup",
                 # r11 (verdict #8): ANN/semantic family on the
                 # disjoint-shard embeddings — n vs n² separation the
                 # twin-heavy 10× corpus can't give
                 "llm_ann_ivf_served", "llm_semdedup"):
        w1, n1 = run(name, S1)
        w100, n100 = run(name, S100)
        print(
            f"{name:22s} 1x: {w1:7.1f}s / {n1:>10,} rows   "
            f"100x: {w100:7.1f}s / {n100:>10,} rows   "
            f"wall x{w100 / max(w1, 1e-9):.1f}  rows x{n100 / max(n1, 1):.1f}",
            flush=True,
        )

    if "--ktc" in sys.argv:
        # r13 (r12 verdict #1): the k-regime probe. Run the two
        # perf-weak ops under BOTH quantizer sizings on the same box,
        # same session: the default k=√n serving optimum vs the
        # SemDeDup-paper k = n/target_cell (target 64 ≈ the 1× corpus's
        # own cell size, so the 1× and 100× runs see the SAME per-shard
        # resolution — the regime the r12 analysis says recovers
        # per-shard dedup recall). The env knob is read by
        # _lloyd_ivf_fit/_ivf_index_dir (content-keyed _tc dirs, so
        # regimes can't poison each other's persisted index).
        d1, d100 = build_d256(spark)

        def run2(name, sf):
            best, n = 1e9, 0
            for _ in range(2):
                t0 = time.perf_counter()
                n = queries[name].fn(spark, sf).count()
                best = min(best, time.perf_counter() - t0)
            return round(best, 1), n

        # try/finally (r13 advice): a probe that dies mid-regime must
        # not leave the env knob exported for a later selfcheck/bench
        # run in the same shell (those runners also refuse it outright)
        try:
            for tc in (None, 64):
                if tc:
                    os.environ["GDXPS_IVF_TARGET_CELL"] = str(tc)
                else:
                    os.environ.pop("GDXPS_IVF_TARGET_CELL", None)
                label = f"tc={tc}" if tc else "k=sqrt(n)"
                for name, s1, s100 in (
                    ("llm_ann_ivf_served", S1, S100),
                    ("llm_semdedup", d1, d100),
                ):
                    w1, n1 = run2(name, s1)
                    w100, n100 = run2(name, s100)
                    print(
                        f"{name:22s} [{label:9s}] 1x: {w1:7.1f}s /"
                        f" {n1:>10,} rows   100x: {w100:7.1f}s /"
                        f" {n100:>10,} rows   wall x{w100 / max(w1, 1e-9):.1f}"
                        f"  rows x{n100 / max(n1, 1):.1f}",
                        flush=True,
                    )
        finally:
            os.environ.pop("GDXPS_IVF_TARGET_CELL", None)
        spark.stop()
        return

    def permuted_corpus_100x() -> str:
        """Build (or reuse) the alphabet-PERMUTED 100× documents corpus
        shared by the payload-content probes (--phash, --cdc): 100
        shards, shard i's letters/digits remapped by a seeded
        random.Random(i) permutation — a bijection on byte 4-grams, so
        each shard keeps the 1× corpus's internal byte-gram structure
        isomorphically while cross-shard payloads are disjoint."""
        import random as _random

        from pyspark.sql import functions as F

        from gdxpy_spark.operators._util import files_fingerprint
        from gdxpy_spark.tables import table

        fp = files_fingerprint([os.path.join(S1, "documents.parquet")])
        p100 = f"/tmp/gdxpy_spark_scaleprobe/phash100v2_{fp}"
        out = p100 + "/documents.parquet"
        if not os.path.exists(out + "/_SUCCESS"):
            t0 = time.perf_counter()
            docs = table(spark, S1, "documents")
            lets = "abcdefghijklmnopqrstuvwxyz"
            digs = "0123456789"
            copies = []
            for i in range(COPIES):
                c = docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 1_000_000)
                )
                if i:
                    rng = _random.Random(i)
                    pl = list(lets)
                    rng.shuffle(pl)
                    pd_ = list(digs)
                    rng.shuffle(pd_)
                    src = lets + lets.upper() + digs
                    dst = (
                        "".join(pl)
                        + "".join(pl).upper()
                        + "".join(pd_)
                    )
                    c = c.withColumn("text", F.translate("text", src, dst))
                copies.append(c)
            big = copies[0]
            for c in copies[1:]:
                big = big.unionByName(c)
            big.repartition(64).write.mode("overwrite").parquet(out)
            print(
                f"permuted 100x corpus ready in "
                f"{time.perf_counter() - t0:.0f}s",
                flush=True,
            )
        return p100

    if "--graph" in sys.argv:
        # r14: day-one 100× rows for the new graph ops. 100 disjoint
        # copies of the sf0.1 co-purchase graph by shifting both join
        # keys per shard (orderkey += i·10⁹, partkey += i·10⁷): shards
        # can never share an order or a part, so the TRUE result is
        # exactly the 1× result ×100 with shifted ids — rows must grow
        # ×100 and wall ~linearly (LPA: 4 rounds of join+2 aggs;
        # kcore: the peel loop, whose round count is a per-shard
        # property and must NOT grow with shard count).
        from pyspark.sql import functions as F

        from gdxpy_spark.operators._util import files_fingerprint
        from gdxpy_spark.tables import table

        fp = files_fingerprint([os.path.join(S1, "lineitem.parquet")])
        g100 = f"/tmp/gdxpy_spark_scaleprobe/graph100_{fp}"
        out = g100 + "/lineitem.parquet"
        if not os.path.exists(out + "/_SUCCESS"):
            t0 = time.perf_counter()
            li = table(spark, S1, "lineitem").select(
                "l_orderkey", "l_partkey", "l_shipdate"
            )
            copies = [
                li.select(
                    (F.col("l_orderkey") + F.lit(i * 1_000_000_000)).alias(
                        "l_orderkey"
                    ),
                    (F.col("l_partkey") + F.lit(i * 10_000_000)).alias(
                        "l_partkey"
                    ),
                    "l_shipdate",
                )
                for i in range(COPIES)
            ]
            big = copies[0]
            for c in copies[1:]:
                big = big.unionByName(c)
            big.repartition(64).write.mode("overwrite").parquet(out)
            print(
                f"graph 100x corpus ready in {time.perf_counter() - t0:.0f}s",
                flush=True,
            )

        for name in ("graph_label_prop", "graph_kcore"):
            w1, n1 = run(name, S1)
            w100, n100 = run(name, g100)
            print(
                f"{name:22s} 1x: {w1:7.1f}s / {n1:>10,} rows   "
                f"100x: {w100:7.1f}s / {n100:>10,} rows   "
                f"wall x{w100 / max(w1, 1e-9):.1f}"
                f"  rows x{n100 / max(n1, 1):.1f}",
                flush=True,
            )
        spark.stop()
        return

    if "--cdc" in sys.argv:
        # r14: measured 100× row for mm_cdc_dedup on the permuted
        # corpus (permutation preserves each shard's internal chunk
        # boundaries isomorphically — cut decisions are 4-gram-local —
        # while making cross-shard chunks disjoint, so the expected
        # duplicated-chunk report is the 1× report ×100 with remapped
        # digests). The op's cost model is one payload pass + two
        # digest-keyed shuffles ~48 B/chunk; this probe is the check
        # that the wall tracks that model, i.e. stays ~linear.
        p100 = permuted_corpus_100x()
        for name in ("mm_cdc_dedup",):
            w1, n1 = run(name, S1)
            w100, n100 = run(name, p100)
            print(
                f"{name:22s} 1x: {w1:7.1f}s / {n1:>10,} rows   "
                f"100x: {w100:7.1f}s / {n100:>10,} rows   "
                f"wall x{w100 / max(w1, 1e-9):.1f}"
                f"  rows x{n100 / max(n1, 1):.1f}",
                flush=True,
            )
        spark.stop()
        return

    if "--phash" in sys.argv:
        # r13 verdict #5: a measured 100× row for the perceptual media
        # family — the banded join's Σ n_b²/2¹⁶ cost model and the CC
        # tail had no probe row, and band-value skew (constant-prefix
        # payloads piling into one 16-bit bucket) is the realistic
        # failure mode, so per-band bucket stats are printed alongside
        # wall. The token-suffix 100× corpus is NOT payload-disjoint at
        # the byte-4-gram level (grams inside shared token stems
        # collide across shards), so this probe builds its own corpus:
        # a per-shard seeded PERMUTATION of the letter/digit alphabets
        # (seeded random.Random(i) shuffle — deterministic, and unlike
        # the v1 rotation it has no period: rotation repeats every 26
        # shards, which planted ~4-way cross-shard twins differing only
        # in rare digits — 785k cross-shard pairs, measured; that v1
        # run is kept in SCALE.md as the accidental density stress).
        # A permutation is a bijection on byte 4-grams: each shard's
        # internal shingle-set structure (incl. the planted trailer
        # near-dups) is preserved isomorphically, while any two shards
        # disagree on ~25/26 letters — cross-shard signatures
        # decorrelate to hamming ≈ 32.
        from pyspark.sql import functions as F

        from gdxpy_spark.operators.multimodal import (
            _PHASH_BANDS,
            _phash_sigs,
        )

        p100 = permuted_corpus_100x()

        for name in ("mm_phash_neardup", "mm_phash_clusters"):
            w1, n1 = run(name, S1)
            w100, n100 = run(name, p100)
            print(
                f"{name:22s} 1x: {w1:7.1f}s / {n1:>10,} rows   "
                f"100x: {w100:7.1f}s / {n100:>10,} rows   "
                f"wall x{w100 / max(w1, 1e-9):.1f}"
                f"  rows x{n100 / max(n1, 1):.1f}",
                flush=True,
            )

        # band-skew report: per band, the candidate mass Σ n_b·(n_b−1)/2
        # and the largest bucket — the numbers the Σ n_b²/2¹⁶ model and
        # the cap-and-chain decision need
        for label, d in (("1x", S1), ("100x", p100)):
            sigs = _phash_sigs(spark, d)
            bands = sigs.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(k).alias("band_id"),
                                F.shiftrightunsigned("phash", 16 * k)
                                .bitwiseAND(F.lit(0xFFFF))
                                .alias("band_val"),
                            )
                            for k in range(_PHASH_BANDS)
                        ]
                    )
                ).alias("bb")
            ).select("bb.band_id", "bb.band_val")
            stats = (
                bands.groupBy("band_id", "band_val")
                .agg(F.count("*").alias("n"))
                .groupBy("band_id")
                .agg(
                    F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cand"),
                    F.max("n").alias("max_bucket"),
                    F.count("*").alias("n_buckets"),
                )
                .orderBy("band_id")
                .collect()
            )
            for r in stats:
                print(
                    f"  band[{label:4s}] {r['band_id']}: candidates="
                    f"{int(r['cand']):>12,}  max_bucket={r['max_bucket']:>7,}"
                    f"  buckets={r['n_buckets']:>8,}",
                    flush=True,
                )
        spark.stop()
        return

    if "--d256" in sys.argv:
        # r11 verdict #2: SemDeDup's posture at production
        # dimensionality. min-of-2 so the one-time IVF index build
        # amortizes out, matching the serving rows above.
        d1, d100 = build_d256(spark)

        def run2(name, sf):
            best, n = 1e9, 0
            for _ in range(2):
                t0 = time.perf_counter()
                n = queries[name].fn(spark, sf).count()
                best = min(best, time.perf_counter() - t0)
            return round(best, 1), n

        w1, n1 = run2("llm_semdedup", d1)
        w100, n100 = run2("llm_semdedup", d100)
        print(
            f"llm_semdedup[d=256]    1x: {w1:7.1f}s / {n1:>10,} rows   "
            f"100x: {w100:7.1f}s / {n100:>10,} rows   "
            f"wall x{w100 / max(w1, 1e-9):.1f}  rows x{n100 / max(n1, 1):.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
