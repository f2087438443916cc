"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over gdxpy_spark: the engine's query inventory (SURVEY.md §2.2)
registers itself in gdxpy_spark.registry; this module re-exposes it in
the driver's shape. See gdxpy_spark/ for the implementation.

ENV-GATED QUERY: `stream_stateful_typed` (SURVEY §2.2.H) is implemented
at gdxpy_spark/streaming/replay.py but registers ONLY when the
`google.protobuf` Python package imports — Spark 4's
transformWithStateInPandas state server requires it and this container
does not ship it (SURVEY §0 environment constraint). While absent, the
query is missing from queries() by design (the driver records no row);
its applyInPandasWithState twin `stream_stateful_running` covers the
arbitrary-stateful surface, and a twin-equivalence test
(tests/test_streaming.py) auto-activates the moment protobuf appears.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gdxpy_spark import registry  # noqa: E402

FLAGSHIP = "agg_groupby_basic"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return registry.queries()[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; weak
    (rows-only) queries are intentionally absent."""
    return registry.oracles()
