"""Physical-plan introspection helpers (the ".explain and iterate" loop,
promoted to assertions so plan regressions fail tests, not benchmarks).

At 100 TB the plan *is* the product: a filter that stops reaching the
parquet scan, a broadcast that silently becomes a sort-merge join, or a
global sort that replaces TakeOrderedAndProject each turn a working query
into a cluster-killer. tests/test_plans.py pins the plan shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters: [...] section(s) of a formatted plan."""
    plan = formatted_plan(df)
    return "\n".join(
        line.strip() for line in plan.splitlines() if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(
        line.strip() for line in plan.splitlines() if "ReadSchema" in line
    )
