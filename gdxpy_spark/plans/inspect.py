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


def has_unpartitioned_window(df: DataFrame) -> bool:
    """True if the optimized logical plan contains a Window with an empty
    PARTITION BY — the shape that physically funnels the whole input
    through ONE WindowExec task (Exchange SinglePartition → Window).

    Checked semantically on the logical plan rather than by grepping the
    physical plan string, because 'SinglePartition' also appears for
    benign metadata-sized shapes (a global aggregate's one-row final
    stage) and partitioned windows print their partition columns inside
    the same windowspecdefinition(...) text."""
    stack = [df._jdf.queryExecution().optimizedPlan()]  # noqa: SLF001
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window" and node.partitionSpec().isEmpty():
            return True
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return False
