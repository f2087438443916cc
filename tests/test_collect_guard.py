"""Driver-side collect discipline guard (r9 verdict "What's wrong" #2).

Every registered query must be fully distributed: the only `.collect()`
calls allowed INSIDE an operator are metadata-sized — bucket routing
rows, a per-round argmax, sampled boundaries, catalog/pivot labels —
never a fact-sized materialization. The six known sites are all
O(groups/buckets) by construction; this guard pins the class the same
way the oracle-type guard pins the HUGEINT class: wrap
DataFrame.collect for a full registry BUILD pass and fail if any
internal collect returns more than the metadata budget.

(The queries' own result collection is the driver's job and happens
outside fn(); building the DataFrame is enough to execute every eager
internal collect, including streaming replays, which run their
micro-batch loops during build.)
"""

from __future__ import annotations

import pytest

import pyspark.sql

# build at the smallest SF: the guard checks plan STRUCTURE (does the
# operator funnel facts through the driver), which is scale-invariant
SF_DIR_SMALL = "/root/testdata/sf0.001"

# generous metadata ceiling: the biggest legitimate internal collect is
# O(length-buckets) routing rows (~hundreds); 10k still rejects any
# fact-sized collect at every real scale factor
MAX_INTERNAL_COLLECT_ROWS = 10_000


@pytest.mark.slow
def test_no_registered_query_collects_fact_sized_data(spark, monkeypatch):
    from gdxpy_spark import registry

    queries = registry.all_queries()
    offenders: list[tuple[str, int]] = []
    current = {"name": "<none>"}
    orig = pyspark.sql.DataFrame.collect

    def guarded(self):
        rows = orig(self)
        if len(rows) > MAX_INTERNAL_COLLECT_ROWS:
            offenders.append((current["name"], len(rows)))
        return rows

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", guarded)
    for name, q in queries.items():
        current["name"] = name
        q.fn(spark, SF_DIR_SMALL)
    assert not offenders, (
        "fact-sized driver-side collect inside registered queries: "
        f"{offenders}"
    )
