#!/usr/bin/env python
"""Regenerate QUERIES.md: the full query catalog from the live registry —
one row per registered query (name, category, check level, one-line
summary from the implementation docstring). The runnable inventory a
user consults to find the operator they need; counts here always match
`registry.all_queries()` because the file is generated from it."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CATS = {
    "A": "A — sources & sinks",
    "B": "B — filters & projections",
    "C": "C — joins",
    "D": "D — aggregations",
    "E": "E — window functions",
    "F": "F — sort / limit / set ops",
    "G": "G — scalar functions",
    "H": "H — streaming & event time",
    "I": "I — UDF surfaces",
    "J": "J — GDX composites",
    "K": "K — LLM data pipeline",
    "MM": "MM — multimodal",
    "Q": "Q — TPC-H composites",
}


def main() -> None:
    from gdxpy_spark import registry

    qs = registry.all_queries()
    by_cat: dict[str, list] = {}
    for q in qs.values():
        by_cat.setdefault(q.category or "?", []).append(q)
    n_oracle = sum(1 for q in qs.values() if q.oracle)
    out = [
        "# QUERIES — the registered inventory",
        "",
        f"{len(qs)} queries ({n_oracle} DuckDB-hash-checked, "
        f"{len(qs) - n_oracle} weak/rows-only by SURVEY §2.2 contract), "
        "generated from `gdxpy_spark.registry` by `python make_catalog.py`. "
        "Each name is a `queries()` key the driver can run; \"oracle\" "
        "means an ANSI-SQL twin exists in `oracle_sql()` and the results "
        "hash-match (pytest `test_oracle_parity`, SELFCHECK.json, and the "
        "driver's CORRECTNESS artifacts).",
        "",
    ]
    for cat in sorted(by_cat, key=lambda c: (len(c), c)):
        out.append(f"## {CATS.get(cat, cat)}")
        out.append("")
        out.append("| query | oracle | summary |")
        out.append("|---|---|---|")
        for q in sorted(by_cat[cat], key=lambda q: q.name):
            first = (q.doc or "").strip().split("\n")[0].strip()
            first = first.replace("|", "\\|")
            out.append(
                f"| `{q.name}` | {'yes' if q.oracle else 'weak'} | {first} |"
            )
        out.append("")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "QUERIES.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"QUERIES.md: {len(qs)} queries")


if __name__ == "__main__":
    main()
