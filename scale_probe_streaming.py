#!/usr/bin/env python
"""Streaming state-store probe at 10× state (r10 verdict directive #9):
re-measure the RocksDB-vs-default (HDFS-backed in-memory) state store
trade on the real stateful replays at 1× (sf0.1 events) and 10× (the
scale_probe disjoint-user 10× events corpus — 10× rows, 10× users, same
per-user history, so join/dedup STATE grows 10×). The r7 rejection of
RocksDB was measured at toy state size; this probe answers whether the
in-memory store's comfort zone ends before 10×.

Providers are flipped via spark.sql.streaming.stateStore.providerClass
on a FRESH SparkSession per provider (the conf is read at stream start;
a fresh session also clears the fixture-replay checkpoint reuse so both
providers pay identical setup). Each (query, sf, provider) cell is
best-of-2 — same protocol as scale_probe.timed().

Usage: python scale_probe_streaming.py   (prints a table for SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe import S1, S10, build_10x  # noqa: E402

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
DEFAULT = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)

QUERIES = ["stream_stream_join", "stream_outer_join", "stream_dedup"]


def session(provider: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.streaming.stateStore.providerClass", provider)
        .getOrCreate()
    )


def main() -> None:
    results = {}
    for provider, tag in ((DEFAULT, "hdfs"), (ROCKSDB, "rocksdb")):
        spark = session(provider)
        spark.sparkContext.setLogLevel("ERROR")
        from gdxpy_spark import registry

        build_10x(spark)
        queries = registry.all_queries()
        for name in QUERIES:
            if name not in queries:
                continue
            for sf, sftag in ((S1, "1x"), (S10, "10x")):
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    queries[name].fn(spark, sf).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best or 1e9, time.perf_counter() - t0)
                results[(name, sftag, tag)] = round(best, 2)
                print(f"{name:20s} {sftag:>3s} {tag:8s} {best:7.2f}s",
                      flush=True)
        spark.stop()
    print("\n| query | 1x hdfs | 1x rocksdb | 10x hdfs | 10x rocksdb |")
    print("|---|---|---|---|---|")
    for name in QUERIES:
        if (name, "1x", "hdfs") not in results:
            continue
        print(
            f"| {name} | {results[(name, '1x', 'hdfs')]} s "
            f"| {results[(name, '1x', 'rocksdb')]} s "
            f"| {results[(name, '10x', 'hdfs')]} s "
            f"| {results[(name, '10x', 'rocksdb')]} s |"
        )


if __name__ == "__main__":
    main()
