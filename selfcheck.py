#!/usr/bin/env python
"""Full-inventory correctness artifact: SELFCHECK.json.

The grading driver's CORRECTNESS_r*.json caps at ~50 entries, so any
single round records under half the registry. This runner is the
complement: every registered query at sf0.01 (the driver's scale) on a
VANILLA SparkSession, DuckDB-differential where an oracle exists
(rows + schema + value-hash, same sort-columns-by-name discipline as
the driver), rows-only for the weak queries. Output: SELFCHECK.json at
the repo root, refreshed each round's commit.

Usage: python selfcheck.py  [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm(v):
    """Hash-stable cell normalization (mirror of the driver's compare):
    floats via repr of a 10-digit round so f32/f64 formatting noise and
    -0.0 vs 0.0 don't flip the hash; bytes hex'd; None canonical."""
    if v is None:
        return "\0"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(round(v, 10) + 0.0)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _hash_rows(cols, rows):
    h = hashlib.sha256()
    for row in sorted("\x1f".join(_norm(c) for c in row) for row in rows):
        h.update(row.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query IDs: check just these (iteration "
        "subset for verifying changed ops; the committed SELFCHECK.json "
        "artifact must still come from a FULL run)",
    )
    args = ap.parse_args()
    if os.environ.get("GDXPS_IVF_TARGET_CELL"):
        # r13 advice: the probe-only regime knob silently re-sizes the
        # IVF quantizer while the registered oracles replay k=sqrt(n) —
        # a leaked export fails the gates loudly but confusingly.
        sys.exit(
            "GDXPS_IVF_TARGET_CELL is set (scale-probe regime knob); "
            "unset it — selfcheck must run the registered k=sqrt(n) "
            "quantizer the oracles replay"
        )
    repo = os.path.dirname(os.path.abspath(__file__))
    if args.out is None:
        # r14 (ADVICE): a --only run must never land on the committed
        # artifact path — an accidental commit after a subset run would
        # silently shrink the full-inventory ledger to a few entries.
        args.out = os.path.join(
            repo, "SELFCHECK_SUBSET.json" if args.only else "SELFCHECK.json"
        )
    elif args.only and os.path.abspath(args.out) == os.path.join(
        repo, "SELFCHECK.json"
    ):
        ap.error(
            "--only writes a subset ledger; refusing to overwrite the "
            "committed SELFCHECK.json — pass a different --out"
        )

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()  # vanilla
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    from gdxpy_spark import registry

    out, n_ok, n_weak, n_bad = {}, 0, 0, 0
    t0 = time.time()
    only = set(args.only.split(",")) if args.only else None
    for name, q in registry.all_queries().items():
        if only is not None and name not in only:
            continue
        rec = {"check": "oracle" if q.oracle else "rows_only", "err": None}
        try:
            sdf = q.fn(spark, args.sf_dir)
            scols = sorted(sdf.columns)
            srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            if q.oracle:
                # Arrow fetch, NOT fetchall(): the driver compares
                # through pandas/Arrow, where DuckDB HUGEINT/DECIMAL
                # render differently from int64 — a fetchall() ledger
                # is blind to that class (r8 verdict item #3).
                from gdxpy_spark.oracle_types import type_mismatches

                dtbl = con.execute(q.oracle).arrow()
                dn = list(dtbl.column_names)
                didx = [dn.index(c) for c in sorted(dn)]
                dcols_py = [c.to_pylist() for c in dtbl.columns]
                drows = [tuple(r[i] for i in didx)
                         for r in zip(*dcols_py)] if dtbl.num_rows else []
                tmm = type_mismatches(sdf.schema, dtbl.schema)
                rec["oracle_rows"] = len(drows)
                rec["rows_match"] = len(srows) == len(drows)
                rec["schema_match"] = scols == sorted(dn)
                rec["type_match"] = not tmm
                if tmm:
                    rec["type_defects"] = tmm[:8]
                rec["hash_match"] = _hash_rows(scols, srows) == _hash_rows(
                    sorted(dn), drows)
                ok = (rec["rows_match"] and rec["schema_match"]
                      and rec["type_match"] and rec["hash_match"])
            else:
                rec["rows_returned"] = len(srows) >= 0
                ok = True
                n_weak += 1
        except Exception as exc:  # noqa: BLE001 — artifact must record, not die
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
            ok = False
        if ok:
            n_ok += 1
        else:
            n_bad += 1
        out[name] = rec
        spark.catalog.clearCache()

    # Window-health stamp (r7 verdict ask #8): the same boot_id +
    # calibration probes bench.py writes, so a future judge can compare
    # the builder's generation window against the driver's without
    # reconstructing it from BENCH files (the r07 hash-fails were
    # adjudicated exactly this way — the driver's cpu probe read 2.4x
    # degraded vs the builder/judge windows on the same boot).
    from pyspark.sql import functions as _F

    def _cal_probe(df):
        best = None
        for _ in range(3):
            c0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best or 1e9, time.perf_counter() - c0)
        return round(best, 4)

    cal = {
        "cpu": _cal_probe(
            spark.range(5_000_000).groupBy((_F.col("id") % 101).alias("g"))
            .agg(_F.sum("id"), _F.avg("id"), _F.count("*"))
        ),
        "scan": _cal_probe(
            spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
            .agg(_F.sum("l_quantity"), _F.sum("l_extendedprice"))
        ),
    }
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot_id = f.read().strip()[:8]
    except OSError:
        boot_id = "unknown"
    summary = {
        "total": len(out),
        "ok": n_ok,
        "weak_rows_only": n_weak,
        "failed": n_bad,
        "sf_dir": args.sf_dir,
        "wall_sec": round(time.time() - t0, 1),
        "boot_id": boot_id,
        "calibration": cal,
        "generated_unix": int(time.time()),
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "queries": out}, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
