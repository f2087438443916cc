"""Spark Python DataSource for the GDX format (SURVEY §1.2, §7 M2).

    spark.dataSource.register(GdxDataSource)
    spark.read.format("gdx").option("symbol", "d").load("trnsport.gdx")
    spark.read.format("gdx").option("symbol", "*").load(path)   # catalog
    df.write.format("gdx").option("symbol", "d").option("symtype",
        "parameter").mode("overwrite").save("out.gdx")

Schemas by symbol type (long format, SURVEY §1.2 mapping):
    set        → k1..kdim STRING, text STRING
    parameter  → k1..kdim STRING, value DOUBLE, is_eps BOOLEAN
    var / equ  → k1..kdim STRING, level/marginal/lower/upper/scale DOUBLE,
                 eps_mask INT (bit i ⇒ field i was GDX EPS)
    catalog    → name, dim, type, subtype, nrecs, expl_text, domains, alias_of

Scale design: one InputPartition per (symbol, chunk) — the codec stores
chunk offsets every CHUNK records, so a single large symbol splits across
tasks; partitions decode their byte range only and emit Arrow
RecordBatches (vectorized, never per-record Python↔JVM — the reference's
per-record C-call bottleneck, SURVEY §3.1, is avoided structurally).
The writer sorts per partition and merges sorted runs at commit (the
distributed-sort-then-merge pattern; the commit node only streams runs).

Reference parity: gdxpy reads a symbol fully into pandas via per-record
gdxDataReadStr calls [upstream: gdxpy/gdxpy.py (GdxSymb.get_values) —
UNVERIFIED, mount empty; see SURVEY §0]. This source exposes the same
records as a lazily-scanned DataFrame instead.
"""

from __future__ import annotations

import math
import os
import pickle

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from gdxpy_spark.sources.gdx_codec import (
    DT_EQU,
    DT_PAR,
    DT_SET,
    DT_VAR,
    TYPE_NAMES,
    VALUE_FIELDS,
    GdxFile,
    GdxWriter,
    SymbolData,
    SymbolMeta,
)

_TYPE_BY_NAME = {v: k for k, v in TYPE_NAMES.items()}


def open_gdx(path: str):
    """Open either GDX container, sniffed by magic: the native GAMS V7
    layout (header byte 123 + "GAMSGDX" — gdx_gams.GamsGdxFile) or the
    GDXPY7 clean-room container (gdx_codec.GdxFile). Both expose the
    same reader surface (symbols / find / n_chunks / read_records), so
    every code path below is layout-agnostic."""
    from gdxpy_spark.sources import gdx_gams

    if gdx_gams.is_gams_layout(path):
        return gdx_gams.GamsGdxFile(path)
    return GdxFile(path)

CATALOG_SCHEMA = (
    "name STRING, dim INT, type STRING, subtype INT, nrecs BIGINT,"
    " expl_text STRING, domains ARRAY<STRING>, alias_of STRING"
)


def _symbol_schema(meta: SymbolMeta) -> str:
    keys = ", ".join(f"k{i + 1} STRING" for i in range(meta.dim))
    sep = ", " if keys else ""
    if meta.type == DT_SET:
        return f"{keys}{sep}text STRING"
    if meta.type == DT_PAR:
        return f"{keys}{sep}value DOUBLE, is_eps BOOLEAN"
    vals = ", ".join(f"{f} DOUBLE" for f in VALUE_FIELDS)
    return f"{keys}{sep}{vals}, eps_mask INT"


def _expand_paths(path: str) -> list[str]:
    """A path may be one .gdx file, a directory of them, or a glob — the
    multi-file form is gdxpy's scenario list (R12): the same symbol read
    from every file, stacked with a `scenario` column (= file stem).
    Partition pruning by scenario falls out of per-file partitions."""
    import glob as _glob

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.gdx")))
    elif any(c in path for c in "*?["):
        files = sorted(_glob.glob(path))
    else:
        files = [path]
    if not files:
        raise ValueError(f"gdx: no .gdx files at {path!r}")
    return files


class GdxPartition(InputPartition):
    def __init__(self, path: str, sym_idx: int, chunk: int | None, scenario: str | None):
        self.path = path
        self.sym_idx = sym_idx
        self.chunk = chunk
        self.scenario = scenario


class GdxCatalogReader(DataSourceReader):
    def __init__(self, path: str):
        self.paths = _expand_paths(path)

    def read(self, partition):
        for p in self.paths:
            f = open_gdx(p)
            for s in f.symbols:
                yield (
                    s.name,
                    s.dim,
                    s.type_name,
                    s.subtype,
                    s.nrecs,
                    s.expl_text,
                    list(s.domains),
                    s.alias_of,
                )


class GdxSymbolReader(DataSourceReader):
    def __init__(self, path: str, symbol: str):
        self.paths = _expand_paths(path)
        self.multi = len(self.paths) > 1
        self.symbol = symbol

    def partitions(self):
        parts = []
        for p in self.paths:
            f = open_gdx(p)
            idx = f.find(self.symbol)
            scen = os.path.splitext(os.path.basename(p))[0] if self.multi else None
            n = max(1, f.n_chunks(idx))
            parts.extend(GdxPartition(p, idx, c, scen) for c in range(n))
        return parts

    def read(self, partition: GdxPartition):
        import pyarrow as pa

        f = open_gdx(partition.path)
        m = f.symbols[partition.sym_idx]
        chunk = partition.chunk if f.n_chunks(partition.sym_idx) > 1 else None
        data = f.read_records(partition.sym_idx, chunk=chunk)
        cols: dict[str, pa.Array] = {}
        for d in range(m.dim):
            cols[f"k{d + 1}"] = pa.array(
                [k[d] for k in data.keys], type=pa.string()
            )
        if m.type == DT_SET:
            cols["text"] = pa.array(data.text, type=pa.string())
        elif m.type == DT_PAR:
            cols["value"] = pa.array(
                [v[0] for v in data.values], type=pa.float64()
            )
            cols["is_eps"] = pa.array(
                [bool(e & 1) for e in data.eps_mask], type=pa.bool_()
            )
        else:
            for j, fname in enumerate(VALUE_FIELDS):
                cols[fname] = pa.array(
                    [v[j] for v in data.values], type=pa.float64()
                )
            cols["eps_mask"] = pa.array(data.eps_mask, type=pa.int32())
        if partition.scenario is not None:
            cols["scenario"] = pa.array(
                [partition.scenario] * len(data.keys), type=pa.string()
            )
        if data.keys:
            yield pa.RecordBatch.from_pydict(cols)


class GdxCommitMessage(WriterCommitMessage):
    def __init__(self, payload: bytes):
        self.payload = payload


class GdxSymbolWriter(DataSourceWriter):
    """Each task sorts its rows and ships a pickled sorted run; commit
    merges runs (they are small relative to the final sorted block, and
    a production path would stream-merge to disk)."""

    def __init__(self, path: str, options, schema: StructType):
        self.path = path
        self.symbol = options.get("symbol") or "symbol"
        self.symtype = _TYPE_BY_NAME[options.get("symtype", "parameter")]
        self.expl = options.get("expl_text", "")
        self.compress = (options.get("compress", "false") or "").lower() == "true"
        self.layout = (options.get("layout", "gdxpy") or "gdxpy").lower()
        if self.layout not in ("gdxpy", "gams"):
            raise ValueError(f"gdx: unknown layout {self.layout!r}")
        if self.layout == "gams" and self.compress:
            raise ValueError(
                "gdx: the GAMS layout writer does not support compression "
                "(GAMS compresses at stream-page level; see gdx_gams.py) — "
                "drop compress=true or use the default gdxpy layout"
            )
        self.schema = schema

    def write(self, rows):
        recs = [tuple(r) for r in rows]
        recs.sort(key=lambda r: r[: self._dim()])
        return GdxCommitMessage(pickle.dumps(recs))

    def _dim(self) -> int:
        return sum(1 for f in self.schema.fields if f.name.startswith("k"))

    def commit(self, messages):
        dim = self._dim()
        field_names = [f.name for f in self.schema.fields]
        recs: list[tuple] = []
        for msg in messages:
            recs.extend(pickle.loads(msg.payload))
        recs.sort(key=lambda r: r[:dim])

        meta = SymbolMeta(
            name=self.symbol, dim=dim, type=self.symtype, expl_text=self.expl
        )
        data = SymbolData(meta=meta)
        for r in recs:
            row = dict(zip(field_names, r))
            data.keys.append(tuple(row[f"k{i + 1}"] for i in range(dim)))
            if self.symtype == DT_SET:
                data.text.append(row.get("text") or "")
                data.values.append((0.0,))
                data.eps_mask.append(0)
            elif self.symtype == DT_PAR:
                v = row["value"]
                data.values.append((0.0 if row.get("is_eps") else float(v if v is not None else math.nan),))
                data.eps_mask.append(1 if row.get("is_eps") else 0)
            else:
                data.values.append(
                    tuple(
                        float(row[f]) if row[f] is not None else math.nan
                        for f in VALUE_FIELDS
                    )
                )
                data.eps_mask.append(int(row.get("eps_mask") or 0))
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        if self.layout == "gams":
            from gdxpy_spark.sources.gdx_gams import GamsGdxWriter

            w = GamsGdxWriter(self.path)
        else:
            w = GdxWriter(self.path, compress=self.compress)
        w.add_symbol(data)
        w.close()

    def abort(self, messages):
        pass


class GdxDataSource(DataSource):
    """format("gdx") — reader/writer over the pure-Python codec."""

    @classmethod
    def name(cls) -> str:
        return "gdx"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("gdx: a path is required (load(path)/save(path))")
        return p

    def schema(self):
        sym = self.options.get("symbol", "*")
        if sym == "*":
            return CATALOG_SCHEMA
        paths = _expand_paths(self._path())
        f = open_gdx(paths[0])
        base = _symbol_schema(f.symbols[f.find(sym)])
        return base + (", scenario STRING" if len(paths) > 1 else "")

    def reader(self, schema):
        sym = self.options.get("symbol", "*")
        if sym == "*":
            return GdxCatalogReader(self._path())
        return GdxSymbolReader(self._path(), sym)

    def writer(self, schema, overwrite: bool):
        path = self._path()
        if os.path.exists(path) and not overwrite:
            raise ValueError(f"gdx: {path} exists (use mode('overwrite'))")
        return GdxSymbolWriter(path, self.options, schema)


def register(spark) -> None:
    """Idempotently register the gdx format on a session."""
    spark.dataSource.register(GdxDataSource)
