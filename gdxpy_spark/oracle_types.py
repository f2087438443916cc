"""Cross-engine result-type guard (r8 verdict item #2).

The driver compares Spark vs DuckDB results through a pandas/Arrow
fetch, where value RENDERING is type-dependent: DuckDB HUGEINT
(int128 — what an uncast ``SUM(<integer>)`` auto-promotes to) arrives
as float64 ``1019603.0`` or decimal128 where Spark says int64
``1019603`` — same rows, same names, hash mismatch. A
``fetchall()``-based harness sees Python ints on both sides and can
never reproduce it, which is how six oracles stayed red for two
rounds while every local check was green (VERDICT r8 "What's wrong").
r7's agg_histogram DECIMAL-vs-DOUBLE fail was the same class.

The guard: map every Arrow field type (the DuckDB fetch schema) and
every Spark field type into a coarse RENDER FAMILY — two types in the
same family produce identical canonical value text under the driver's
normalization (int32 vs int64 both render ``5``; the width never
shows). Any cross-family pair, and any decimal on either side (no
registered oracle legitimately emits one), is a latent driver
hash-fail and must be rejected at test time.
"""

from __future__ import annotations

import pyarrow as pa

# ---- Arrow side (the DuckDB fetch schema) ---------------------------------


def arrow_family(t: pa.DataType) -> str:
    """Render family of an Arrow type; 'DECIMAL'/'UNKNOWN' never match."""
    if pa.types.is_decimal(t):
        return "DECIMAL"  # HUGEINT/DECIMAL leak — always a guard failure
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_float32(t) or pa.types.is_float16(t):
        # narrower floats render with precision loss vs a float64 twin
        # (0.1f prints 0.10000000149...) — own family (r9 advice)
        return "float32"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        # tz-aware renders with a UTC-offset suffix where naive doesn't
        # (r9 advice) — a TIMESTAMPTZ vs timestamp_ntz pair must fail
        return "ts_tz" if t.tz is not None else "ts"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_family(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{f.name}:{arrow_family(f.type)}" for f in t
        )
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return f"UNKNOWN({t})"


# ---- Spark side ------------------------------------------------------------

_SPARK_SIMPLE = {
    "long": "int",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "float",
    # FloatType collects with float32 precision loss — own family
    "float": "float32",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    # TimestampType is session-tz-adjusted (renders tz-aware through
    # Arrow); only TIMESTAMP_NTZ pairs with a naive DuckDB TIMESTAMP
    "timestamp": "ts_tz",
    "timestamp_ntz": "ts",
    "binary": "bytes",
    "void": "null",
}


def spark_family(t) -> str:
    """Render family of a pyspark.sql.types.DataType."""
    from pyspark.sql import types as T

    if isinstance(t, T.DecimalType):
        return "DECIMAL"
    if isinstance(t, T.ArrayType):
        return f"list<{spark_family(t.elementType)}>"
    if isinstance(t, T.StructType):
        inner = ",".join(
            f"{f.name}:{spark_family(f.dataType)}" for f in t.fields
        )
        return f"struct<{inner}>"
    fam = _SPARK_SIMPLE.get(t.typeName())
    return fam if fam is not None else f"UNKNOWN({t.typeName()})"


def type_mismatches(spark_schema, arrow_schema) -> list[str]:
    """Column-by-column family comparison, keyed by name.

    Returns human-readable defect strings (empty list = guard passes).
    Columns present on only one side are reported too (the name-level
    schema check elsewhere also catches those; repeated here so this
    function is self-contained).
    """
    s_fams = {f.name: spark_family(f.dataType) for f in spark_schema.fields}
    a_fams = {f.name: arrow_family(f.type) for f in arrow_schema}
    out = []
    for name in sorted(set(s_fams) | set(a_fams)):
        sf, af = s_fams.get(name), a_fams.get(name)
        if sf is None or af is None:
            out.append(f"{name}: only on one side (spark={sf}, duckdb={af})")
        elif "DECIMAL" in (sf, af) or sf.startswith("UNKNOWN") or af.startswith("UNKNOWN"):
            out.append(f"{name}: non-portable type (spark={sf}, duckdb={af})")
        elif sf != af:
            out.append(f"{name}: render-family mismatch (spark={sf}, duckdb={af})")
    return out
