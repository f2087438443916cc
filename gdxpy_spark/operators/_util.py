"""Determinism helpers shared by the operator inventory.

Why DECIMAL-routed sums: Spark aggregates partition-parallel, DuckDB
sequentially, so a raw SUM(double) differs between the two in the last
few ulps; ROUND(x, 4) can then flip on boundary values and break the
driver's value-hash. Casting each row to DECIMAL first makes the sum
exact and order-independent, after which both engines produce the same
double. The per-row double→decimal conversion itself is deterministic
on both engines for our value ranges (|x| < 1e12 with ulp « 1e-6, so a
tie at the rounding digit cannot occur).

These helpers are also the scale story: DECIMAL(18, s) stays Long-backed
in Tungsten, so the exact sum costs roughly an integer add per row and
keeps whole-stage codegen — no Python, no order-sensitivity, no penalty
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Decimal wide enough for sf0.1 sums with headroom; Long-backed (<=18 digits).
_DEC = "decimal(18,6)"


def dec(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(_DEC)


def dsum(c: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double expression, rounded to 4, as double."""
    return F.round(F.sum(dec(c)).cast("double"), 4).alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Order-independent AVG (exact decimal sum / count), rounded to 4."""
    c = F.col(c) if isinstance(c, str) else c
    return F.round(F.sum(dec(c)).cast("double") / F.count(c), 4).alias(alias)


def r4(c: Column | str, alias: str | None = None) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    c = F.round(c, 4)
    return c.alias(alias) if alias else c


def r4z(c: Column | str, alias: str) -> Column:
    """ROUND(x, 4) with the zero sign canonicalized (+0.0): engines
    disagree on whether a tiny negative rounds to -0.0 or 0.0, and a
    hash/sort over the rendered value treats those as different rows.
    IEEE: -0.0 + 0.0 = +0.0; finite values unchanged."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.round(c, 4) + F.lit(0.0)).alias(alias)


def money4(c: Column | str, alias: str) -> Column:
    """Per-row money expression rounded to 4 decimals, canonicalized
    through DECIMAL first. Rounding the raw double is engine-divergent:
    price×(1-disc) products sit *exactly* on 4-decimal half-way points,
    and Spark (exact BigDecimal HALF_UP) vs DuckDB (scaled-double
    nearbyint) disagree there. DECIMAL(18,6) fixes a canonical value
    (the true product has ≤6 decimals, so no tie at the 6th), then the
    decimal ROUND is exact and identical on both engines."""
    return F.round(dec(c), 4).cast("double").alias(alias)


def sql_money4(expr: str, alias: str) -> str:
    return f"CAST(ROUND(CAST(({expr}) AS DECIMAL(18,6)), 4) AS DOUBLE) AS {alias}"


# DuckDB-side equivalents (string templates for oracle SQL)
def sql_dsum(expr: str, alias: str) -> str:
    return f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE), 4) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), 4) AS {alias}"
    )
