"""Scalar-function helpers shared by the operator library.

The reference's scalar surface (SURVEY.md §2.9 — split/concat/trim/
substring/regex/JSON/hash/mod/cast/date/math/array) is entirely
built-in `pyspark.sql.functions`; what lives here is the *parity
discipline* for differential testing against other engines:

* ``dsum``/``davg`` — money aggregates: the per-row expression is
  computed in double (per-row arithmetic is order-free, so
  bit-identical in any engine), cast once to DECIMAL(18,4), then
  summed exactly. Double summation is order-dependent across
  partition counts and engines; decimal summation is not. Cast back
  to DOUBLE at the end for a stable output schema.
* ``ts_str``/``date_str`` — timestamps rendered as strings in query
  outputs so engine/timezone representation differences can't leak
  into value comparison.

The same discipline keeps results stable when the *Spark* partition
count changes — i.e. the engine returns the same aggregate at 32
partitions locally and 20,000 on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(18,4)"
SQL_DEC = "DECIMAL(18,4)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent exact sum of a double expression → double.

    ``scale`` must be ≥ the true decimal scale of the per-row
    expression (e.g. a product of three 2-decimal factors needs 6) so
    the double→decimal cast never rounds — rounding a computed double
    at a representable midpoint is engine-dependent.
    """
    return F.sum(_c(col).cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum, one double divide."""
    return (F.sum(_c(col).cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def dsum_cents(col: Column | str, alias: str) -> Column:
    """Money sum for totals past the DECIMAL→DOUBLE exact envelope.

    A ``dsum`` total is only engine-exact while |total|·10^scale stays
    under 2^53 — above that, the final DECIMAL→DOUBLE cast rounds
    differently per engine (Java BigDecimal.doubleValue is correctly
    rounded; DuckDB's int128 path composes two roundings), a genuine
    1-ULP divergence the 10x-replica oracle sweep caught on the
    scale-6 TPC-H charge/profit sums. Here the per-row COMPUTED double
    is quantized at cents with the exact ``floor(v·100 + 0.5)`` form
    (identical IEEE ops per row in both engines), summed as BIGINT
    (exact, order-free), and divided once. Envelope: per-row
    |v|·100 < 2^53, cents total < 2^53 (≈ $90T) for the exact final
    conversion — vs dsum(scale=6)'s ≈ $9B."""
    cents = F.floor(_c(col) * 100 + F.lit(0.5)).cast("bigint")
    return (F.sum(cents).cast("double") / F.lit(100.0)).alias(alias)


def ts_str(col: Column | str, alias: str) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string (UTC session TZ)."""
    return F.date_format(_c(col), "yyyy-MM-dd HH:mm:ss").alias(alias)


def date_str(col: Column | str, alias: str) -> Column:
    return F.date_format(_c(col), "yyyy-MM-dd").alias(alias)


# --- DuckDB-side equivalents, for building oracle SQL strings -------------


def sql_dsum(expr: str, alias: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) / COUNT(*) AS {alias}"


def sql_dsum_cents(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dsum_cents` (same expression tree; the
    outer CAST AS BIGINT collapses DuckDB's HUGEINT sum)."""
    return (
        f"CAST(CAST(SUM(CAST(FLOOR(({expr}) * 100 + 0.5) AS BIGINT)) AS BIGINT)"
        f" AS DOUBLE) / 100.0 AS {alias}"
    )


def sql_ts_str(expr: str, alias: str) -> str:
    return f"strftime(CAST({expr} AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS {alias}"


def sql_date_str(expr: str, alias: str) -> str:
    return f"strftime(CAST({expr} AS TIMESTAMP), '%Y-%m-%d') AS {alias}"
