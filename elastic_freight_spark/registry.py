"""Query registry: name → (Spark impl, optional DuckDB oracle SQL).

Every ★ operator from SURVEY.md §2 registers here; the driver harness
(`__spark_entry__.py`) exposes the two dicts. Implementations take
``(spark, sf_dir)`` and return a DataFrame; oracle SQL runs on DuckDB
views named after the parquet tables.

Queries without an oracle (genuinely non-SQL-expressible: LSH, ES
murmur3 parity, streaming state) are registered with ``oracle=None``
and get the driver's weaker rows-only check; each must carry its own
unit test instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register an operator implementation (decorator)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run.

    Import order IS registration order (dicts preserve insertion), and
    the driver's correctness harness evaluates registry entries in that
    order under a fixed budget — so the families that most need an
    automated oracle row (windows/temporal/text/vectors/search/
    subqueries/scale went unchecked in round 1's alphabetical order)
    register first, with the round-1-green families after them.
    """
    from elastic_freight_spark.operators import (  # noqa: F401
        windows,
        temporal,
        text,
        vectors,
        search,
        subqueries,
        tpch_deep,
        scale,
        relational,
        arrays,
        indexing,
        sampling,
        multimodal,
    )
