"""Differential harness: every oracle-paired query runs on Spark AND
DuckDB; results must match exactly (row count, schema names, values)
— a local pre-flight of the driver's CORRECTNESS gate.

Comparison mirrors the driver: columns sorted by name, rows sorted by
all columns, values compared exactly (we engineered queries to be
bit-deterministic across engines; any drift is a bug, not noise).
"""

import math
import os

import duckdb
import pandas as pd
import pytest

from conftest import SF_DIR_ORACLE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def all_pairs():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.fixture(scope="module")
def duck():
    con = _duck(SF_DIR_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n, _, _ in all_pairs()])
def test_query_matches_oracle(name, spark, duck):
    import __spark_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql()[name]

    spark_pdf = _normalize(fn(spark, SF_DIR_ORACLE).toPandas())
    duck_pdf = _normalize(duck.execute(sql).df())

    assert list(spark_pdf.columns) == list(duck_pdf.columns), (
        f"{name}: column mismatch {list(spark_pdf.columns)} vs {list(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    for col in spark_pdf.columns:
        sv, dv = spark_pdf[col].tolist(), duck_pdf[col].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, dv))
            if not _values_equal(a, b)
        ][:5]
        assert not bad, f"{name}.{col}: first diffs {bad}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return rows."""
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    for name in sorted(set(q) - set(o)):
        n = q[name](spark, SF_DIR_ORACLE).count()
        assert n > 0, f"{name} returned no rows"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 8
    assert sum(r["n_docs"] for r in rows) > 0


def test_approx_count_distinct_within_rsd(spark):
    """A6: approx_count_distinct must sit within a few rsd of the
    exact cardinality (rows-only in the driver harness; bounded
    here)."""
    from pyspark.sql import functions as F

    from elastic_freight_spark.session import load_tables

    orders = load_tables(spark, "/root/testdata/sf0.01")["orders"]
    exact = orders.select(F.countDistinct("o_custkey").alias("n")).first()["n"]
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.06  # 3x rsd
