"""Regression: naive-parquet timestamps must never surface as
TIMESTAMP_NTZ to operators.

The driver's testdata carries events.ts as parquet ``timestamp[us]``
with ``isAdjustedToUTC=false``; Spark 4's default
``spark.sql.parquet.inferTimestampNTZ.enabled=true`` reads that as
TIMESTAMP_NTZ, a type that supports neither ``CAST(ts AS BIGINT)`` nor
``unix_micros(ts)`` — round 2's bench and two CORRECTNESS rows died on
exactly this (BENCH_r02.json rc=1). ``load_tables`` now normalizes any
NTZ column to TIMESTAMP_LTZ (session tz = UTC, so rendered values and
the DuckDB-oracle comparison are unchanged). These tests pin that.
"""

import pytest
from pyspark.sql.types import TimestampNTZType, TimestampType

from tests.conftest import SF_DIR


def test_loaded_events_ts_is_ltz(tables):
    assert isinstance(tables["events"].schema["ts"].dataType, TimestampType)
    for name, df in tables.items():
        for f in df.schema.fields:
            assert not isinstance(f.dataType, TimestampNTZType), (
                f"{name}.{f.name} leaked TIMESTAMP_NTZ"
            )


def test_raw_read_is_ntz_without_normalization(spark):
    # Sanity that the hazard is real in this environment: a bare read
    # (inferTimestampNTZ on) yields NTZ — i.e. load_tables' cast is
    # doing the protection, not a lucky reader default.
    prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
        assert isinstance(raw.schema["ts"].dataType, TimestampNTZType)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)


@pytest.mark.parametrize(
    "name",
    [
        "t3_session_windows",
        "t_sessionize_gaps",
        "t2_tumbling_window_events",
        "t_ewma_events",
        "t_funnel_click_to_purchase",
        "join_asof_click_before_purchase",
    ],
)
def test_epoch_arithmetic_queries_run_on_real_testdata(spark, name):
    # The r2 failures resolved epoch math against the raw column; run
    # every epoch-arithmetic query end-to-end on the real parquet.
    from elastic_freight_spark import registry

    registry.load_all()
    assert registry.QUERIES[name](spark, SF_DIR).count() > 0


def test_t_interval_coverage_matches_python_recompute(spark):
    """Merge the 5-minute activity intervals per user in plain Python
    and compare n_islands / covered_us / span_us exactly."""
    from collections import defaultdict

    from elastic_freight_spark import registry
    from elastic_freight_spark.operators.temporal import COVERAGE_WINDOW_US
    from elastic_freight_spark.session import load_tables

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_islands"], r["covered_us"], r["span_us"])
        for r in registry.QUERIES["t_interval_coverage"](spark, sf).collect()
    }
    per_user = defaultdict(list)
    for row in (
        load_tables(spark, sf)["events"]
        .selectExpr("user_id", "unix_micros(ts) AS s")
        .collect()
    ):
        per_user[row["user_id"]].append(row["s"])
    want = {}
    for uid, starts in per_user.items():
        starts.sort()
        islands = []
        for s in starts:
            e = s + COVERAGE_WINDOW_US
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        want[uid] = (
            len(islands),
            sum(e - s for s, e in islands),
            islands[-1][1] - islands[0][0],
        )
    assert got == want
