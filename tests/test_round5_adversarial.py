"""Adversarial pins for the round-5 continuation tier: constructed
corner cases (exact timestamp ties, heavy value ties, zero-activity
gaps) that the fixture data doesn't naturally exercise."""
import datetime as dt

from pyspark.sql import functions as F

from elastic_freight_spark import registry

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, tmp_path, rows):
    sf = str(tmp_path)
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    registry.load_all()
    return sf


def test_attribution_click_at_exact_purchase_timestamp(spark, tmp_path):
    """A click at EXACTLY the purchase timestamp attributes (c_ts <=
    p_ts is inclusive), and among same-timestamp clicks the larger
    event_id wins."""
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        # user 1: click k=0 (organic) strictly before; click k=1
        # (paid) at EXACT purchase ts with larger event_id -> paid
        (1, t0 - dt.timedelta(hours=1), 1, "click", 0.0, '{"k": 0}'),
        (2, t0, 1, "click", 0.0, '{"k": 1}'),
        (3, t0, 1, "purchase", 50.0, "{}"),
        # user 2: two clicks at the same exact ts -> larger event_id
        # (k=2, email) wins
        (4, t0, 2, "click", 0.0, '{"k": 1}'),
        (5, t0, 2, "click", 0.0, '{"k": 2}'),
        (6, t0, 2, "purchase", 10.0, "{}"),
        # user 3: click only AFTER the purchase -> unattributed
        (7, t0 + dt.timedelta(seconds=1), 3, "click", 0.0, '{"k": 3}'),
        (8, t0, 3, "purchase", 99.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r["channel"]: (r["n_conversions"], r["attributed_value"])
        for r in registry.QUERIES["events_attribution_last_touch"](
            spark, sf
        ).collect()
    }
    assert out == {"paid": (1, 50.0), "email": (1, 10.0)}


def test_mann_whitney_all_ties_yields_null_z(spark, tmp_path_factory):
    """Every pooled value identical: sigma = 0 -> z IS NULL (the ANSI
    guard), U equals its tie-average expectation n_r*n_n/2."""
    import pyspark.sql.functions as F

    registry.load_all()
    sf = str(tmp_path_factory.mktemp("mw_ties"))
    rows = [(i, i % 7, 1, 100.0, "R" if i % 2 else "N") for i in range(40)]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int,"
        " l_extendedprice double, l_returnflag string",
    ).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    r = registry.QUERIES["stats_mann_whitney_u"](spark, sf).collect()[0]
    assert r["z_score"] is None
    assert r["u_stat"] == r["n_r"] * r["n_n"] / 2


def test_ks_identical_samples_zero_distance(spark, tmp_path_factory):
    registry.load_all()
    sf = str(tmp_path_factory.mktemp("ks_same"))
    rows = []
    for i in range(60):
        rows.append((2 * i, 1, 1, float(100 + (i % 10)), "R"))
        rows.append((2 * i + 1, 1, 1, float(100 + (i % 10)), "N"))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int,"
        " l_extendedprice double, l_returnflag string",
    ).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    r = registry.QUERIES["stats_ks_two_sample"](spark, sf).collect()[0]
    assert r["d_num"] == 0 and r["d_stat"] == 0.0
    assert r["reject_005"] is False


def test_dau_wau_mau_with_gap_days(spark, tmp_path):
    """A user active on day 0 only still counts toward WAU for 7 days
    and MAU for 30; days with zero events produce no DAU row but the
    trailing windows stay correct on the surrounding days."""
    t0 = dt.datetime(2024, 2, 1)
    rows = [(1, t0, 1, "view", 1.0, "{}")]
    # second user active on day 10 only
    rows.append((2, t0 + dt.timedelta(days=10), 2, "view", 1.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)
    out = {r["day"]: r for r in registry.QUERIES["events_dau_wau_mau"](
        spark, sf
    ).collect()}
    # report starts at lo+6 = Feb 7; only day 10 (Feb 11) has DAU>0
    assert list(out) == ["2024-02-11"]
    r = out["2024-02-11"]
    # user1's 7-day window (days 0-6) has expired; user2 active
    assert (r["dau"], r["wau"]) == (1, 1)
    # user1 still inside the 30-day window
    assert r["mau"] == 2
    assert r["full_mau"] is False


def test_vacuum_then_compaction_roundtrip(spark, tmp_path_factory):
    """VACUUM followed by copy-on-write compaction leaves a clean
    tree whose plain read equals the pre-vacuum latest view."""
    from elastic_freight_spark.indexer import (
        IndexConfig,
        apply_vacuum,
        build_index,
        compact_index_upserts,
        read_index,
        read_index_latest,
        upsert_index,
    )
    from elastic_freight_spark.session import load_tables

    events = load_tables(spark, "/root/testdata/sf0.001")["events"]
    base = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    out = str(tmp_path_factory.mktemp("vacomp"))
    man = build_index(
        base, IndexConfig("vc_idx", "user_id", 4, out, routing="lcg")
    )
    upd = base.filter(F.col("user_id") % 2 == 0)
    for bump in (1, 2):
        upsert_index(upd.withColumn("n", F.col("n") + bump), man["path"])
    before = {
        r["user_id"]: r["n"]
        for r in read_index_latest(spark, man["path"]).collect()
    }
    apply_vacuum(spark, man["path"], keep_versions=0)
    compact_index_upserts(spark, man["path"])
    after = {
        r["user_id"]: r["n"]
        for r in read_index(spark, man["path"]).collect()
    }
    assert after == before


def test_boxplot_constant_column_no_outliers(spark, tmp_path_factory):
    """Degenerate spread: a constant column has IQR=0 and fences equal
    to the value — zero outliers, no errors, in both engines' terms."""
    registry.load_all()
    sf = str(tmp_path_factory.mktemp("bx_const"))
    rows = [(i, 1, 1, 500.0, "R") for i in range(20)]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int,"
        " l_extendedprice double, l_returnflag string",
    ).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    r = registry.QUERIES["agg_boxplot"](spark, sf).collect()[0]
    assert (r["q1"], r["median"], r["q3"]) == (500.0, 500.0, 500.0)
    assert r["iqr"] == 0.0
    assert r["n_outliers"] == 0


def _oracle_df(sf, name):
    """Run a registered query's DuckDB oracle against a fixture dir."""
    from tests.oracle_util import oracle_df

    return oracle_df(sf, registry.ORACLE[name])


def test_theil_sen_one_day_series_degenerate(spark, tmp_path):
    """A single-day series has zero pairwise slopes: BOTH engines must
    emit exactly one row (n_days=1, n_pairs=0, NULL slope/intercept) —
    the round-5 advice found the Spark side returned zero rows while
    the oracle's FROM-less scalar-subquery SELECT always emits one."""
    t0 = dt.datetime(2024, 6, 1, 8, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "view", 1.0, "{}")
        for i in range(5)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = registry.QUERIES["t_theil_sen_trend"](spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_days"], r["n_pairs"], r["slope"], r["intercept"]) == (
        1,
        0,
        None,
        None,
    )
    o = _oracle_df(sf, "t_theil_sen_trend")
    assert len(o) == 1
    assert int(o["n_days"][0]) == 1 and int(o["n_pairs"][0]) == 0
    assert o["slope"].isna()[0] and o["intercept"].isna()[0]


def test_power_analysis_zero_baseline_degenerate(spark, tmp_path):
    """A corpus with no qualifying conversion (no purchase with value
    >= 200) has p0 = 0, so delta = 0: the NULLIF guard must degrade
    n_per_arm (and feasible_now) to NULL in BOTH engines instead of
    DIVIDE_BY_ZERO in Spark / CAST(inf) failure in DuckDB."""
    t0 = dt.datetime(2024, 6, 1, 8, 0, 0)
    rows = [
        (1, t0, 1, "purchase", 50.0, "{}"),
        (2, t0, 2, "purchase", 199.0, "{}"),
        (3, t0, 3, "view", 0.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = registry.QUERIES["events_ab_power_analysis"](spark, sf).collect()
    assert len(got) == 3
    for r in got:
        assert r["baseline_cr"] == 0.0
        assert r["n_per_arm"] is None
        assert r["feasible_now"] is None
    o = _oracle_df(sf, "events_ab_power_analysis")
    assert len(o) == 3
    assert o["n_per_arm"].isna().all()
