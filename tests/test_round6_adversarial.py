"""Adversarial pins for the round-6 scale conversions: constructed
fixtures that force the code paths the natural TPC-H-ish data never
exercises — an ABC tie block STRADDLING a class boundary (the
explode-only-straddle path), a price value spanning several equidepth
bucket boundaries, single-row boxplot groups (the missing-upper-
neighbor COALESCE), and exact-multiple batch sizes. Every pin runs
the Spark plan AND the registered DuckDB oracle on the same fixture —
both engines must agree, not just not-crash."""
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from elastic_freight_spark import registry

LINEITEM_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_returnflag string"
)


def _write(spark, tmp_path, table, rows, schema):
    sf = str(tmp_path)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(f"{sf}/{table}.parquet")
    registry.load_all()
    return sf


def _both(spark, sf, name):
    from tests.oracle_util import oracle_df

    got = registry.QUERIES[name](spark, sf).toPandas()
    want = oracle_df(sf, registry.ORACLE[name])
    g = got.reindex(sorted(got.columns), axis=1).sort_values(
        by=sorted(got.columns), ignore_index=True
    )
    w = want.reindex(sorted(want.columns), axis=1).sort_values(
        by=sorted(want.columns), ignore_index=True
    )
    assert list(g.columns) == list(w.columns)
    assert len(g) == len(w), (name, len(g), len(w))
    for c in g.columns:
        gv, wv = list(g[c]), list(w[c])
        assert all(
            (a == b) or (abs(a - b) < 1e-9 if isinstance(a, float) else False)
            for a, b in zip(gv, wv)
        ), (name, c, gv, wv)
    return got


def test_abc_straddle_block_explodes_exactly(spark, tmp_path):
    """40 parts share ONE revenue value (each 2.5% of total): the 80%
    boundary lands INSIDE the tie block, so the straddle-explode path
    must split it 32/8 between A and B — and agree with the oracle's
    per-row cumulative row for row."""
    rows = [
        (i, i, 1, 1, 1.0, 100.0, 0.0, "N") for i in range(1, 41)
    ]
    sf = _write(spark, tmp_path, "lineitem", rows, LINEITEM_SCHEMA)
    got = _both(spark, sf, "part_abc_classification")
    by = {r["abc_class"]: int(r["n_parts"]) for _, r in got.iterrows()}
    # cum_j*5 <= total*4  =>  j <= 32 -> A; j <= 38 (0.95) -> B; else C
    assert by == {"A": 32, "B": 6, "C": 2}


def test_abc_block_skipping_class_b(spark, tmp_path):
    """One giant head part (96% of revenue) makes its OWN block jump
    straight from A to C territory for the tail: the head row is A
    (cum 96% > 80% but it's the FIRST row... cum*5 <= total*4 fails),
    so the head is actually B-or-C — pin the exact integer-threshold
    classification either engine computes."""
    rows = [(1, 1, 1, 1, 1.0, 9600.0, 0.0, "N")] + [
        (i, i, 1, 1, 1.0, 100.0, 0.0, "N") for i in range(2, 6)
    ]
    sf = _write(spark, tmp_path, "lineitem", rows, LINEITEM_SCHEMA)
    got = _both(spark, sf, "part_abc_classification")
    by = {r["abc_class"]: int(r["n_parts"]) for _, r in got.iterrows()}
    # head: cum=9600, total=10000 -> 9600*5 > 4*10000 -> not A;
    # 9600*20 > 19*10000 -> not B -> C... head alone is class C by the
    # cumulative definition (it overshoots both fences by itself);
    # remaining parts are deeper still -> C
    assert by == {"C": 5}


def test_equidepth_single_value_spans_buckets(spark, tmp_path):
    """16 identical prices + 8 distinct tail prices over 8 buckets:
    one value block covers several bucket boundaries — lo/hi must
    repeat that value across buckets exactly like the oracle NTILE."""
    rows = [(i, i, 1, i % 7 + 1, 1.0, 500.0, 0.0, "N") for i in range(16)]
    rows += [
        (100 + i, i, 1, 1, 1.0, 1000.0 + i, 0.0, "N") for i in range(8)
    ]
    sf = _write(spark, tmp_path, "lineitem", rows, LINEITEM_SCHEMA)
    got = _both(spark, sf, "agg_equidepth_histogram")
    assert len(got) == 8 and int(got["n_rows"].sum()) == 24


def test_equidepth_fewer_rows_than_buckets(spark, tmp_path):
    """n=5 < 8 buckets: NTILE assigns one row to each of the first 5
    buckets; buckets 6-8 must be ABSENT on both sides, not zero
    rows."""
    rows = [(i, i, 1, 1, 1.0, 100.0 * (i + 1), 0.0, "N") for i in range(5)]
    sf = _write(spark, tmp_path, "lineitem", rows, LINEITEM_SCHEMA)
    got = _both(spark, sf, "agg_equidepth_histogram")
    assert len(got) == 5
    assert sorted(int(b) for b in got["bucket"]) == [1, 2, 3, 4, 5]
    assert all(int(n) == 1 for n in got["n_rows"])


def test_boxplot_single_row_group(spark, tmp_path):
    """A group with ONE row: every quartile rank is 1, the upper
    neighbor is absent, and the COALESCE interpolation must yield the
    value itself with zero IQR and zero outliers — on both engines."""
    rows = [(1, 1, 1, 1, 1.0, 123.45, 0.0, "R")] + [
        (i, i, 1, 1, 1.0, 100.0 + i, 0.0, "N") for i in range(2, 12)
    ]
    sf = _write(spark, tmp_path, "lineitem", rows, LINEITEM_SCHEMA)
    got = _both(spark, sf, "agg_boxplot")
    r = {row["l_returnflag"]: row for _, row in got.iterrows()}
    assert r["R"]["q1"] == r["R"]["median"] == r["R"]["q3"] == 123.45
    assert r["R"]["iqr"] == 0.0 and int(r["R"]["n_outliers"]) == 0


DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_batch_padding_exact_multiple_of_batch(spark, tmp_path):
    """n an exact multiple of 32: no partial batch — the (n mod 32)
    term must contribute nothing and n_batches = n/32 on both
    sides."""
    rows = [
        (i, " ".join(["w"] * (1 + i % 5)), "en", "s", 10) for i in range(64)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS_SCHEMA)
    got = _both(spark, sf, "batch_padding_plan")
    assert all(int(n) == 2 for n in got["n_batches"])


def test_batch_padding_partial_batch(spark, tmp_path):
    """n = 33: the sorted strategy's partial batch holds ONE row (the
    longest doc), so it pads nothing; total padding comes from the
    full batch only — exact on both sides."""
    rows = [
        (i, " ".join(["w"] * (1 + i % 4)), "en", "s", 10) for i in range(33)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS_SCHEMA)
    got = _both(spark, sf, "batch_padding_plan")
    assert all(int(n) == 2 for n in got["n_batches"])


def test_skew_profile_uniform_and_hot_key(spark, tmp_path):
    """One hot supplier with 60 rows over 9 uniform ones (2 each):
    rank selections over the count distribution (max/median/p99) and
    the suggested salt count must agree with the oracle."""
    rows = [(i, i, 999, 1, 1.0, 10.0, 0.0, "N") for i in range(60)]
    rows += [
        (100 + 2 * s + j, s, s, 1, 1.0, 10.0, 0.0, "N")
        for s in range(1, 10)
        for j in range(2)
    ]
    sf = _write(spark, tmp_path, "lineitem", rows, LINEITEM_SCHEMA)
    got = _both(spark, sf, "skew_key_profile").iloc[0]
    assert int(got["n_keys"]) == 10 and int(got["max_n"]) == 60
    assert int(got["median_n"]) == 2
    # ceil(60 * 10 / 78) = 8 salts spread the hot key to ~average tasks
    assert int(got["suggested_salts"]) == -(-60 * 10 // 78)


def test_ntile_closed_form_matches_duckdb_exhaustively():
    """The NTILE closed form used by customer_rfm_segments (4 tiles)
    and agg_equidepth_histogram (8 tiles, as rank extents) must equal
    engine NTILE for EVERY n up to 200 and every rank — pure
    arithmetic, no Spark: first (n mod k) tiles take ceil(n/k)."""

    def closed(i, n, k):
        q, rem = divmod(n, k)
        if i <= rem * (q + 1):
            return (i - 1) // (q + 1) + 1
        return rem + (i - rem * (q + 1) - 1) // q + 1

    con = duckdb.connect()
    for k in (4, 8):
        for n in range(1, 201):
            want = [
                r[0]
                for r in con.execute(
                    f"SELECT NTILE({k}) OVER (ORDER BY i) FROM"
                    f" range({n}) t(i) ORDER BY i"
                ).fetchall()
            ]
            got = [closed(i, n, k) for i in range(1, n + 1)]
            assert got == want, (k, n)


def test_equidepth_bucket_extents_match_ntile_sizes():
    """The rank-extent formula the equidepth rewrite uses
    (R_b = b*(n div 8) + min(b, n mod 8)) must reproduce NTILE(8)
    bucket sizes for every n up to 500 — the closed form the oracle's
    NTILE is replaced by."""
    for n in range(1, 501):
        q, rem = divmod(n, 8)
        sizes = []
        prev = 0
        for b in range(1, 9):
            r_hi = b * q + min(b, rem)
            sizes.append(r_hi - prev)
            prev = r_hi
        want = [(q + 1 if b <= rem else q) for b in range(1, 9)]
        assert sizes == want and sum(sizes) == n
