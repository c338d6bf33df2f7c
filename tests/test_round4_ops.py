"""Unit tests for the round-4 wave-2 operators: funnel, weighted
median, heavy-hitter skew audit, compaction planner, part-name ER,
bigram LM scoring. Each also has a SQL oracle (test_oracle_parity
covers exact cross-engine values); these tests pin SEMANTICS against
independent twins (pandas/python brute force) and invariants."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def q():
    import __spark_entry__ as e

    return e.queries()


def test_funnel_monotone_and_bounded(spark, q):
    rows = {
        r["stage_no"]: r
        for r in q["events_funnel_conversion"](spark, SF_DIR_ORACLE).collect()
    }
    assert [rows[i]["stage"] for i in (1, 2, 3)] == [
        "view",
        "view>click",
        "view>click>purchase",
    ]
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
    assert rows[1]["conv_from_prev"] == 1.0
    for i in (2, 3):
        assert 0.0 <= rows[i]["conv_from_prev"] <= 1.0


def test_funnel_respects_event_order(spark, q):
    """A user whose purchase precedes every click must not reach
    stage 3 (funnel is ordered, not mere set-membership)."""
    from elastic_freight_spark.operators.temporal import events_funnel_conversion

    df = spark.createDataFrame(
        [
            # user 1: view -> click -> purchase (converts)
            (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 11:00:00", 1, "click", 1.0, "{}"),
            (3, "2024-01-01 12:00:00", 1, "purchase", 1.0, "{}"),
            # user 2: purchase BEFORE click -> stops at stage 2
            (4, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
            (5, "2024-01-01 10:30:00", 2, "purchase", 1.0, "{}"),
            (6, "2024-01-01 11:00:00", 2, "click", 1.0, "{}"),
            # user 3: click 8 days after view -> outside window
            (7, "2024-01-01 10:00:00", 3, "view", 1.0, "{}"),
            (8, "2024-01-09 11:00:00", 3, "click", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            r["stage_no"]: r["n_users"]
            for r in events_funnel_conversion(spark, d).collect()
        }
    assert out == {1: 3, 2: 2, 3: 1}


def test_weighted_median_matches_pandas_twin(spark, q, tables):
    got = {
        r["l_returnflag"]: float(r["weighted_median"])
        for r in q["agg_weighted_median"](spark, SF_DIR_ORACLE).collect()
    }
    from elastic_freight_spark.session import load_tables

    li = (
        load_tables(spark, SF_DIR_ORACLE)["lineitem"]
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    li["l_extendedprice"] = li["l_extendedprice"].astype(float)
    li["l_quantity"] = li["l_quantity"].astype(float)
    for flag, g in li.groupby("l_returnflag"):
        g = g.groupby("l_extendedprice", as_index=False)["l_quantity"].sum()
        g = g.sort_values("l_extendedprice")
        cum = g["l_quantity"].cumsum()
        tot = g["l_quantity"].sum()
        want = float(g.loc[cum * 2 >= tot, "l_extendedprice"].iloc[0])
        assert got[flag] == want, flag


def test_heavy_hitters_matches_pandas(spark, q):
    from elastic_freight_spark.session import load_tables

    got = q["skew_heavy_hitters"](spark, SF_DIR_ORACLE).collect()
    orders = load_tables(spark, SF_DIR_ORACLE)["orders"].select("o_custkey").toPandas()
    vc = orders["o_custkey"].value_counts()
    top = sorted(
        vc.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    assert [(r["o_custkey"], r["n_orders"]) for r in got] == top
    total, keys = len(orders), vc.size
    for r in got:
        assert r["share"] == round(r["n_orders"] / total, 9)
        assert r["x_over_avg"] == round(r["n_orders"] * keys / total, 9)


def test_compaction_bins_balanced(spark, q):
    rows = q["compaction_bin_packing"](spark, SF_DIR_ORACLE).collect()
    bins = sorted(r["bin"] for r in rows)
    assert bins == list(range(len(bins)))
    total = sum(r["rows_total"] for r in rows)
    # greedy size-desc linear scan: every bin except possibly the
    # last lands within one largest-part of the target
    fills = [r["fill_ratio"] for r in rows]
    assert all(f <= 2.0 for f in fills)
    assert sum(r["n_parts"] for r in rows) >= len(bins)
    assert total > 0


def test_er_pairs_invariants(spark, q):
    rows = q["er_part_name_match"](spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["lev_distance"] <= 4
        assert r["name_a"] < r["name_b"]
        assert r["name_a"].split(" ")[0] == r["name_b"].split(" ")[0]
        assert r["n_parts_a"] >= 1 and r["n_parts_b"] >= 1


def test_bigram_lm_flags_shuffled_text(spark):
    """Same token multiset, broken transitions: a scrambled doc must
    score a strictly higher mean bigram NLL than the fluent docs it
    was scrambled from — the property unigram LM scoring cannot see."""
    import tempfile

    from elastic_freight_spark.operators.text import text_bigram_lm_score

    sent = "the quick brown fox jumps over the lazy dog again and again"
    toks = sent.split()
    scrambled = " ".join(toks[::2] + toks[1::2][::-1])
    docs = [(i, sent, "en", "web", len(sent)) for i in range(20)]
    docs.append((99, scrambled, "en", "web", len(scrambled)))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r["mean_nll"]
            for r in text_bigram_lm_score(spark, d).collect()
        }
    fluent = out[0]
    assert out[99] > fluent, (out[99], fluent)


def test_dsir_scores_target_domain_higher(spark):
    """The importance estimator must rank docs that look like the
    target domain above off-target docs — DSIR's defining property.
    (The shipped testdata corpus shares ONE 31-word vocabulary across
    all langs, so the property is pinned on a synthetic corpus with a
    real distribution gap; the registered query on the shipped corpus
    is covered by its DuckDB oracle.)"""
    import tempfile

    from elastic_freight_spark.operators.sampling import dsir_importance_weights

    tgt_vocab = [f"t{i}" for i in range(30)]
    off_vocab = [f"o{i}" for i in range(30)]
    rows = []
    for d in range(30):
        words = [tgt_vocab[(d + j) % 30] for j in range(60)]
        rows.append((d, " ".join(words), "en", "web", 0))
    for d in range(30, 60):
        words = [off_vocab[(d + j) % 30] for j in range(60)]
        rows.append((d, " ".join(words), "de", "web", 0))
    # a held-out doc written in the target vocabulary but labeled
    # off-target: must still score like the target docs
    rows.append((99, " ".join(tgt_vocab * 2), "de", "web", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "documents.parquet"))
        out = {
            r["doc_id"]: r["log_importance"]
            for r in dsir_importance_weights(spark, dd).collect()
        }
    tgt = [out[d] for d in range(30)]
    off = [out[d] for d in range(30, 60)]
    assert min(tgt) > max(off)
    assert out[99] > max(off)


def test_stratified_det_fractions_and_stability(spark, q):
    rows = {r["lang"]: r for r in q["sample_stratified_det"](spark, SF_DIR_ORACLE).collect()}
    assert 0.10 <= rows["en"]["kept_frac"] <= 0.40  # target 0.25
    for lang, r in rows.items():
        if lang != "en":
            assert 0.55 <= r["kept_frac"] <= 0.95  # target 0.75
    # membership is a pure function of doc_id: recompute on a half
    # corpus and the kept counts of shared rows cannot change
    from pyspark.sql import functions as F

    from elastic_freight_spark.session import load_tables

    docs = load_tables(spark, SF_DIR_ORACLE)["documents"]
    h = F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    kept = h < F.when(F.col("lang") == "en", "4").otherwise("c")
    full = {r["doc_id"] for r in docs.filter(kept).select("doc_id").collect()}
    half = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 2 == 0)
        .filter(kept)
        .select("doc_id")
        .collect()
    }
    assert half == {d for d in full if d % 2 == 0}


def test_churn_labels_match_pandas(spark, q):
    from elastic_freight_spark.session import load_tables

    got = {
        r["o_custkey"]: (r["last_order"], r["n_orders"], r["churned"])
        for r in q["orders_churn_labels"](spark, SF_DIR_ORACLE).collect()
    }
    pdf = (
        load_tables(spark, SF_DIR_ORACLE)["orders"]
        .select("o_custkey", "o_orderdate")
        .toPandas()
    )
    mx = pdf["o_orderdate"].max()
    g = pdf.groupby("o_custkey")["o_orderdate"].agg(["max", "count"])
    for ck, row in g.iterrows():
        want_churn = 1 if row["max"] < mx - pd.Timedelta(days=90) else 0
        lo, n, ch = got[ck]
        assert (pd.Timestamp(lo), n, ch) == (row["max"], row["count"], want_churn), ck


def test_funnel_latency_matches_python_twin(spark, q):
    """Exact rank-percentile gaps recomputed in plain python from the
    same cascaded-min definition."""
    from elastic_freight_spark.session import load_tables

    rows = {
        r["hop"]: r for r in q["events_funnel_latency"](spark, SF_DIR_ORACLE).collect()
    }
    ev = (
        load_tables(spark, SF_DIR_ORACLE)["events"]
        .select("user_id", "event_type", "ts")
        .collect()
    )
    from collections import defaultdict
    from datetime import timedelta

    by_type = defaultdict(lambda: defaultdict(list))
    for r in ev:
        by_type[r["event_type"]][r["user_id"]].append(r["ts"])
    week = timedelta(days=7)
    t1 = {u: min(ts) for u, ts in by_type["view"].items()}
    t2 = {}
    for u, start in t1.items():
        cands = [t for t in by_type["click"].get(u, []) if start < t <= start + week]
        if cands:
            t2[u] = min(cands)
    t3 = {}
    for u, start in t2.items():
        cands = [t for t in by_type["purchase"].get(u, []) if start < t <= start + week]
        if cands:
            t3[u] = min(cands)

    def us(td):
        return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds

    def pct(gaps, mult, target):
        gaps = sorted(gaps)
        n = len(gaps)
        return next(g for i, g in enumerate(gaps, 1) if i * mult >= n * target)

    vc = [us(t2[u] - t1[u]) for u in t2]
    cp = [us(t3[u] - t2[u]) for u in t3]
    assert rows["view>click"]["n_users"] == len(vc)
    assert rows["view>click"]["median_gap_us"] == pct(vc, 2, 1)
    assert rows["view>click"]["p90_gap_us"] == pct(vc, 10, 9)
    assert rows["click>purchase"]["n_users"] == len(cp)
    assert rows["click>purchase"]["median_gap_us"] == pct(cp, 2, 1)
    assert rows["click>purchase"]["p90_gap_us"] == pct(cp, 10, 9)


def test_activity_streaks_match_python_twin(spark, q):
    from elastic_freight_spark.session import load_tables

    got = {
        r["user_id"]: (r["longest_streak_days"], r["streak_start"])
        for r in q["w_user_activity_streaks"](spark, SF_DIR_ORACLE).collect()
    }
    ev = (
        load_tables(spark, SF_DIR_ORACLE)["events"]
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    )
    from collections import defaultdict
    from datetime import timedelta

    days = defaultdict(set)
    for r in ev:
        days[r["user_id"]].add(r["day"])
    for u, ds in days.items():
        best_len, best_start = 0, None
        ds = sorted(ds)
        i = 0
        while i < len(ds):
            j = i
            while j + 1 < len(ds) and ds[j + 1] == ds[j] + timedelta(days=1):
                j += 1
            ln = j - i + 1
            if ln > best_len:
                best_len, best_start = ln, ds[i]
            i = j + 1
        assert got[u] == (best_len, str(best_start)), u
