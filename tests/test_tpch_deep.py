"""Deep TPC-H shapes (operators/tpch_deep.py): result properties that
the DuckDB differential can't see — outer-join zero-preservation,
disjunctive pushdown reaching both scans, semi/anti physical joins for
the correlated EXISTS pair, broadcast selection, and the
no-driver-side-scalar discipline (thresholds ride the plan)."""

import pytest
from pyspark.sql import functions as F

from elastic_freight_spark.operators.tpch_deep import (
    q8_market_share,
    q11_value_concentration,
    q13_customer_distribution,
    q16_part_supplier_variety,
    q17_small_quantity_revenue,
    q19_disjunctive_brand_filter,
    q21_waiting_suppliers,
    q22_dormant_customers,
)
from elastic_freight_spark.plans import (
    assert_broadcast_join,
    assert_no_python_in_plan,
    assert_pushed_filters,
)

SF_DIR = "/root/testdata/sf0.001"


def test_q13_keeps_zero_order_customers(spark, tables):
    """The priority filter lives in the outer join's ON clause, so
    customers with no qualifying orders must appear in the c_count=0
    bucket — and every customer must be accounted for exactly once."""
    dist = q13_customer_distribution(spark, SF_DIR)
    total = dist.agg(F.sum("custdist")).first()[0]
    assert total == tables["customer"].count()
    only_urgent = (
        tables["orders"]
        .groupBy("o_custkey")
        .agg(F.max(F.when(F.col("o_orderpriority") != "1-URGENT", 1).otherwise(0)).alias("any_other"))
        .filter(F.col("any_other") == 0)
        .count()
    )
    no_orders = (
        tables["customer"]
        .join(tables["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .count()
    )
    zero_bucket = dist.filter(F.col("c_count") == 0).select("custdist").first()
    assert (zero_bucket[0] if zero_bucket else 0) == only_urgent + no_orders


def test_q19_or_legs_pushed_to_scans(spark):
    """Catalyst distributes the OR's single-table legs: the lineitem
    scan gets a quantity envelope, the part scan gets the brand/size
    union — both visible as pushed filters."""
    df = q19_disjunctive_brand_filter(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert_pushed_filters(df, "Or(")
    assert_no_python_in_plan(df)


def test_q21_plans_semi_and_anti_joins(spark):
    """EXISTS → LeftSemi, NOT EXISTS → LeftAnti, both present; the
    supplier/nation side is broadcast."""
    df = q21_waiting_suppliers(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert_broadcast_join(df, expect=1)


def test_q21_sole_blame_semantics(spark, tables):
    """Brute-force recompute: for every (order, supplier) counted, the
    order must have another supplier's line and no other supplier's
    returned line."""
    rows = q21_waiting_suppliers(spark, SF_DIR).collect()
    got = {r["s_name"]: r["numwait"] for r in rows}

    li = tables["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag").collect()
    orders = {
        r["o_orderkey"]
        for r in tables["orders"].filter(F.col("o_orderstatus") == "F").collect()
    }
    supp = {
        r["s_suppkey"]: r["s_name"]
        for r in tables["supplier"]
        .join(
            tables["nation"].filter(F.col("n_name").isin("NATION_4", "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .collect()
    }
    by_order = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], []).append((r["l_suppkey"], r["l_returnflag"]))
    want = {}
    for ok_, lines in by_order.items():
        if ok_ not in orders:
            continue
        for sk, rf in lines:
            if rf != "R" or sk not in supp:
                continue
            others = [(s, f) for s, f in lines if s != sk]
            if others and not any(f == "R" for _, f in others):
                want[supp[sk]] = want.get(supp[sk], 0) + 1
    assert got == want


def test_scalar_thresholds_ride_the_plan(spark):
    """Q11/Q22/Q17/Q8: one action per query — thresholds and ratios
    are plan-side (broadcast 1-row aggregates / joined per-group
    averages), never `.first()` pulls, so building the DataFrame
    launches zero jobs and the plan stays Python-free."""
    for q in (
        q8_market_share,
        q11_value_concentration,
        q16_part_supplier_variety,
        q17_small_quantity_revenue,
        q22_dormant_customers,
    ):
        df = q(spark, SF_DIR)
        assert_no_python_in_plan(df)
        assert df.count() >= 0  # executes as a single job


def test_q11_threshold_matches_manual(spark, tables):
    """The HAVING threshold (5% of global revenue) must equal the
    manually computed decimal total."""
    dec = "decimal(18,4)"
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
    total = tables["lineitem"].agg(F.sum(rev)).first()[0]
    rows = q11_value_concentration(spark, SF_DIR).collect()
    assert rows, "expected at least one nation above the 5% threshold"
    for r in rows:
        assert r["value"] > float(total) * 0.05 * 0.999999


def test_q2_min_cost_is_per_part_minimum(spark, tables):
    """Every returned (part, supplier) pair must carry that part's
    true minimum unit price, and no cheaper supplier may exist for
    the part — verified against an independent window-free recompute."""
    from elastic_freight_spark.operators.tpch_deep import q2_min_cost_supplier

    res = q2_min_cost_supplier(spark, SF_DIR)
    rows = res.collect()
    assert rows, "q2 returned no rows at sf0.001"
    li = tables["lineitem"]
    manual = {
        r["l_partkey"]: r["m"]
        for r in li.groupBy("l_partkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("m"))
        .collect()
    }
    for r in rows:
        assert r["unit_cost"] == manual[r["p_partkey"]]


def test_q15_returns_only_the_max_revenue_supplier(spark):
    """All returned rows share one revenue value, and it is the max
    over the quarterly per-supplier revenue view."""
    from elastic_freight_spark.operators.tpch_deep import q15_top_supplier

    res = q15_top_supplier(spark, SF_DIR).collect()
    assert res, "q15 returned no rows"
    revs = {r["total_revenue"] for r in res}
    assert len(revs) == 1


def test_q20_plans_semi_join_and_stays_jvm(spark):
    """The qualifying-supplier IN-subquery must plan as a left-semi
    join (no DISTINCT materialization) and the whole plan stays
    Python-free with the date filter pushed to the lineitem scan."""
    from elastic_freight_spark.operators.tpch_deep import (
        q2_min_cost_supplier,
        q15_top_supplier,
        q20_dominant_part_suppliers,
    )

    df = q20_dominant_part_suppliers(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert_pushed_filters(df, "l_shipdate")
    for q in (q2_min_cost_supplier, q15_top_supplier, q20_dominant_part_suppliers):
        d = q(spark, SF_DIR)
        assert_no_python_in_plan(d)
        assert_broadcast_join(d)


def test_agg_composite_pagination_resumes_after_cursor(spark):
    """Page 2 must be exactly buckets 6..10 of the key-ordered full
    bucket list (cursor = last bucket of page 1), with the same
    counts as an unpaginated group-by."""
    from elastic_freight_spark import registry
    from elastic_freight_spark.operators.relational import (
        COMPOSITE_AFTER,
        COMPOSITE_PAGE_SIZE,
    )
    from elastic_freight_spark.session import load_tables
    from pyspark.sql import functions as F

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    got = [
        (r["source"], r["lang"], r["n_docs"], r["total_chars"])
        for r in registry.QUERIES["agg_composite_pagination"](
            spark, sf
        ).collect()
    ]
    full = sorted(
        (r["source"], r["lang"], r["n_docs"], r["total_chars"])
        for r in load_tables(spark, sf)["documents"]
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .collect()
    )
    after = [b for b in full if (b[0], b[1]) > COMPOSITE_AFTER]
    assert got == after[:COMPOSITE_PAGE_SIZE]


def test_er_blocking_efficiency_matches_python_recompute(spark):
    """Recompute all three blocking strategies' block/candidate/match
    counts in plain Python over the distinct part names."""
    from collections import defaultdict
    from itertools import combinations

    from elastic_freight_spark import registry
    from elastic_freight_spark.session import load_tables

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    got = {
        r["strategy"]: (r["n_blocks"], r["n_candidates"], r["n_matches"])
        for r in registry.QUERIES["er_blocking_efficiency"](spark, sf).collect()
    }
    names = sorted(
        r["p_name"]
        for r in load_tables(spark, sf)["part"].select("p_name").distinct().collect()
    )
    keys = {
        "first_token": lambda n: n.split(" ")[0],
        "last_token": lambda n: n.split(" ")[-1],
        "length_band": lambda n: str(len(n) // 5),
    }
    want = {}
    for sname, keyf in keys.items():
        blocks = defaultdict(list)
        for n in names:
            blocks[keyf(n)].append(n)
        cand = matches = 0
        for blk in blocks.values():
            for a, b in combinations(sorted(blk), 2):
                cand += 1
                if 1 <= lev(a, b) <= 4:
                    matches += 1
        want[sname] = (len(blocks), cand, matches)
    assert got == want


def test_supplier_herfindahl_matches_python_recompute(spark):
    """HHI per nation recomputed in plain Python from exact cent
    revenues."""
    from collections import defaultdict
    from decimal import Decimal

    from elastic_freight_spark import registry
    from elastic_freight_spark.session import load_tables

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    got = {
        r["nation"]: (r["n_suppliers"], r["nation_rev"], r["hhi"])
        for r in registry.QUERIES["supplier_herfindahl"](spark, sf).collect()
    }
    t = load_tables(spark, sf)
    nation = {
        r["n_nationkey"]: r["n_name"] for r in t["nation"].collect()
    }
    supp_nation = {
        r["s_suppkey"]: r["s_nationkey"] for r in t["supplier"].collect()
    }
    rev = defaultdict(lambda: defaultdict(Decimal))
    for r in t["lineitem"].select("l_suppkey", "l_extendedprice").collect():
        nk = supp_nation[r["l_suppkey"]]
        rev[nk][r["l_suppkey"]] += Decimal(str(round(r["l_extendedprice"], 2)))
    for nk, sup in rev.items():
        total = sum(sup.values())
        hhi = sum(
            (float(v) / float(total)) ** 2 for v in sup.values()
        )
        g = got[nation[nk]]
        assert g[0] == len(sup)
        assert abs(g[1] - float(total)) < 0.01
        assert abs(g[2] - round(hhi, 9)) < 1e-8
        assert 1.0 / len(sup) - 1e-9 <= g[2] <= 1.0


def test_part_substitution_candidates_semantics(spark):
    """Every suggested substitute shares (type, size), differs in
    brand, undercuts the price, and is the cheapest such alternative
    (ties to lowest partkey); savings are positive and sorted."""
    from elastic_freight_spark import registry
    from elastic_freight_spark.session import load_tables

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["part_substitution_candidates"](spark, sf).collect()
    assert rows
    savings = [r["saving"] for r in rows]
    assert savings == sorted(savings, reverse=True)
    parts = {
        r["p_partkey"]: (r["p_brand"], r["p_type"], r["p_size"], r["p_retailprice"])
        for r in load_tables(spark, sf)["part"].collect()
    }
    for r in rows:
        brand, ptype, size, price = parts[r["p_partkey"]]
        abrand, atype, asize, aprice = parts[r["alt_partkey"]]
        assert (ptype, size) == (atype, asize)
        assert brand != abrand
        assert aprice < price
        assert r["saving"] > 0
        best = min(
            (p, k)
            for k, (b2, t2, s2, p) in parts.items()
            if t2 == ptype and s2 == size and b2 != brand and p < price
        )
        assert (round(best[0], 2), best[1]) == (r["alt_price"], r["alt_partkey"])


# --- round 8: the final four TPC-H shapes (Q4/Q12/Q14/Q18) ----------------


def test_q4_plans_semi_join_with_gap_condition(spark):
    """The EXISTS must be a physical left-semi join (not an inner join
    + distinct), with the quarter filter pushed to the orders scan."""
    from elastic_freight_spark.operators.tpch_deep import q4_order_priority

    df = q4_order_priority(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert_pushed_filters(df, "o_orderdate")
    assert_no_python_in_plan(df)


def test_q4_counts_match_manual_exists(spark, tables):
    """Each priority bucket equals a manual recompute: distinct
    quarter orders having any line with ship-order gap > 60 days."""
    from elastic_freight_spark.operators.tpch_deep import q4_order_priority

    got = {
        r["o_orderpriority"]: r["order_count"]
        for r in q4_order_priority(spark, SF_DIR).collect()
    }
    o = tables["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    manual = (
        o.join(tables["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate")
            > 60 * 86_400 * 1_000_000
        )
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert got == {r["o_orderpriority"]: r["count"] for r in manual}
    assert sum(got.values()) > 0


def test_q12_high_low_partition_the_window(spark, tables):
    """high + low line counts must exactly partition the lines inside
    the (30, 90]-day gap window shipped in 1997 — no line dropped or
    double-counted by the CASE split."""
    from elastic_freight_spark.operators.tpch_deep import q12_shipping_lanes

    out = q12_shipping_lanes(spark, SF_DIR).collect()
    gap = F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate")
    expected = (
        tables["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(tables["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (gap > 30 * 86_400 * 1_000_000) & (gap <= 90 * 86_400 * 1_000_000)
        )
        .count()
    )
    assert sum(r["high_line_count"] + r["low_line_count"] for r in out) == expected
    assert expected > 0


def test_q14_share_is_the_single_division_of_its_own_sums(spark):
    """promo_share must equal promo_revenue / total_revenue bit-exactly
    (all three ride ONE aggregate), part is broadcast, and the quarter
    filter reaches the lineitem scan."""
    from elastic_freight_spark.operators.tpch_deep import q14_promo_revenue

    df = q14_promo_revenue(spark, SF_DIR)
    assert_broadcast_join(df)
    assert_pushed_filters(df, "l_shipdate")
    row = df.first()
    assert row["promo_share"] == row["promo_revenue"] / row["total_revenue"]
    assert 0.0 < row["promo_share"] < 1.0
    assert row["promo_revenue"] < row["total_revenue"]


def test_q18_threshold_ordering_and_plan(spark, tables):
    """Every emitted order's quantity sum must really exceed 300
    (recomputed from lineitem), rows arrive price-descending with the
    unique orderkey tie-break, and the top-100 plans as
    TakeOrderedAndProject (no global sort materialization)."""
    from elastic_freight_spark.operators.tpch_deep import (
        q18_large_volume_customers,
    )

    df = q18_large_volume_customers(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= 100
    keys = [(-r["o_totalprice"], r["o_orderkey"]) for r in rows]
    assert keys == sorted(keys)
    recomputed = {
        r["l_orderkey"]: r["q"]
        for r in tables["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .collect()
    }
    for r in rows:
        assert float(recomputed[r["o_orderkey"]]) == r["total_qty"]
        assert r["total_qty"] > 300
