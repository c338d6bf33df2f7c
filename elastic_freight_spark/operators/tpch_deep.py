"""Deep relational shapes: the remaining classic TPC-H query patterns
(Q4/Q7/Q8/Q9/Q11/Q12/Q13/Q14/Q16/Q17/Q18/Q19/Q21/Q22 — with these all
22 TPC-H shapes are registered), adapted to the FIXTURES.md
schema (no partsupp/commitdate/shipmode columns — each query keeps the
*shape* that stresses the optimizer: multi-way broadcast joins,
conditional market-share ratios, HAVING against a scalar subquery,
outer-join count distributions, NOT IN over a subquery, correlated
scalar averages, disjunctive pushdown, double-correlated EXISTS/NOT
EXISTS, and anti-join + scalar-threshold opportunity scans).

The reference delegates all querying to the Elasticsearch artifact it
builds (SURVEY.md §2.4: its only join-shaped machinery is the shard
shuffle in ESEmbededContainer + BaseTransport's missing-shard check);
this module supplies the deep relational surface natively on Catalyst.

Scale notes: every dimension side (region/nation/part/supplier/
customer at TPC-H ratios) is explicitly broadcast so the only fact
shuffles are the l_orderkey/l_partkey aggregations; self-joins on
lineitem (Q17 per-part average, Q21 other-supplier EXISTS) shuffle
both sides on the same key so AQE can coalesce, and the Q11/Q22
scalar thresholds ride the plan as broadcast 1-row aggregates rather
than driver-side `.first()` pulls (one scan, no extra job).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elastic_freight_spark.functions import (
    DEC,
    date_str,
    davg,
    dsum,
    dsum_cents,
    sql_davg,
    sql_dsum,
    sql_dsum_cents,
)
from elastic_freight_spark.registry import query
from elastic_freight_spark.session import load_tables

def _rev():
    # built lazily: pyspark 4 Column construction needs an active context
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           {sql_dsum(_SQL_REV, 'revenue')}
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. supplier/customer/nation are all broadcast; the nation
    filter lands on the dimension side BEFORE the join so the fact
    scan's join fan-in is pre-pruned, and the only shuffle is the
    final 3-key aggregation."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    joined = (
        li.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair | rpair)
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum(_rev(), "revenue"))


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                         THEN CAST(volume AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {_SQL_REV} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part
    market per order year — a conditional-sum ratio over a 7-table
    join where every non-lineitem side is broadcast. The share divides
    two exact decimal sums in one double op, so the ratio is identical
    at any partition count (and in DuckDB)."""
    t = load_tables(spark, sf_dir)
    n_supp = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n_cust = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("c_nk"))
    orders = t["orders"].filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    joined = (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_type") == "PROMO")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nk"))
    )
    dec = "decimal(18,4)"
    vol = _rev().cast(dec)
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast(dec)
    )
    return (
        joined.select(F.year("o_orderdate").alias("o_year"), vol.alias("v"),
                      nat_vol.alias("nv"))
        .groupBy("o_year")
        .agg((F.sum("nv").cast("double") / F.sum("v").cast("double")).alias("mkt_share"))
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           {sql_dsum_cents(f'{_SQL_REV} - p_retailprice * l_quantity * 0.1',
                           'sum_profit')}
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_brand IN ('Brand#5', 'Brand#15', 'Brand#25')
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation × order year. The
    fixture has no partsupp, so supply cost is proxied as 10% of
    retail price × quantity — same expression shape (revenue minus a
    part-joined cost term). part/supplier/nation broadcast; lineitem⋈
    orders is the one fact-fact shuffle. Profit is a true-scale-6
    computed value, so the sum rides dsum_cents (the scale-6
    DECIMAL->DOUBLE final cast leaves the engine-exact envelope past
    ~$9B per group — the q1 sum_charge finding from the 10x-replica
    sweep; cents stay exact to ~$90T, negatives included)."""
    t = load_tables(spark, sf_dir)
    profit = _rev() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    joined = (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter(
                    F.col("p_brand").isin("Brand#5", "Brand#15", "Brand#25")
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(dsum_cents(profit, "sum_profit"))


@query(
    "q11_value_concentration",
    oracle=f"""
    SELECT n_name, {sql_dsum(_SQL_REV, 'value')}
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING SUM(CAST({_SQL_REV} AS DECIMAL(18,4)))
         > (SELECT SUM(CAST({_SQL_REV} AS DECIMAL(18,4))) * 0.05
            FROM lineitem)
    """,
)
def q11_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape: groups whose aggregate exceeds a fraction of
    the global total (HAVING vs an uncorrelated scalar subquery). The
    global total rides the plan as a broadcast 1-row aggregate
    crossJoin — no driver-side `.first()` pull, so the fact table is
    scanned once per side of one job, not across two jobs."""
    t = load_tables(spark, sf_dir)
    dec = "decimal(18,4)"
    li = t["lineitem"].join(
        F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey")
    ).join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    per_nation = li.groupBy("n_name").agg(
        F.sum(_rev().cast(dec)).alias("_dec_value")
    )
    total = t["lineitem"].agg(
        (F.sum(_rev().cast(dec)) * F.lit(0.05)).alias("_threshold")
    )
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("_dec_value") > F.col("_threshold"))
        .select("n_name", F.col("_dec_value").cast("double").alias("value"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts,
    with the filter inside the OUTER join's ON clause (customers with
    zero matching orders must survive as c_count=0 — a WHERE would
    wrongly drop them). Two aggregations: the first shuffles on
    c_custkey, the second on the (tiny-cardinality) count value."""
    t = load_tables(spark, sf_dir)
    joined = t["customer"].join(
        t["orders"],
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_part_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    bucket, excluding a NOT IN supplier subquery (Catalyst plans a
    null-aware left-anti join; the exclusion side is tiny → broadcast).
    COUNT(DISTINCT) expands to a two-phase aggregate — partial distinct
    on (brand,size,suppkey), then the final count — no naive global
    de-dup."""
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = t["lineitem"].join(
        F.broadcast(bad_supp),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#5'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar average (lines below 20% of
    their part's mean quantity). The correlation decorrelates to a
    per-part aggregate joined back on l_partkey — both sides shuffle
    on the same key, so AQE coalesces them into one exchange reuse.
    Quantities are integer-valued doubles < 2^53, so the AVG is exact
    and the threshold comparison is engine-independent."""
    t = load_tables(spark, sf_dir)
    per_part = t["lineitem"].groupBy(F.col("l_partkey").alias("pp_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    brand = t["part"].filter(F.col("p_brand") == "Brand#5").select("p_partkey")
    small = (
        t["lineitem"]
        .join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pp_key"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return small.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0)
        .alias("avg_yearly")
    )


@query(
    "q19_disjunctive_brand_filter",
    oracle=f"""
    SELECT {sql_dsum(_SQL_REV, 'revenue')}
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_brand_filter(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive cross-table
    predicates. Catalyst distributes the single-table legs of the OR
    to each scan (lineitem gets quantity ∈ [1,50], part gets the
    brand/size union) before the join, then re-applies the full
    disjunction after — both pushdowns visible in the plan."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey")
    )
    leg = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return j.filter(
        leg("Brand#1", 1, 15, 1, 20)
        | leg("Brand#2", 10, 30, 10, 35)
        | leg("Brand#3", 20, 50, 20, 50)
    ).agg(dsum(_rev(), "revenue"))


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n_name IN ('NATION_4', 'NATION_5')
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: the sole-blame pattern — suppliers whose line
    was returned on finalized multi-supplier orders where NO other
    supplier's line was returned (commitdate/receiptdate aren't in the
    fixture; returnflag plays the 'failed the order' role). Two
    correlated self-joins with an inequality on the correlated column:
    EXISTS → left-semi, NOT EXISTS → left-anti, both shuffling
    lineitem on l_orderkey — the same key as the orders join, so the
    exchange is reused across all three."""
    t = load_tables(spark, sf_dir)
    nat = t["nation"].filter(F.col("n_name").isin("NATION_4", "NATION_5"))
    supp = t["supplier"].join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    l1 = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = t["lineitem"].select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    l3 = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key"))
    )
    with_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2_key"))
        & (F.col("l_suppkey") != F.col("s2_key")),
        "left_semi",
    )
    sole_blame = with_other.join(
        l3,
        (F.col("l_orderkey") == F.col("o3_key"))
        & (F.col("l_suppkey") != F.col("s3_key")),
        "left_anti",
    )
    return sole_blame.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


@query(
    "q22_dormant_customers",
    oracle=f"""
    SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS numcust,
           {sql_dsum('c_acctbal', 'totacctbal')}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_6', 'NATION_7', 'NATION_8')
      AND c_acctbal > (
        SELECT {sql_davg('c_acctbal', 'a')} FROM customer
        WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY n_name
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: high-balance customers (above the global
    positive-balance average — an uncorrelated scalar subquery riding
    the plan as a broadcast 1-row crossJoin) in target nations with no
    recent orders (anti-join against the date-filtered order set; the
    fixture's customers all have *some* order, so dormancy is defined
    against the last ~2.5 years). The anti-join's right side is the
    filtered o_custkey column — filter and projection both reach the
    scan."""
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal", "avg_bal"))
    )
    nat = t["nation"].filter(F.col("n_name").isin("NATION_6", "NATION_7", "NATION_8"))
    cust = (
        t["customer"]
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"]
            .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
    )
    return cust.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal")
    )


@query(
    "q21_waiting_suppliers_agg",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n_name IN ('NATION_4', 'NATION_5')
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers_agg(spark, sf_dir):
    """Q21's correlated EXISTS/NOT-EXISTS pair rewritten as ONE
    per-order aggregate: for an R-line, "another supplier exists" ⟺
    the order has ≥2 distinct suppliers, and "no other supplier's line
    was returned" ⟺ the order's distinct R-suppliers == 1 (this one).
    Replaces two lineitem self-joins with one groupBy(l_orderkey) and
    a join back. MEASURED verdict (sf0.1 / synthetic sf1): the
    semi/anti twin (`q21_waiting_suppliers`) wins 1.2s/4.4s vs this
    rewrite's 1.6s/9.2s — the double countDistinct pays a full-fact
    expand+two-phase aggregate, while the semi/anti probes run
    against the tiny pre-filtered l1 side. Kept as the measured
    counter-example: decorrelating to an aggregate is NOT
    automatically the scale win; it overtakes only when the probe
    side stops being selective (many qualifying rows per order).
    Same oracle, same rows."""
    t = load_tables(spark, sf_dir)
    per_order = t["lineitem"].groupBy(F.col("l_orderkey").alias("agg_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    nat = t["nation"].filter(F.col("n_name").isin("NATION_4", "NATION_5"))
    supp = t["supplier"].join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    l1 = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    return (
        l1.join(per_order, F.col("l_orderkey") == F.col("agg_key"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS cp_part, l_suppkey AS cp_supp,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT cp_part AS bp_part, MIN(unit_cost) AS best_cost
      FROM cost GROUP BY cp_part
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
    FROM cost
    JOIN best ON cp_part = bp_part AND unit_cost = best_cost
    JOIN part ON p_partkey = cp_part
    JOIN supplier ON s_suppkey = cp_supp
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE' AND p_size <= 15 AND p_type = 'STANDARD'
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-part minimum-cost supplier with a
    correlated scalar-min subquery, adapted to the fixture schema
    (no partsupp table — FIXTURES.md §B): "supply cost" is each
    supplier's best observed unit price MIN(l_extendedprice /
    l_quantity) over its lineitems for the part, which keeps the
    decorrelation shape (per-part aggregate joined back on part +
    exact cost equality) while staying engine-exact: IEEE division
    and MIN pick an actual row value, so Spark and the oracle agree
    bit-for-bit (no order-dependent float summation).

    Plan: both aggregates shuffle on l_partkey(+l_suppkey) so AQE
    reuses the exchange; part/supplier/nation/region are broadcast;
    the region+size+type filters prune the part side before the join
    (reference analogue: the ES artifact answers this with a
    top-hits agg per part — SURVEY.md §2.4)."""
    t = load_tables(spark, sf_dir)
    cost = (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("cp_part"),
            F.col("l_suppkey").alias("cp_supp"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.groupBy(F.col("cp_part").alias("bp_part")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    part = t["part"].filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    nat = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    supp = t["supplier"].join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        cost.join(
            best,
            (F.col("cp_part") == F.col("bp_part"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("cp_part"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("cp_supp"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "unit_cost")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST({_SQL_REV} AS DECIMAL(18,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the revenue view (quarterly per-supplier
    revenue) filtered to its own maximum — an uncorrelated scalar-max
    subquery over a derived aggregate. Revenue sums ride as
    DECIMAL(18,4) so the max-equality comparison is exact and
    order-independent in both engines (double sums would tie-break
    differently under reordering).

    Plan: one lineitem scan with the shipdate filter pushed down, one
    shuffle on l_suppkey; the max rides the plan as a broadcast 1-row
    aggregate crossJoin (no second job / driver pull); supplier is
    broadcast onto the (tiny) revenue view."""
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev().cast("decimal(18,4)")).alias("_dec_rev"))
    )
    top = revenue.agg(F.max("_dec_rev").alias("_max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("_dec_rev") == F.col("_max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("_dec_rev").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q20_dominant_part_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey AS sp_part, l_suppkey AS sp_supp,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ), part_total AS (
      SELECT sp_part AS pt_part, SUM(supp_qty) AS part_qty
      FROM shipped GROUP BY sp_part
    )
    SELECT DISTINCT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT sp_supp FROM shipped
        JOIN part_total ON sp_part = pt_part
        JOIN part ON p_partkey = sp_part
        WHERE p_name LIKE '%widget%'
          AND supp_qty > 0.3 * part_qty
      )
    """,
)
def q20_dominant_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: nested IN-subqueries with a correlated
    quantity threshold, adapted to the fixture schema (no partsupp /
    ps_availqty — FIXTURES.md §B): a supplier qualifies when it
    shipped more than 30% of a widget part's total 1996 volume
    (the original's "availqty > half the year's demand" becomes
    "supplies a dominant share of the year's demand"). Quantity sums
    ride as DECIMAL(18,4) so the 30%-threshold comparison is exact in
    both engines.

    Plan: one lineitem scan (date filter pushed down), one shuffle on
    (l_partkey, l_suppkey); the per-part total reuses that exchange
    (AQE); part's name filter is broadcast onto the shipped view; the
    qualifying-supplier set flows into a left-semi join against the
    nation-filtered supplier dim — no DISTINCT materialization."""
    t = load_tables(spark, sf_dir)
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("sp_part"),
            F.col("l_suppkey").alias("sp_supp"),
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("supp_qty"))
    )
    part_total = shipped.groupBy(F.col("sp_part").alias("pt_part")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    widget = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    qualifying = (
        shipped.join(part_total, F.col("sp_part") == F.col("pt_part"))
        .join(F.broadcast(widget), F.col("p_partkey") == F.col("sp_part"))
        .filter(F.col("supp_qty") > F.lit(0.3) * F.col("part_qty"))
        .select("sp_supp")
    )
    nat = t["nation"].filter(F.col("n_name") == "NATION_3")
    return (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("sp_supp"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "part_market_basket",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
    part_supp AS (
      SELECT l_partkey, COUNT(*) AS n_orders_with FROM items GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS co_count
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, CAST(co_count AS BIGINT) AS co_count,
           ROUND(co_count * n.n
                 / (CAST(pa.n_orders_with AS DOUBLE) * pb.n_orders_with),
                 9) AS lift
    FROM pairs
    JOIN part_supp pa ON pa.l_partkey = part_a
    JOIN part_supp pb ON pb.l_partkey = part_b
    CROSS JOIN n_orders n
    WHERE co_count >= 2
    ORDER BY co_count DESC, part_a, part_b
    LIMIT 20
    """,
)
def part_market_basket(spark, sf_dir):
    """Market-basket pair mining over order contents: which part
    pairs co-occur in the same order more than chance (lift =
    P(a,b) / P(a)P(b))? Top-20 by co-occurrence count.

    Scale shape: pair generation is the same bucket-expand plan as
    the capped exact-Jaccard candidate stage — collect the DISTINCT
    part set per order (bounded by items-per-order, single digits in
    this schema) and expand i<j pairs with a JVM higher-order
    expression. ONE shuffle on the order key, pair volume bounded at
    Σ items² per order — never Σ df² over parts, which is what a
    part-keyed self-join would cost when a popular part appears in
    millions of orders. Per-part totals join back as a broadcast
    (part-grain is dimension-sized); the global order count rides
    the plan as a 1-row crossJoin. Top-20 lands in
    TakeOrderedAndProject."""
    li = load_tables(spark, sf_dir)["lineitem"]
    # referenced three times (pair expansion, per-part totals, order
    # count): unmaterialized, each reference re-ran the fact scan +
    # distinct shuffle (round 11) — checkpoint the deduped
    # (order, part) frame once
    items = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        items.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .select(F.array_sort("parts").alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "  transform(slice(ps, i + 2, size(ps) - i - 1), "
                    "            y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.part_a", "p.part_b")
        .agg(F.count(F.lit(1)).alias("co_count"))
        .filter(F.col("co_count") >= 2)
    )
    part_supp = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_orders_with")
    )
    n_orders = items.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    pa = part_supp.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders_with").alias("na")
    )
    pb = part_supp.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders_with").alias("nb")
    )
    return (
        pairs.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .crossJoin(n_orders)
        .select(
            "part_a",
            "part_b",
            F.col("co_count").cast("bigint").alias("co_count"),
            F.round(
                F.col("co_count") * F.col("n")
                / (F.col("na").cast("double") * F.col("nb")),
                9,
            ).alias("lift"),
        )
        .orderBy(F.col("co_count").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "orders_otif_rate",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS mo,
             CAST(MAX(date_diff('day', CAST(o.o_orderdate AS TIMESTAMP),
                                CAST(l.l_shipdate AS TIMESTAMP)))
                  AS BIGINT) AS worst_lag
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )
    SELECT strftime(mo, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN worst_lag <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_otif,
           ROUND(SUM(CASE WHEN worst_lag <= 30 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 9) AS otif_rate
    FROM per_order
    GROUP BY mo
    ORDER BY month
    """,
)
def orders_otif_rate(spark, sf_dir):
    """On-time-in-full rate per order month: an order counts as OTIF
    when its SLOWEST line item ships within 30 days of the order date
    — the supply-chain KPI built on the max-over-lines reduction
    (in-full = every line, on-time = worst line's lag; the 30-day SLA
    is an integer day-diff compare). One fact join + per-order max +
    month rollup — two shuffles, both key-sized."""
    t = load_tables(spark, sf_dir)
    per_order = (
        t["orders"]
        .join(
            t["lineitem"],
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "o_orderkey",
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("mo"),
        )
        .agg(
            F.max(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")))
            .cast("bigint")
            .alias("worst_lag")
        )
    )
    otif = F.sum(F.when(F.col("worst_lag") <= 30, 1).otherwise(0))
    return (
        per_order.groupBy(F.date_format("mo", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            otif.cast("bigint").alias("n_otif"),
            F.round(otif / F.count(F.lit(1)).cast("double"), 9).alias(
                "otif_rate"
            ),
        )
        .orderBy("month")
    )


@query(
    "part_single_source_risk",
    oracle="""
    WITH vol AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS q
      FROM lineitem GROUP BY 1, 2
    ),
    per_part AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(q) AS DECIMAL(38,2)) AS q_tot,
             CAST(MAX(q) AS DECIMAL(38,2)) AS q_top
      FROM vol GROUP BY 1
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_parts,
      CAST(SUM(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_single_source,
      CAST(SUM(CASE WHEN q_top * 5 >= q_tot * 4 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_dominant_80,
      ROUND(SUM(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END)
            / CAST(COUNT(*) AS DOUBLE), 9) AS single_source_share
    FROM per_part
    """,
)
def part_single_source_risk(spark, sf_dir):
    """Supply-concentration risk screen: how many parts have exactly
    one shipping supplier, and how many have a DOMINANT supplier
    carrying ≥80% of shipped quantity — the procurement counterpart
    of `supplier_herfindahl` at the part grain (dual-sourcing
    policy's denominator). The 80% dominance test is the
    integer-discipline compare `q_top·5 >= q_tot·4` on exact DECIMAL
    quantity sums. Two key-sized aggregates over one scan."""
    li = load_tables(spark, sf_dir)["lineitem"]
    vol = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("q")
    )
    per_part = vol.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("q").cast("decimal(38,2)").alias("q_tot"),
        F.max("q").cast("decimal(38,2)").alias("q_top"),
    )
    single = F.sum(F.when(F.col("n_suppliers") == 1, 1).otherwise(0))
    return per_part.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        single.cast("bigint").alias("n_single_source"),
        F.sum(
            F.when(F.col("q_top") * 5 >= F.col("q_tot") * 4, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_dominant_80"),
        F.round(single / F.count(F.lit(1)).cast("double"), 9).alias(
            "single_source_share"
        ),
    )


@query(
    "customer_repeat_purchase_curve",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS rn
      FROM orders
    ),
    firsts AS (
      SELECT o_custkey, o_orderdate AS first_dt FROM ranked WHERE rn = 1
    ),
    seconds AS (
      SELECT o_custkey, o_orderdate AS second_dt FROM ranked WHERE rn = 2
    ),
    gaps AS (
      SELECT f.o_custkey,
             CAST(date_diff('day', f.first_dt, s.second_dt) AS BIGINT)
               AS gap_days
      FROM firsts f LEFT JOIN seconds s USING (o_custkey)
    )
    SELECT CAST(window_days AS INT) AS window_days,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN gap_days IS NOT NULL
                          AND gap_days <= window_days
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
           ROUND(SUM(CASE WHEN gap_days IS NOT NULL
                           AND gap_days <= window_days
                     THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 9) AS repeat_rate
    FROM gaps, (SELECT unnest([30, 90, 180, 365]) AS window_days)
    GROUP BY window_days
    ORDER BY window_days
    """,
)
def customer_repeat_purchase_curve(spark, sf_dir):
    """Repeat-purchase curve: the share of customers whose SECOND
    order lands within 30/90/180/365 days of their first — the
    retention economics number behind CAC payback. One customer-keyed
    window finds each customer's first two orders (rank 1 and 2 of
    the same total order — shared by construction, not by parallel
    definitions); gaps are integer day-diffs; the four windows are a
    4-row broadcast against the customer-sized gap frame. Customers
    with one order count in every denominator — that IS the churn
    signal."""
    from pyspark.sql import Window as W

    orders = load_tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = orders.select(
        "o_custkey", "o_orderdate", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 2)
    firsts = ranked.filter(F.col("rn") == 1).select(
        "o_custkey", F.col("o_orderdate").alias("first_dt")
    )
    seconds = ranked.filter(F.col("rn") == 2).select(
        "o_custkey", F.col("o_orderdate").alias("second_dt")
    )
    gaps = firsts.join(seconds, "o_custkey", "left").select(
        "o_custkey",
        F.datediff("second_dt", "first_dt").cast("bigint").alias(
            "gap_days"
        ),
    )
    windows = spark.range(1).select(
        F.explode(
            F.array(F.lit(30), F.lit(90), F.lit(180), F.lit(365))
        ).alias("window_days")
    )
    hit = F.sum(
        F.when(
            F.col("gap_days").isNotNull()
            & (F.col("gap_days") <= F.col("window_days")),
            1,
        ).otherwise(0)
    )
    return (
        gaps.crossJoin(F.broadcast(windows))
        .groupBy(F.col("window_days").cast("int").alias("window_days"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            hit.cast("bigint").alias("n_repeat"),
            F.round(hit / F.count(F.lit(1)).cast("double"), 9).alias(
                "repeat_rate"
            ),
        )
        .orderBy("window_days")
    )


# --- round 8: the four remaining TPC-H shapes (Q4/Q12/Q14/Q18) ------------
#
# With these, all 22 TPC-H query *shapes* are registered (the fixture
# has no commitdate/receiptdate/shipmode, so Q4's "late" predicate and
# Q12's lane dimension are adapted exactly the way Q21 adapted
# sole-blame to returnflag — the plan shapes are the canonical ones).
# Gap arithmetic follows the repo timestamp rule: integer microseconds
# via unix_micros/epoch_us on both sides, never cast-to-long.

_US_PER_DAY = 86_400 * 1_000_000


@query(
    "q4_order_priority",
    oracle=f"""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
              > {60 * _US_PER_DAY}
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: order-priority checking — how many orders per
    priority class in one quarter had at least one line that shipped
    late (no commitdate/receiptdate in the fixture, so 'late' = any
    line shipping >60 days after the order date; same correlated-
    EXISTS plan as the canonical query). The EXISTS is a left-semi
    join on l_orderkey with the gap predicate as an extra join
    condition — lineitem is projected to (l_orderkey, l_shipdate)
    before the shuffle, and the quarter filter prunes the orders scan
    first, so the semi-join's left side is ~1/28 of orders. One
    shuffle pair on the join key, then a 5-group aggregate."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    lines = t["lineitem"].select("l_orderkey", "l_shipdate")
    late_gap = (
        F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate")
        > F.lit(60 * _US_PER_DAY)
    )
    sel = orders.join(
        lines,
        (F.col("o_orderkey") == F.col("l_orderkey")) & late_gap,
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q12_shipping_lanes",
    oracle=f"""
    SELECT l_returnflag AS ship_lane,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND epoch_us(l_shipdate) - epoch_us(o_orderdate) > {30 * _US_PER_DAY}
      AND epoch_us(l_shipdate) - epoch_us(o_orderdate) <= {90 * _US_PER_DAY}
    GROUP BY l_returnflag
    """,
)
def q12_shipping_lanes(spark, sf_dir):
    """TPC-H Q12 shape: priority mix per shipping lane — lines shipped
    in 1997 within a (30, 90]-day order-to-ship window, split into
    urgent/high vs other order priorities per lane (the fixture has no
    l_shipmode; l_returnflag is the per-line categorical standing in
    as the lane, per the module's adaptation rule). The year filter
    reaches the lineitem scan; the gap window needs o_orderdate so it
    applies right after the one fact-fact join (both sides projected
    to 3 columns before the l_orderkey shuffle); the CASE split is a
    conditional-sum pair in a single 3-group aggregate — no second
    pass, no pivot."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    orders = t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority")
    gap = F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (gap > F.lit(30 * _US_PER_DAY)) & (gap <= F.lit(90 * _US_PER_DAY))
        )
        .groupBy(F.col("l_returnflag").alias("ship_lane"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST({_SQL_REV} AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST({_SQL_REV} AS DECIMAL(18,4))) AS DOUBLE)
               AS promo_share,
           {sql_dsum(f"CASE WHEN p_type = 'PROMO' THEN {_SQL_REV} ELSE 0 END",
                     'promo_revenue')},
           {sql_dsum(_SQL_REV, 'total_revenue')}
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: PROMO parts' share of one quarter's revenue.
    part is broadcast; the quarter filter reaches the lineitem scan;
    both the conditional and total revenue ride ONE aggregate pass as
    exact DECIMAL(18,4) sums (the q8_market_share discipline), and the
    share is a single IEEE division of the two exact sums — allowlisted
    unrounded per tests/test_round8_adversarial._UNROUNDED_FLOAT_ALLOW."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev4 = _rev().cast("decimal(18,4)")
    zero4 = F.lit(0).cast("decimal(18,4)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev4).otherwise(zero4))
    total = F.sum(rev4)
    return (
        li.join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (promo.cast("double") / total.cast("double")).alias("promo_share"),
            promo.cast("double").alias("promo_revenue"),
            total.cast("double").alias("total_revenue"),
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS orderdate,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: large-volume customers — the top 100 orders by
    total price whose summed line quantity exceeds 300. The quantity
    sum is DECIMAL-exact and the HAVING threshold is a decimal-vs-
    integer compare (never float). The aggregate runs on l_orderkey
    BEFORE the joins, so the orders join sees only the qualifying
    (rare: ~0.5%) orderkeys on the same key as the aggregate shuffle
    — AQE reuses the exchange — and customer is broadcast. Top-100
    plans as TakeOrderedAndProject with the unique o_orderkey as the
    deterministic tie-break under the price ordering."""
    t = load_tables(spark, sf_dir)
    qty = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 300)
    )
    j = (
        qty.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey")
        )
    )
    return (
        j.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            date_str("o_orderdate", "orderdate"),
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )
