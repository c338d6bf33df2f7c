"""Subquery / SQL-entry-point surface: EXISTS, IN, HAVING, scalar
subqueries, and CASE aggregation — run through ``spark.sql`` over the
registered temp views, so this module also pins the engine's second
query entry point (SURVEY.md §3: ``engine.sql(str)`` and the
DataFrame builder compile to the same Catalyst pipeline).

Catalyst rewrites every decorrelatable subquery to a join
(EXISTS → left-semi, NOT EXISTS → left-anti, IN → semi,
scalar agg subquery → cross of a 1-row aggregate) — asserted in
tests/test_plans.py; the reference has no subquery machinery at all,
its only anti-join-shaped logic being missing-shard detection
(transport/BaseTransport.java:144-167).
"""

from __future__ import annotations

from elastic_freight_spark.registry import query
from elastic_freight_spark.session import load_tables

_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""

_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate
GROUP BY l_returnflag
"""

_Q14 = """
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6)) {ZERO} END)
            AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""

_Q18 = """
SELECT c_custkey, o_orderkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250
)
GROUP BY c_custkey, o_orderkey
"""

_SCALAR = """
SELECT n_name, COUNT(*) AS n_above
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
GROUP BY n_name
"""


def _sql(spark, sf_dir, stmt: str):
    load_tables(spark, sf_dir)
    return spark.sql(stmt)


@query("sq4_exists_returned_orders", oracle=_Q4)
def sq4_exists_returned_orders(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS-correlated subquery (orders with a
    returned line item) → Catalyst plans a left-semi join; count per
    priority bucket."""
    return _sql(spark, sf_dir, _Q4)


@query("sq12_priority_case_agg", oracle=_Q12)
def sq12_priority_case_agg(spark, sf_dir):
    """TPC-H Q12 shape: CASE-conditional aggregation over a join with
    cross-table date predicates (shipped strictly after order date)."""
    return _sql(spark, sf_dir, _Q12)


@query(
    "sq14_promo_revenue",
    oracle=_Q14.format(ZERO="ELSE CAST(0 AS DECIMAL(18,6))"),
)
def sq14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional revenue share (LIKE-predicated
    CASE inside an exact decimal sum)."""
    return _sql(spark, sf_dir, _Q14.format(ZERO="ELSE CAST(0 AS DECIMAL(18,6))"))


@query("sq18_in_having_subquery", oracle=_Q18)
def sq18_in_having_subquery(spark, sf_dir):
    """TPC-H Q18 shape: IN over an aggregated HAVING subquery (semi
    join against a derived aggregate)."""
    return _sql(spark, sf_dir, _Q18)


@query("sq_scalar_avg_balance", oracle=_SCALAR)
def sq_scalar_avg_balance(spark, sf_dir):
    """Uncorrelated scalar subquery threshold (customers above the
    global average balance, counted per nation)."""
    return _sql(spark, sf_dir, _SCALAR)
