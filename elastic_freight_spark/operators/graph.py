"""Graph metrics over the supplier co-supply network (SURVEY.md §2
"beyond the reference" tier, extending the round-3 PageRank): the
reference's artifact serves entity lookups, but a procurement /
risk-analysis user of the same data asks structural questions —
how clustered is the supplier substitutability network, what does
its degree distribution look like — so the engine owns them as
first-class, oracle-checked queries.

Graph = suppliers as nodes; an undirected edge (u, v), u < v, when
two suppliers ship at least one common part (same edge set as
``scale.supplier_pagerank``, reference parity note there).

Scale shapes:

* Edge construction is a part-keyed self-join — bounded per part by
  suppliers-per-part (a dimension-ish fan-out), never all-pairs of
  suppliers.
* Triangle counting is the standard wedge-close plan: one join to
  enumerate wedges u<v<w (the u<v ordering on BOTH edge endpoints is
  the degree-orientation trick that keeps each triangle counted
  exactly once and caps wedge fan-out), one semi-join to close them.
  Two shuffles on edge keys, no driver-side state.
* The degree histogram is two hash aggregates (node degree → degree
  frequency) — shuffles are node- then degree-sized.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elastic_freight_spark.registry import query
from elastic_freight_spark.session import load_tables

_EDGES_SQL = """
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
"""


def cosupply_edges(spark, sf_dir):
    """Distinct undirected (u < v) supplier co-supply edges."""
    ps = (
        load_tables(spark, sf_dir)["lineitem"]
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    a = ps.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("u"))
    b = ps.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("v"))
    return (
        a.join(b, "pk")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


@query(
    "supplier_triangle_count",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    wedges AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1 JOIN edges e2 ON e1.v = e2.u
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(DISTINCT u) FROM
                  (SELECT u FROM edges UNION ALL SELECT v FROM edges) t(u))
                AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM wedges w
    JOIN edges e3 ON e3.u = w.a AND e3.v = w.c
    """,
)
def supplier_triangle_count(spark, sf_dir):
    """Triangle census of the co-supply graph (one row: nodes, edges,
    triangles — the inputs to global clustering coefficient). Wedge
    enumeration joins the u<v-oriented edge list with itself
    (e1.v = e2.u gives a<b<c wedges), then an equi-join against the
    edge list closes them; each triangle appears exactly once by the
    total order on its vertices."""
    edges = cosupply_edges(spark, sf_dir)
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b")
    closed = wedges.join(
        edges.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
    )
    nodes = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .agg(F.countDistinct("n").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        n_edges.crossJoin(nodes)
        .crossJoin(tri)
        .select("n_edges", "n_nodes", "n_triangles")
    )


@query(
    "graph_degree_histogram",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    deg AS (
      SELECT u AS node, COUNT(*) AS degree
      FROM (SELECT u FROM edges UNION ALL SELECT v AS u FROM edges) t(u)
      GROUP BY u
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM deg
    GROUP BY degree
    ORDER BY degree
    """,
)
def graph_degree_histogram(spark, sf_dir):
    """Degree distribution of the co-supply graph — the first thing a
    graph operator plots before choosing algorithms (heavy-tail ⇒
    salt/skew-handle the hub nodes; bounded ⇒ plain hash joins are
    fine). Two hash aggregates over the edge endpoint stream."""
    edges = cosupply_edges(spark, sf_dir)
    endpoints = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = endpoints.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
        .select(F.col("degree").cast("bigint").alias("degree"), "n_suppliers")
        .orderBy("degree")
    )
