"""Scale patterns (SURVEY.md §2.3 R5, §4): skew-salted joins and
bucketed (pre-shuffled) co-located joins.

The reference's only answer to skew is documented intent: route each
org to a *subset* of shards instead of one
(ElasticsearchRoutingStrategyV5.java:18-40 javadoc — the V5 impl
collapses to 1 shard/org, i.e. the hot-org problem is acknowledged,
unsolved). At 100 TB these are the two Spark-native answers:

* **Salting** — split each hot key into ``n_salts`` sub-keys so one
  executor never owns a whole hot key. The dim side is exploded
  ``n_salts``× (tiny), the fact side gets a deterministic salt from a
  high-cardinality column (NOT ``rand()`` — retries must route rows
  identically). AQE's skew-join handles moderate skew automatically;
  salting is for the pathological keys AQE can't split (a single
  group too big for any one task).
* **Bucketing** — pay the shuffle once at write time
  (``bucketBy(n, key)`` + ``sortBy``), then every future join/agg on
  that key runs with NO exchange: Catalyst sees compatible output
  partitioning on both sides. This is the reference's
  1-reducer-per-shard layout promoted to a reusable table property.
  Both sides must share bucket count and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from elastic_freight_spark.functions import dsum, sql_dsum
from elastic_freight_spark.registry import query
from elastic_freight_spark.session import load_tables


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int,
    salt_src: str,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: semantically identical to
    ``fact.join(dim, key, how)`` but each fact key spreads over
    ``n_salts`` shuffle partitionings.

    ``salt_src`` is a fact column of high cardinality; the salt is
    ``pmod(hash(salt_src), n_salts)`` — deterministic, so task retries
    and AQE re-plans route every row the same way.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_src)), F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_salts - 1)), lambda x: x.cast("int")
            )
        ),
    )
    return salted_fact.join(salted_dim, [key, "_salt"], how).drop("_salt")


@query(
    "join_salted_skew_supplier_volume",
    oracle=f"""
    SELECT s_nationkey,
           {sql_dsum('l_quantity', 'total_qty', 2)},
           COUNT(*) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def join_salted_skew_supplier_volume(spark, sf_dir):
    """Salted fact⋈dim join + aggregate; the oracle is the PLAIN join
    — salting must be invisible in the result. (With real skew the
    plain plan stalls on one straggler task; the salted plan spreads
    each hot supplier over 8 sub-partitions.)"""
    t = load_tables(spark, sf_dir)
    joined = salted_join(
        t["lineitem"].withColumnRenamed("l_suppkey", "jk"),
        t["supplier"].select(F.col("s_suppkey").alias("jk"), "s_nationkey"),
        key="jk", n_salts=8, salt_src="l_orderkey",
    )
    return joined.groupBy("s_nationkey").agg(
        dsum("l_quantity", "total_qty", 2),
        F.count(F.lit(1)).alias("n_items"),
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` bucketed on ``key`` — the shuffle paid once so
    every later join/agg on ``key`` plans with no Exchange."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    writer = writer.sortBy(*(sort_cols or [key]))
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables: with matching bucket specs
    Catalyst plans a sort-merge join with ZERO shuffle exchanges
    (asserted in tests/test_scale.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
