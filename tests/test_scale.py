"""Scale-pattern tests: salted joins are result-invisible; bucketed
tables join with zero shuffle exchanges; dim broadcast avoids
shuffling the fact side."""

import re

import pytest
from pyspark.sql import functions as F

from elastic_freight_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from elastic_freight_spark.plans import formatted_plan
from elastic_freight_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    t = load_tables(spark, SF_DIR)
    li = t["lineitem"].withColumnRenamed("l_suppkey", "jk")
    sup = t["supplier"].select(F.col("s_suppkey").alias("jk"), "s_nationkey")
    plain = li.join(sup, "jk").groupBy("s_nationkey").count()
    salted = (
        salted_join(li, sup, key="jk", n_salts=8, salt_src="l_orderkey")
        .groupBy("s_nationkey")
        .count()
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_preserves_left_rows(spark):
    t = load_tables(spark, SF_DIR)
    li = t["lineitem"].withColumnRenamed("l_suppkey", "jk")
    sup = t["supplier"].select(F.col("s_suppkey").alias("jk"), "s_nationkey")
    assert (
        salted_join(li, sup, key="jk", n_salts=4, salt_src="l_orderkey").count()
        == li.join(sup, "jk").count()
    )


def test_bucketed_join_has_no_shuffle(spark, tables):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(
        tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders",
        "o_orderkey",
        8,
    )
    write_bucketed(
        tables["lineitem"]
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
        "b_lineitem",
        "o_orderkey",
        8,
    )
    try:
        with_bucketing = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        # force sort-merge (broadcast would hide the exchange question)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            plan = formatted_plan(
                with_bucketing.groupBy("o_orderkey").agg(F.sum("l_quantity"))
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        # bucket-compatible scan on both sides: the join AND the
        # following same-key aggregate run with zero exchanges
        assert "Exchange" not in plan, plan
        assert re.search(r"SortMergeJoin|ShuffledHashJoin", plan)
        # correctness: same result as joining the raw frames
        raw = (
            tables["orders"]
            .select("o_orderkey")
            .join(
                tables["lineitem"].select(
                    F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
                ),
                "o_orderkey",
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        got = with_bucketing.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
        assert got.exceptAll(raw).count() == 0 and raw.exceptAll(got).count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_skewed_running_sum_matches_plain_window_on_hot_key(spark):
    """Synthetic hot key: one key owns 50k of 53k rows. The two-pass
    plan must equal the single-window plan exactly, while its biggest
    sort partition is ~1/n_buckets of the hot key."""
    from pyspark.sql import Window as W

    from elastic_freight_spark.operators.windows import skewed_running_sum

    hot = spark.range(50_000).select(
        F.lit(7).alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    cold = spark.range(3_000).select(
        (F.col("id") % 10).alias("k"),
        (F.col("id") + 100_000).alias("seq"),
        F.lit(1.0).alias("v"),
    )
    df = hot.unionByName(cold)

    w = W.partitionBy("k").orderBy("seq").rowsBetween(W.unboundedPreceding, W.currentRow)
    wseq = W.partitionBy("k").orderBy("seq")
    plain = df.select(
        "k",
        "seq",
        F.sum(F.col("v").cast("decimal(18,4)")).over(w).cast("double").alias("rt"),
        F.row_number().over(wseq).alias("sq"),
    )
    hardened = skewed_running_sum(
        df, part_col="k", order_cols=["seq"], sum_col="v",
        n_buckets=16, sum_out="rt", seq_out="sq",
    ).select("k", "seq", "rt", "sq")
    got = {(r["k"], r["seq"]): (r["rt"], r["sq"]) for r in hardened.collect()}
    want = {(r["k"], r["seq"]): (r["rt"], r["sq"]) for r in plain.collect()}
    assert got == want


def test_skewed_topk_matches_plain_topk(spark):
    from pyspark.sql import Window as W

    from elastic_freight_spark.operators.windows import skewed_topk_per_group

    df = spark.range(40_000).select(
        (F.when(F.col("id") < 35_000, 1).otherwise(F.col("id") % 5)).alias("k"),
        F.col("id").alias("uid"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_003)).alias("score"),
    )
    order = [F.col("score").desc(), F.col("uid")]
    w = W.partitionBy("k").orderBy(*order)
    plain = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("k", "uid", "score", "rn")
    )
    hardened = skewed_topk_per_group(
        df, part_col="k", order_cols=order, k=5, salt_src="uid", n_salts=8
    ).select("k", "uid", "score", "rn")
    assert sorted(map(tuple, hardened.collect())) == sorted(map(tuple, plain.collect()))
