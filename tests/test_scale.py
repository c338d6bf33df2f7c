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
