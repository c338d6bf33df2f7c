"""Physical-plan property tests (SURVEY.md §4): the scale guarantees
— pushdown, pruning, broadcast, partition pruning, codegen, JVM-only
hot paths — asserted on real query plans, not assumed."""

import pytest
from pyspark.sql import functions as F

from elastic_freight_spark import registry
from elastic_freight_spark.indexer import IndexConfig, build_index, read_shard
from elastic_freight_spark.plans import (
    assert_broadcast_join,
    assert_no_python_in_plan,
    assert_partition_pruned,
    assert_pushed_filters,
    assert_read_schema_pruned,
    codegen_stage_count,
)
from elastic_freight_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load(spark):
    registry.load_all()
    load_tables(spark, SF_DIR)


def test_filter_pushdown_reaches_scan(spark):
    df = load_tables(spark, SF_DIR)["lineitem"].filter(
        (F.col("l_quantity") < 24) & F.col("l_shipdate").isNotNull()
    )
    assert_pushed_filters(df, "LessThan(l_quantity", "IsNotNull(l_shipdate)")


def test_column_pruning_two_column_projection(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    assert_read_schema_pruned(
        df, must_have=["l_returnflag", "l_quantity"], must_not_have=["l_comment", "l_extendedprice"]
    )


def test_q6_scan_is_pruned_and_pushed(spark):
    df = registry.QUERIES["q6_revenue_change"](spark, SF_DIR)
    assert_pushed_filters(df, "GreaterThanOrEqual(l_shipdate")
    assert_read_schema_pruned(
        df,
        must_have=["l_extendedprice", "l_discount"],
        must_not_have=["l_comment", "l_orderkey"],
    )
    assert_no_python_in_plan(df)
    assert codegen_stage_count(df) >= 1


def test_q5_broadcasts_small_dims(spark):
    df = registry.QUERIES["q5_local_supplier_volume"](spark, SF_DIR)
    assert_broadcast_join(df, expect=1)


def test_shard_pruned_lookup_prunes_partitions(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plan_idx"))
    events = load_tables(spark, SF_DIR)["events"]
    man = build_index(
        events,
        IndexConfig(
            index_name="ev", doc_id_col="user_id", num_shards=8, output_path=out
        ),
    )
    uid = events.select("user_id").first()["user_id"]
    lookup = read_shard(spark, man["path"], uid)
    assert_partition_pruned(lookup, "shard")
    # and the doc-id predicate itself reaches the scan
    assert_pushed_filters(lookup, "EqualTo(user_id")
    assert lookup.count() >= 1


def test_relational_queries_stay_jvm_side(spark):
    """Every relational/window/agg query must plan with zero Python
    stages (UDF tiers are exempt by design: es-parity, multimodal,
    applyInPandas surface)."""
    jvm_only = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_revenue_change",
        "agg_multi_measure",
        "w_running_revenue",
        "topk_global_orders",
        "join_asof_click_before_purchase",
        "dedup_exact",
        "text_token_counts",
        "knn_bruteforce_cosine",
        "f_array_token_profile",
    ]
    for name in jvm_only:
        assert_no_python_in_plan(registry.QUERIES[name](spark, SF_DIR))


def test_exists_subquery_rewrites_to_semi_join(spark):
    import re as _re

    from elastic_freight_spark.plans.explain import formatted_plan

    plan = formatted_plan(registry.QUERIES["sq4_exists_returned_orders"](spark, SF_DIR))
    assert _re.search(r"LeftSemi|Semi", plan), plan


def test_in_having_subquery_rewrites_to_semi_join(spark):
    import re as _re

    from elastic_freight_spark.plans.explain import formatted_plan

    plan = formatted_plan(registry.QUERIES["sq18_in_having_subquery"](spark, SF_DIR))
    assert _re.search(r"LeftSemi|Semi", plan), plan
