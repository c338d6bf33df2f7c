"""Query registry: name → (Spark impl, optional DuckDB oracle SQL).

Every ★ operator from SURVEY.md §2 registers here; the driver harness
(`__spark_entry__.py`) exposes the two dicts. Implementations take
``(spark, sf_dir)`` and return a DataFrame; oracle SQL runs on DuckDB
views named after the parquet tables.

Queries without an oracle (genuinely non-SQL-expressible: LSH, ES
murmur3 parity, streaming state) are registered with ``oracle=None``
and get the driver's weaker rows-only check; each must carry its own
unit test instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register an operator implementation (decorator)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver's correctness harness evaluates registry entries in
# registration order under a fixed 50-query budget. Rounds 1+2 together
# green-lit ~100 queries (r1: arrays/indexing/multimodal/relational/
# sampling prefix; r2: windows/temporal/text/vectors prefix). This list
# front-loads round 3: the two queries that FAILED in r2 on
# TIMESTAMP_NTZ inputs (fixed — the green row is the proof), then every
# query that has never had a driver row, then two slots for new
# round-3 queries. Everything else follows in import order; rotating
# this list each round walks the driver's budget across the full
# registry.
_PRIORITY = (
    "t3_session_windows",
    "t_sessionize_gaps",
    "ann_ivfpq_cosine",
    "pq_quantization_error",
    "search_tfidf_topk",
    "search_bm25_topk",
    "search_phrase_match",
    "search_significant_terms",
    "search_prefix_suggest",
    "sq4_exists_returned_orders",
    "sq12_priority_case_agg",
    "sq14_promo_revenue",
    "sq18_in_having_subquery",
    "sq_scalar_avg_balance",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_value_concentration",
    "q13_customer_distribution",
    "q16_part_supplier_variety",
    "q17_small_quantity_revenue",
    "q19_disjunctive_brand_filter",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "q21_waiting_suppliers_agg",
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "q20_dominant_part_suppliers",
    "join_salted_skew_supplier_volume",
    "join_bloom_semi_orders",
    "hll_sketch_rollup",
    "agg_regression_by_group",
    "agg_equidepth_histogram",
    "q10_returned_items",
    "f_unpivot_measures",
    "keyset_pagination_page2",
    "f_variant_shredding",
    "org_routing_subset",
    "manifest_catalog",
    "index_upsert_latest",
    "pandas_udaf_group_geomean",
    "sample_source_mix_plan",
    "sample_reservoir_per_lang",
    "dq_orders_constraints",
    "training_shuffle_order",
    "sample_det_hash_fraction",
    "batch_padding_plan",
    "mm_phash_neardup",
    # round-3 additions (slots 49-50 of the driver's budget)
    "dedup_paragraph_spans",
    "join_interval_binned",
)


def load_all() -> None:
    """Import every operator module so registration side-effects run,
    then reorder the registry so ``_PRIORITY`` names come first (the
    driver's fixed correctness budget reads entries front-to-back).
    """
    from elastic_freight_spark.operators import (  # noqa: F401
        windows,
        temporal,
        text,
        vectors,
        search,
        subqueries,
        tpch_deep,
        scale,
        relational,
        arrays,
        indexing,
        sampling,
        multimodal,
    )

    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in _PRIORITY]
    for d in (QUERIES, ORACLE):
        snapshot = dict(d)
        d.clear()
        d.update((n, snapshot[n]) for n in ordered if n in snapshot)
