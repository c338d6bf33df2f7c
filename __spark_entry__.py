"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end: the reference's whole reason
to exist (ingest → shard-route → partitioned write → manifest →
shard-pruned read-back) on sf0.001, returning the per-shard summary.

``queries()`` / ``oracle_sql()`` — the SURVEY.md §2 operator
inventory, registered in elastic_freight_spark.registry by the
operator modules.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exercises S1/S5/S6 (scan→sharded partitioned sink + manifest),
    P1/R1/R3 (doc-id projection, hash routing, shuffle), A2 (docs per
    shard), and P6 (shard-pruned lookup) in one pass — SURVEY.md §7
    Phase 0's minimum slice.
    """
    from pyspark.sql import functions as F

    from elastic_freight_spark.indexer import IndexConfig, build_index, read_index
    from elastic_freight_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    events = load_tables(spark, sf_dir)["events"]

    out = tempfile.mkdtemp(prefix="efs_entry_")
    cfg = IndexConfig(
        index_name="events_index",
        doc_id_col="user_id",
        num_shards=8,
        output_path=out,
        routing="lcg",
    )
    manifest = build_index(events, cfg)

    # read back from the built index with shard pruning and summarize:
    # docs + users + value sum per shard (the reducer-load view)
    restored = read_index(spark, manifest["path"])
    return (
        restored.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .orderBy("shard")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from elastic_freight_spark import registry

    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every oracle-checkable
    query; non-SQL-expressible ops (LSH, ES-murmur3 parity) are
    intentionally absent → driver runs its rows-only check."""
    from elastic_freight_spark import registry

    registry.load_all()
    return dict(registry.ORACLE)
