"""elastic_freight_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
simon-data/elastic-freight (an offline Hadoop-MapReduce Elasticsearch
bulk-index builder) as an idiomatic Spark DataFrame engine, plus the
query surface the built artifact exists to serve (filters, aggregates,
top-k, search-style scoring) and large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis).

Design notes (see SURVEY.md for the full blueprint):

* Everything is declared through the DataFrame / Spark SQL API so
  Catalyst handles predicate pushdown, column pruning, join selection,
  partial aggregation and AQE — nothing is hand-scheduled.
* The reference's map → shuffle → reduce pipeline collapses to
  ``withColumn(shard) → repartition(N, shard) → write.partitionBy``
  (see :mod:`elastic_freight_spark.indexer`).
* Python-side code runs only where the JVM genuinely cannot express
  the semantics (exact Elasticsearch murmur3 routing parity, MinHash
  signatures, multimodal decode stubs) and always via Arrow-batched
  pandas UDFs, never row-at-a-time.
"""

from elastic_freight_spark.session import get_spark
from elastic_freight_spark.indexer import IndexConfig, build_index, read_shard
from elastic_freight_spark.sharding import shard_col, lcg_shard_col, es_murmur3_shard_udf

__all__ = [
    "get_spark",
    "IndexConfig",
    "build_index",
    "read_shard",
    "shard_col",
    "lcg_shard_col",
    "es_murmur3_shard_udf",
]

__version__ = "0.1.0"
