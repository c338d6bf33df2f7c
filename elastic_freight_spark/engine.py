"""User-facing engine facade: the one object a reference user drives.

The reference's user surface is a CLI job submission
(``hadoop jar … esIndex <input> <output> <index> <docid> <shards>``,
README.md:27-45) plus subclass hooks for templates/routing
(job/BaseESReducer.java:181-206). Here the same surface is a session
wrapper: load tables, run SQL or registered operators, build/restore/
look-up sharded indexes, and stream into them — all returning
DataFrames so everything composes with plain PySpark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from elastic_freight_spark.indexer import (
    IndexConfig,
    build_index,
    read_index,
    read_manifest,
    read_shard,
)
from elastic_freight_spark.session import get_spark, load_tables


class EFSEngine:
    """``EFSEngine(sf_dir).sql("SELECT …")`` — the switchover surface.

    >>> eng = EFSEngine("/root/testdata/sf0.001")
    >>> eng.sql("SELECT count(*) AS n FROM lineitem")
    >>> man = eng.index(eng.table("events"),
    ...                 index_name="ev", doc_id_col="user_id", num_shards=8,
    ...                 output_path="/tmp/idx")
    >>> eng.lookup(man["path"], 42)          # shard-pruned point read
    """

    def __init__(
        self,
        tables_dir: str | None = None,
        spark: SparkSession | None = None,
        **spark_conf,
    ):
        self.spark = spark or get_spark(**spark_conf)
        self.tables: dict[str, DataFrame] = {}
        if tables_dir:
            self.load(tables_dir)

    # --- catalog ---------------------------------------------------------

    def load(self, tables_dir: str) -> dict[str, DataFrame]:
        """Load/register the standard tables from a directory of
        parquet files (each also becomes a temp view for SQL)."""
        self.tables.update(load_tables(self.spark, tables_dir))
        return self.tables

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    # --- query entry points ---------------------------------------------

    def sql(self, statement: str) -> DataFrame:
        """ANSI SQL over every loaded table (Catalyst end to end)."""
        return self.spark.sql(statement)

    def query(self, name: str, sf_dir: str) -> DataFrame:
        """Run a registered named operator (SURVEY.md §2 inventory)."""
        from elastic_freight_spark import registry

        registry.load_all()
        return registry.QUERIES[name](self.spark, sf_dir)

    @property
    def query_names(self) -> list[str]:
        from elastic_freight_spark import registry

        registry.load_all()
        return sorted(registry.QUERIES)

    # --- index lifecycle (the reference's whole job) ---------------------

    def index(self, df: DataFrame, **config) -> dict:
        """Sharded index build; returns the manifest. Accepts every
        :class:`IndexConfig` field as a keyword."""
        return build_index(df, IndexConfig(**config))

    def restore(self, index_path: str) -> DataFrame:
        return read_index(self.spark, index_path)

    def manifest(self, index_path: str) -> dict:
        return read_manifest(index_path)

    def lookup(self, index_path: str, doc_id) -> DataFrame:
        """Shard-pruned point lookup — reads 1 of N shard dirs."""
        return read_shard(self.spark, index_path, doc_id)

    def upsert(self, df: DataFrame, index_path: str, delete: bool = False) -> dict:
        """Apply an incremental batch (upserts, or tombstones with
        ``delete=True``) to a built index; returns the manifest with
        the new ``version`` stamp."""
        from elastic_freight_spark.indexer import upsert_index

        return upsert_index(df, index_path, delete=delete)

    def restore_latest(self, index_path: str) -> DataFrame:
        """Merge-on-read view: newest version per doc, tombstones
        dropped."""
        from elastic_freight_spark.indexer import read_index_latest

        return read_index_latest(self.spark, index_path)

    def restore_asof(self, index_path: str, version: int) -> DataFrame:
        """Time travel: the index exactly as of upsert batch
        ``version`` (0 = base build)."""
        from elastic_freight_spark.indexer import read_index_asof

        return read_index_asof(self.spark, index_path, version)

    def restore_catalog(self, catalog_path: str, index_name: str) -> DataFrame:
        """Read one index out of a multi-index merged catalog."""
        from elastic_freight_spark.indexer import restore_catalog_index

        return restore_catalog_index(self.spark, catalog_path, index_name)

    def publish(self, base_path: str, alias: str, index_path: str) -> str:
        """Atomically point ``alias`` at a validated build (blue/green
        go-live); readers using :meth:`serve` flip with zero downtime."""
        from elastic_freight_spark.indexer import set_alias

        return set_alias(base_path, alias, index_path)

    def serve(self, base_path: str, alias: str) -> DataFrame:
        """Read whichever index the alias currently publishes."""
        from elastic_freight_spark.indexer import read_alias

        return read_alias(self.spark, base_path, alias)

    # --- streaming tier --------------------------------------------------

    def stream_index(self, stream_df: DataFrame, checkpoint_dir: str, **config):
        from elastic_freight_spark.streaming import stream_index as _si

        available_now = config.pop("available_now", False)
        processing_time = config.pop("processing_time", None)
        return _si(
            stream_df,
            IndexConfig(**config),
            checkpoint_dir,
            available_now=available_now,
            processing_time=processing_time,
        )
