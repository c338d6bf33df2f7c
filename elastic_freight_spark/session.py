"""SparkSession factory with scale-oriented defaults.

The reference hand-tunes its Hadoop job (map-output compression,
speculative execution off, io.sort.mb — /root/reference
src/main/resources/hadoop_config.json) because MapReduce optimizes
nothing for you. On Spark the equivalents are either defaults or one
AQE flag, so this module is intentionally tiny: one builder with the
settings that matter at 100 TB and in local test mode alike.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "elastic_freight_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults chosen for scale:

    * AQE on (coalesce small partitions, split skewed ones, runtime
      re-plan of join strategies) — replaces the reference's static
      ``numReducers == numShards`` sizing.
    * ``spark.sql.shuffle.partitions`` sized to cores locally; on a
      real cluster callers pass ~2-3x total executor cores.
    * UTC session timezone (the reference pins the JVM default TZ to
      UTC in its Driver — we need it both for parity and for the
      DuckDB oracle).
    * Arrow enabled for any pandas-UDF path.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Parquet writer batching is the Spark analogue of the
        # reference's BulkProcessor doc/byte/time flush triggers.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no ns
        # timestamp — read as long and truncate to µs in load_tables
        # (DuckDB's ns→µs cast truncates identically).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    quiet_benign_window_warnings(spark)
    return spark


def quiet_benign_window_warnings(spark: SparkSession) -> None:
    """Raise ``o.a.s.sql.execution.window``'s log level to ERROR for
    this JVM.

    Every unpartitioned Window the engine still plans is an
    allowlisted DOMAIN-BOUNDED frame (tools/plan_audit.py
    ``WINDOW_ALLOW`` — bucket-offset frames, calendar series, k-sized
    synopses), yet each prints WindowExec's "No Partition Defined"
    WARN — ~19 per full contract run, burying any real warning.
    ``plan_audit`` is the real guard (it FLAGS new unpartitioned
    windows); this only de-noises the log. Called from ``get_spark``
    (tuned sessions) and opt-in by our own harnesses
    (tools/drive_contract.py) — NEVER from ``load_tables``, so an
    external driver's vanilla session keeps its own logging intact.
    """
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        # alternate logging backend / no py4j gateway: cosmetic only
        pass


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (applicationId, abspath(sf_dir)) → {name: DataFrame}. Every
# registered query calls load_tables; without this cache each call
# re-lists the directory and re-reads ~10 parquet footers, which
# dominates per-query setup when a harness runs all ~100 queries
# back-to-back. DataFrames are lazy plans bound to a session, so
# reusing them across queries is safe; keying on applicationId drops
# the cache automatically when a new session is built.
_TABLE_CACHE: dict[tuple[str, str], dict] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load the standard test tables from a scale-factor directory.

    Returns ``{name: DataFrame}`` and registers each as a temp view so
    operators can be expressed in either the DataFrame or SQL API.
    Cached per (session, sf_dir) — see ``_TABLE_CACHE``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    # The caller may hand us a session we didn't build (the driver
    # harness does) — pin the runtime-settable confs the engine
    # depends on: ns-timestamp parquet readability and UTC rendering
    # (the reference pins UTC in its Driver, driver/Driver.java:28-29).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    cache_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    cached = _TABLE_CACHE.get(cache_key)
    if cached is not None:
        # Re-pin temp views (catalog-only, no I/O) in case a caller
        # replaced one of the names between queries.
        for name, df in cached.items():
            df.createOrReplaceTempView(name)
        return dict(cached)

    dfs = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
                # ns→µs truncation, matching DuckDB CAST(ts AS TIMESTAMP)
                # integer DIV — float division would lose precision on
                # ~1.7e18 ns epochs (> 2^53)
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
            # Naive parquet timestamps (timestamp[us], isAdjustedToUTC
            # =false) read as TIMESTAMP_NTZ under Spark 4's default
            # inferTimestampNTZ — but NTZ supports neither
            # cast-to-bigint nor unix_micros, which the temporal/
            # sessionization operators need. Normalize to TIMESTAMP_LTZ:
            # with the session tz pinned to UTC above, the rendered
            # values (and thus the DuckDB-oracle comparison, whose
            # timestamps are naive) are bit-identical, and epoch
            # arithmetic becomes legal again.
            for field in df.schema.fields:
                if isinstance(field.dataType, TimestampNTZType):
                    df = df.withColumn(
                        field.name, F.col(field.name).cast("timestamp")
                    )
            df.createOrReplaceTempView(name)
            dfs[name] = df
    _TABLE_CACHE[cache_key] = dict(dfs)
    return dfs


def cluster_conf(
    executors: int,
    cores_per_executor: int = 4,
    executor_mem_gb: int = 16,
    target_partition_mb: int = 128,
) -> dict[str, str]:
    """Recommended conf for a real cluster run (the 100 TB story,
    documented as code — pass to ``get_spark(extra_conf=...)``).

    * shuffle partitions ≈ 3× total cores (enough waves that AQE can
      coalesce down, never a single mega-partition)
    * ~128 MB scan partitions (row-group friendly; small enough that
      a partition's rows + hash tables fit executor memory)
    * RocksDB state store for streaming state beyond heap
    * broadcast threshold stays default (10 MB) — AQE upgrades joins
      at runtime when the built side turns out small
    """
    total_cores = executors * cores_per_executor
    return {
        "spark.sql.shuffle.partitions": str(3 * total_cores),
        "spark.sql.files.maxPartitionBytes": str(target_partition_mb * 1024 * 1024),
        "spark.executor.instances": str(executors),
        "spark.executor.cores": str(cores_per_executor),
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
    }
