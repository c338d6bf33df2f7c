"""Sharded index build: the reference's entire MapReduce job as one
declarative Spark write.

elastic-freight's pipeline (reference ``example/IndexingJob.java``,
``job/BaseESReducer.java``, ``job/IndexingPostProcessor.java``):

1. map: parse JSON line, extract doc-id field, murmur3 routing hash
2. shuffle: hash-partition so reducer *i* gets shard *i*'s docs
3. reduce: boot embedded ES, bulk-index batches, force-merge, snapshot
4. transport: upload each shard snapshot to S3/HDFS/local FS
5. post-process: merge + dedupe manifests, fill missing empty shards,
   stitch one restorable snapshot

On Spark this collapses to::

    df.withColumn("shard", shard_col(doc_id, N))
      .repartition(N, "shard")
      .write.partitionBy("shard").parquet(dest)

plus a tiny JSON manifest. There is no embedded ES (Parquet is the
index), no snapshot surgery (the partitioned table IS the snapshot;
"restore" is ``spark.read.parquet``), and no S3 eventual-consistency
manifest dance (committer semantics handle atomicity — the reference
needed fileoutputcommitter v2 for this, hadoop_config.json:15).

Scale notes (100 TB):

* The shuffle is the single full-data network pass, same as the
  reference's map→reduce shuffle. ``repartition(N, shard)`` gives
  1 write task per shard like the reference's 1-reducer-per-shard;
  for huge shards pass ``tasks_per_shard > 1`` to write each shard
  directory from several tasks (still correctly partitioned — the
  partitionBy column, not task layout, defines placement).
* ``maxRecordsPerFile`` bounds file sizes (the analogue of the
  reference's 256 MB max merged segment,
  example/IndexingReducerImpl.java:34-36).
* Failed/null-id docs are counted, not fatal, matching the
  reference's failure counters (BaseESReducer.java:232-251) — done
  via ``df.observe`` so the counts ride the write job instead of a
  second scan.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from elastic_freight_spark.sharding import lcg_shard_col, shard_col

MANIFEST_NAME = "_manifest.json"

#: Counter names, mirroring the reference's job counters
#: (BaseESReducer.java:60-62).
COUNTER_DOC_CREATED = "index_doc_created"
COUNTER_DOC_FAILED = "indexing_doc_fail"


@dataclass
class IndexConfig:
    """Equivalent of the reference's 13 ConfigParams strings
    (ConfigParams.java:10-24) minus the ES/snapshot-specific ones."""

    index_name: str
    doc_id_col: str
    num_shards: int
    output_path: str
    #: 'spark' (murmur3 seed 42, JVM fast path), 'lcg'
    #: (oracle-portable arithmetic), or 'es' (bit-exact ES 5.x parity
    #: via pandas UDF)
    routing: str = "spark"
    mode: str = "overwrite"
    #: bound output file size — analogue of ES max merged segment
    max_records_per_file: int = 5_000_000
    #: >1 splits each shard across several write tasks (huge shards)
    tasks_per_shard: int = 1
    #: extra columns to sort within each shard file (improves scan
    #: locality / compression, like ES's force-merge producing ordered
    #: segments)
    sort_within_shard: list[str] = field(default_factory=list)


def shard_expr(cfg: IndexConfig):
    if cfg.routing == "lcg":
        return lcg_shard_col(cfg.doc_id_col, cfg.num_shards)
    if cfg.routing == "es":
        from elastic_freight_spark.sharding import es_murmur3_shard_udf

        return es_murmur3_shard_udf(cfg.num_shards)(F.col(cfg.doc_id_col).cast("string"))
    return shard_col(cfg.doc_id_col, cfg.num_shards)


def build_index(df: DataFrame, cfg: IndexConfig) -> dict:
    """Shard-route, shuffle, write, manifest. Returns the manifest.

    One full-data pass: scan → shard column → repartition(shard) →
    partitioned Parquet write, with doc counters observed on the same
    job. Null doc ids are routed out (counted as failures), matching
    the reference's skip-don't-fail policy (BaseESReducer.java:270).
    """
    spark = df.sparkSession
    if cfg.routing == "lcg":
        from pyspark.sql.types import NumericType

        if not isinstance(df.schema[cfg.doc_id_col].dataType, NumericType):
            raise ValueError(
                f"routing='lcg' needs a numeric doc-id column; "
                f"{cfg.doc_id_col!r} is {df.schema[cfg.doc_id_col].dataType} "
                "(a string id would cast to NULL and rows would land in "
                "the default partition) — use routing='spark' or 'es'"
            )
    obs_in = Observation(f"index_{cfg.index_name}_in")
    obs = Observation(f"index_{cfg.index_name}")

    # observe the input count on the same job as the write — no
    # second scan of the (100 TB) input just for counters
    base = df.observe(obs_in, F.count(F.lit(1)).alias("total"))
    good = base.filter(F.col(cfg.doc_id_col).isNotNull())
    sharded = good.withColumn("shard", shard_expr(cfg))

    n_parts = cfg.num_shards * max(1, cfg.tasks_per_shard)
    if cfg.tasks_per_shard > 1:
        # spread one shard over several tasks: co-partition on
        # (shard, salt) — placement still comes from partitionBy.
        salt = F.pmod(F.hash(F.col(cfg.doc_id_col)), F.lit(cfg.tasks_per_shard))
        sharded = sharded.repartition(n_parts, F.col("shard"), salt)
    else:
        sharded = sharded.repartition(cfg.num_shards, F.col("shard"))
    if cfg.sort_within_shard:
        sharded = sharded.sortWithinPartitions("shard", *cfg.sort_within_shard)

    observed = sharded.observe(obs, F.count(F.lit(1)).alias(COUNTER_DOC_CREATED))

    dest = os.path.join(cfg.output_path, cfg.index_name)
    (
        observed.write.mode(cfg.mode)
        .option("maxRecordsPerFile", cfg.max_records_per_file)
        .partitionBy("shard")
        .parquet(dest)
    )

    created = int(obs.get[COUNTER_DOC_CREATED])
    failed = int(obs_in.get["total"]) - created

    shard_counts = _shard_counts(spark, dest)
    manifest = {
        "index": cfg.index_name,
        "num_shards": cfg.num_shards,
        "doc_id_col": cfg.doc_id_col,
        "routing": cfg.routing,
        "path": dest,
        "counters": {COUNTER_DOC_CREATED: created, COUNTER_DOC_FAILED: failed},
        "shards": shard_counts,
        "missing_shards_filled": _fill_missing_shards(spark, df.schema, dest, cfg, shard_counts),
    }
    _write_manifest(dest, manifest)
    return manifest


def _shard_counts(spark: SparkSession, dest: str) -> dict[str, int]:
    """Per-shard doc counts from the written table — a
    metadata-driven scan of just the partition column (Parquet row
    counts come from footers, no data pages read)."""
    from pyspark.errors import AnalysisException

    try:
        rows = (
            spark.read.parquet(dest)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("docs"))
            .collect()
        )
    except AnalysisException:
        # zero rows written → no shard directories yet (the
        # missing-shard fill creates them all)
        return {}
    return {str(r["shard"]): int(r["docs"]) for r in rows}


def _fill_missing_shards(spark, schema, dest, cfg, shard_counts) -> list[int]:
    """The reference's ``placeMissingShards`` (BaseTransport.java:
    144-167): an index restore requires all N shards to exist even if
    some got zero documents. Here: write an empty parquet directory
    for each absent shard id (expected-minus-produced — the anti-join
    the reference does over its manifest)."""
    produced = {int(s) for s in shard_counts}
    missing = sorted(set(range(cfg.num_shards)) - produced)
    if missing:
        empty = spark.createDataFrame([], schema)
        for shard_id in missing:
            empty.write.mode("overwrite").parquet(os.path.join(dest, f"shard={shard_id}"))
            shard_counts[str(shard_id)] = 0
    return missing


def _write_manifest(dest: str, manifest: dict) -> None:
    with open(os.path.join(dest, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)


def read_manifest(index_path: str) -> dict:
    with open(os.path.join(index_path, MANIFEST_NAME)) as f:
        return json.load(f)


def read_index(spark: SparkSession, index_path: str) -> DataFrame:
    """'Restore': just read the partitioned table."""
    return spark.read.parquet(index_path)


def read_shard(spark: SparkSession, index_path: str, doc_id) -> DataFrame:
    """Shard-pruned point lookup (reference query-side routing,
    ElasticsearchRoutingStrategyV5.java:97-113): compute the only
    shard that can hold ``doc_id`` and filter on the partition column
    so Spark's partition pruning skips every other shard directory.
    """
    manifest = read_manifest(index_path)
    n = manifest["num_shards"]
    df = spark.read.parquet(index_path)
    routing = manifest["routing"]
    if routing == "lcg":
        target = F.pmod(
            F.pmod(F.lit(int(doc_id)).cast("long") % 2147483647 * 48271, F.lit(2147483647)),
            F.lit(n),
        )
        # evaluate driver-side for a literal partition filter
        shard_id = ((int(doc_id) % 2147483647) * 48271) % 2147483647 % n
    elif routing == "es":
        from elastic_freight_spark.sharding import es_shard

        shard_id = es_shard(str(doc_id), n)
    else:
        # spark murmur3: evaluate the same JVM expression on a 1-row
        # df. The literal MUST carry the stored column's exact type —
        # murmur3 hashes int and long differently, so an untyped
        # python literal would route to the wrong shard.
        dtype = df.schema[manifest["doc_id_col"]].dataType
        one = spark.range(1).select(
            shard_col(F.lit(doc_id).cast(dtype), n).alias("s")
        )
        shard_id = one.collect()[0]["s"]
    return df.filter(
        (F.col("shard") == shard_id) & (F.col(manifest["doc_id_col"]) == doc_id)
    )


def compact_index(
    spark: SparkSession,
    index_path: str,
    target_files_per_shard: int = 1,
    sort_cols: list[str] | None = None,
) -> dict:
    """Force-merge analogue: rewrite each shard directory down to
    ``target_files_per_shard`` files (optionally re-sorted).

    The reference force-merges Lucene segments before snapshotting
    (ESEmbededContainer.java:71-77; max merged segment 256 MB,
    segments_per_tier 4 — example/IndexingReducerImpl.java:34-36)
    because many small segments slow every later search. The Parquet
    equivalent: a streamed index accumulates one file per shard per
    micro-batch; compaction folds them so later scans pay one file
    open per shard instead of hundreds. Data is byte-identical —
    only file layout changes. Run it like the reference runs
    force-merge: once, after load, before serving.
    """
    manifest = read_manifest(index_path)
    df = spark.read.parquet(index_path)
    k = max(1, target_files_per_shard)
    if k == 1:
        compacted = df.repartition(manifest["num_shards"], F.col("shard"))
    else:
        # repartition on shard alone cannot split a shard (equal keys
        # hash to one partition) — co-key with a deterministic doc-id
        # salt to spread each shard over k write tasks
        salt = F.pmod(F.hash(F.col(manifest["doc_id_col"])), F.lit(k))
        compacted = df.repartition(
            manifest["num_shards"] * k, F.col("shard"), salt
        )
    if sort_cols:
        compacted = compacted.sortWithinPartitions("shard", *sort_cols)
    tmp = index_path.rstrip("/") + ".compacting"
    compacted.write.mode("overwrite").partitionBy("shard").parquet(tmp)

    import shutil

    # atomic-ish swap (same filesystem): old dir out, new dir in
    old = index_path.rstrip("/") + ".old"
    os.rename(index_path, old)
    os.rename(tmp, index_path)
    shutil.rmtree(old)

    manifest["compacted"] = True
    manifest["shards"] = _shard_counts(spark, index_path)
    _write_manifest(index_path, manifest)
    return manifest


# --- range-partitioned layout (alternative to hash sharding) --------------


def build_range_index(df: DataFrame, cfg: IndexConfig) -> dict:
    """Range-partitioned index: shard *i* holds a contiguous doc-id
    range (boundaries from approxQuantile, stored in the manifest as
    a zone map).

    Hash sharding (the reference's only layout) optimizes point
    lookups; a range layout additionally serves *range* scans by
    pruning shards whose [min,max] cannot overlap — the analogue of
    ES index sorting / time-based indices. The boundary computation
    samples (approxQuantile, relativeError 0.001), so the build costs
    one extra metadata-cheap pass over the doc-id column only.
    """
    spark = df.sparkSession
    good = df.filter(F.col(cfg.doc_id_col).isNotNull())
    qs = [i / cfg.num_shards for i in range(1, cfg.num_shards)]
    bounds = good.stat.approxQuantile(cfg.doc_id_col, qs, 0.001)

    shard = F.lit(0)
    for b in bounds:
        shard = shard + (F.col(cfg.doc_id_col) > F.lit(b)).cast("int")
    sharded = good.withColumn("shard", shard).repartition(
        cfg.num_shards, F.col("shard")
    )
    if cfg.sort_within_shard:
        sharded = sharded.sortWithinPartitions("shard", *cfg.sort_within_shard)

    dest = os.path.join(cfg.output_path, cfg.index_name)
    (
        sharded.write.mode(cfg.mode)
        .option("maxRecordsPerFile", cfg.max_records_per_file)
        .partitionBy("shard")
        .parquet(dest)
    )
    shard_counts = _shard_counts(spark, dest)
    manifest = {
        "index": cfg.index_name,
        "num_shards": cfg.num_shards,
        "doc_id_col": cfg.doc_id_col,
        "routing": "range",
        "range_bounds": bounds,
        "path": dest,
        "shards": shard_counts,
        "missing_shards_filled": _fill_missing_shards(
            spark, df.schema, dest, cfg, shard_counts
        ),
    }
    _write_manifest(dest, manifest)
    return manifest


def read_doc_range(spark: SparkSession, index_path: str, lo, hi) -> DataFrame:
    """Range scan with shard pruning: only shards whose doc range can
    intersect [lo, hi] are listed/read (partition filter on the shard
    column + pushed doc-id range predicate)."""
    manifest = read_manifest(index_path)
    if manifest.get("routing") != "range":
        # hash layout: every shard may contain ids in [lo, hi]
        df = spark.read.parquet(index_path)
    else:
        bounds = manifest["range_bounds"]
        first = sum(1 for b in bounds if lo > b)
        last = sum(1 for b in bounds if hi > b)
        df = spark.read.parquet(index_path).filter(
            F.col("shard").isin(list(range(first, last + 1)))
        )
    c = F.col(manifest["doc_id_col"])
    return df.filter((c >= lo) & (c <= hi))
