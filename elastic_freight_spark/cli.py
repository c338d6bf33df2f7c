"""Command-line entry point — ``python -m elastic_freight_spark``.

The reference's only true entry point is CLI job submission
(``hadoop jar elasticsearch-indexer-1.1.0.jar esIndex <args>`` —
driver/Driver.java:27-33 dispatches "esIndex" → IndexingJob.main,
example/IndexingJob.java:56-82 parses the positional args). This is
the Spark-native face of that surface:

* ``esIndex`` exposes the reference's parameters in flag-based form
  (input path(s), output destination, index name, schema/mappings
  file, shard count, document-id field, plus the optional bulk-tuning
  knobs as ``--`` flags). NOTE: this is the same parameter SET, not
  the same positional ORDER — the reference (IndexingJob.java
  args[0..11]) takes the snapshot-repo name as its 3rd positional and
  the tuning knobs as trailing positionals, so a verbatim reference
  invocation needs its args re-spelled as flags. The
  Elasticsearch-embedding knobs (bulk batch size/MB, flush interval,
  processors, ramdisk — ConfigParams.java:17-21) have no Spark-side
  effect — Catalyst/Tungsten size batches — but are ACCEPTED and
  RECORDED in the manifest so the settings stay auditable.
* ``query`` runs any registered query (the SURVEY.md §2 inventory)
  against a testdata/table directory and prints JSON lines.
* ``compact`` force-merges a built index's shard files (the
  reference's pre-snapshot force-merge, ESEmbededContainer.java:71-77).
* ``manifest`` prints a built index's manifest.

Timezone discipline: the reference pins the JVM default TZ to UTC
before anything else (Driver.java:28-29); ``get_spark`` pins
``spark.sql.session.timeZone=UTC`` the same way.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="elastic_freight_spark",
        description="PySpark-native sharded-index builder + query engine",
    )
    sub = p.add_subparsers(dest="command", required=True)

    idx = sub.add_parser(
        "esIndex", help="build a sharded index from LDJSON input"
    )
    idx.add_argument("input", help="input path/glob; pipe-separate multiples")
    idx.add_argument("output", help="index output directory")
    idx.add_argument("index_name", help="index name (recorded in manifest)")
    idx.add_argument(
        "schema",
        help="schema file (StructType JSON or DDL), or 'infer' to sample",
    )
    idx.add_argument("num_shards", type=int, help="shard count")
    idx.add_argument("doc_id_field", help="document-id field name")
    idx.add_argument(
        "--routing",
        choices=["spark", "lcg", "es"],
        default="spark",
        help="shard routing: spark murmur3 (default), lcg oracle-portable, "
        "es bit-exact ES 5.x parity",
    )
    idx.add_argument(
        "--sort-within-shard",
        default="",
        help="comma-separated columns to sort within each shard file",
    )
    # reference bulk-tuning knobs (IndexingJob.java:64-82): advisory
    # under Spark, accepted for invocation parity + manifest audit
    idx.add_argument("--bulk-batch-size", type=int, default=None)
    idx.add_argument("--bulk-batch-size-mb", type=int, default=None)
    idx.add_argument("--bulk-flush-interval", type=int, default=None)
    idx.add_argument("--num-processors", type=int, default=None)
    idx.add_argument(
        "--quarantine",
        default=None,
        help="directory for malformed input lines (default: skip-count only)",
    )

    q = sub.add_parser("query", help="run a registered query by name")
    q.add_argument("name", help="query name (or 'list' to enumerate)")
    q.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="directory with the parquet tables",
    )
    q.add_argument("--limit", type=int, default=20, help="max rows printed")

    c = sub.add_parser("compact", help="force-merge a built index's files")
    c.add_argument("index_path")
    c.add_argument("--target-files-per-shard", type=int, default=1)

    m = sub.add_parser("manifest", help="print a built index's manifest")
    m.add_argument("index_path")
    return p


def _cmd_es_index(args) -> int:
    from elastic_freight_spark.indexer import IndexConfig, build_index
    from elastic_freight_spark.session import get_spark
    from elastic_freight_spark.sources.formats import load_schema_file
    from elastic_freight_spark.sources.json_source import (
        infer_json_schema,
        read_json_lines,
        split_corrupt,
    )

    spark = get_spark(app_name=f"esIndex:{args.index_name}")
    if args.schema == "infer":
        schema = infer_json_schema(spark, args.input.split("|")[0])
    else:
        schema = load_schema_file(spark, args.schema)
    raw = read_json_lines(spark, args.input, schema)
    if args.quarantine:
        # the quarantine write and the index build would otherwise
        # each re-read + re-parse the full input; one cached parse
        # serves both jobs
        raw = raw.persist()
    good, bad = split_corrupt(raw)
    if args.quarantine:
        bad.write.mode("overwrite").parquet(args.quarantine)
    cfg = IndexConfig(
        index_name=args.index_name,
        doc_id_col=args.doc_id_field,
        num_shards=args.num_shards,
        output_path=args.output,
        routing=args.routing,
        sort_within_shard=[
            c for c in args.sort_within_shard.split(",") if c
        ],
    )
    manifest = build_index(good, cfg)
    # record the reference's advisory knobs + ingest stats for audit
    advisory = {
        "bulk_batch_size": args.bulk_batch_size,
        "bulk_batch_size_mb": args.bulk_batch_size_mb,
        "bulk_flush_interval": args.bulk_flush_interval,
        "num_processors": args.num_processors,
    }
    manifest["reference_advisory_params"] = {
        k: v for k, v in advisory.items() if v is not None
    }
    # ingest stats WITHOUT a second scan of the (possibly 100 TB)
    # input: build_index already observed created/failed counters on
    # the write job; good parsed rows = created + null-id-failed.
    # The corrupt count reads back the (malformed-rows-only, tiny)
    # quarantine output when one was written.
    counters = manifest.get("counters", {})
    stats = {
        "good": int(counters.get("index_doc_created", 0))
        + int(counters.get("indexing_doc_fail", 0)),
    }
    if args.quarantine:
        stats["corrupt"] = spark.read.parquet(args.quarantine).count()
    manifest["ingest_stats"] = stats
    from elastic_freight_spark.indexer import _write_manifest

    _write_manifest(manifest["path"], manifest)
    print(json.dumps(manifest, default=str))
    return 0


def _cmd_query(args) -> int:
    # the package registry, NOT the repo-root __spark_entry__ harness:
    # the CLI must work from any cwd with just the package importable
    from elastic_freight_spark import registry

    registry.load_all()
    queries = registry.QUERIES
    if args.name == "list":
        for name in queries:
            print(name)
        return 0
    if args.name not in queries:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    from elastic_freight_spark.session import get_spark

    spark = get_spark(app_name=f"query:{args.name}")
    df = queries[args.name](spark, args.sf_dir)
    for row in df.limit(args.limit).collect():
        print(json.dumps(row.asDict(recursive=True), default=str))
    return 0


def _cmd_compact(args) -> int:
    from elastic_freight_spark.indexer import compact_index
    from elastic_freight_spark.session import get_spark

    spark = get_spark(app_name="compact")
    manifest = compact_index(
        spark, args.index_path, target_files_per_shard=args.target_files_per_shard
    )
    print(json.dumps(manifest, default=str))
    return 0


def _cmd_manifest(args) -> int:
    from elastic_freight_spark.indexer import read_manifest

    print(json.dumps(read_manifest(args.index_path), default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    return {
        "esIndex": _cmd_es_index,
        "query": _cmd_query,
        "compact": _cmd_compact,
        "manifest": _cmd_manifest,
    }[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
