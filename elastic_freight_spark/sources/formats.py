"""Source/sink format dispatch (SURVEY.md §2.1 S4/S9) and the
schema-file reader (S8).

The reference reaches storage through a URI-scheme strategy class
(transport/SnapshotTransportStrategy.java:26-61 selecting S3/HDFS/
local implementations totalling ~530 LoC); Spark's Hadoop FS layer
already routes ``s3a://``, ``hdfs://`` and ``file://`` through one
DataFrameReader, so the strategy surface here is just the *format*
choice. Avro is declared-but-unused in the reference (pom.xml:96-99,
``provided`` scope, no Avro code) — mirrored here as a gated format
that raises a clear error when the external spark-avro module isn't
deployed.

The reference's S8 (ES mappings JSON fetched from S3 and applied at
index-creation time, job/BaseESReducer.java:160-178) maps to a schema
file — Spark StructType JSON or a DDL string — loaded through the
same Hadoop FS layer and applied to any reader.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json", "text", "avro")


def read_any(
    spark: SparkSession,
    path: str | list[str],
    fmt: str,
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """One reader for every supported format; schemes (s3a/hdfs/file)
    and globs resolve in the Hadoop FS layer. CSV defaults to
    header=true. Always pass an explicit schema at scale — inference
    is an extra full pass for csv/json."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    if fmt == "avro":
        fmt = _avro_format(spark)
    if isinstance(path, str):
        path = [p for p in path.split("|") if p]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    return reader.options(**options).format(fmt).load(path)


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    if fmt == "avro":
        fmt = _avro_format(df.sparkSession)
    writer = df.write.mode(mode).options(**options)
    if fmt == "csv" and "header" not in options:
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


_AVRO_CLASS = "org.apache.spark.sql.avro.AvroFileFormat"


def _avro_format(spark: SparkSession) -> str:
    """Avro ships as an external module; some distros carry the
    classes without registering the short name in the DataSource
    service loader. Resolve to the fully-qualified format when the
    class is present, else fail with the deploy hint instead of a
    deep ClassNotFound."""
    try:
        spark._jvm.java.lang.Class.forName(_AVRO_CLASS)
        return _AVRO_CLASS
    except Exception as exc:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "Avro support requires the external spark-avro module "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>); "
            "it is not deployed in this session"
        ) from exc


# --- S8: schema file ------------------------------------------------------


def load_schema_file(spark: SparkSession, path: str) -> StructType:
    """Load a schema definition through the Hadoop FS layer (works for
    s3a://, hdfs://, file:// — the reference fetches its mappings file
    from S3 the same way). Two accepted contents:

    * Spark StructType JSON (``schema.json()`` output)
    * a one-line DDL string (``"a INT, b STRING"``)
    """
    text = "\n".join(
        r["value"] for r in spark.read.text(path).collect()
    ).strip()
    try:
        return StructType.fromJson(json.loads(text))
    except (json.JSONDecodeError, KeyError, TypeError):
        return StructType.fromDDL(text)


def save_schema_file(schema: StructType, local_path: str) -> None:
    with open(local_path, "w") as f:
        f.write(schema.json())
