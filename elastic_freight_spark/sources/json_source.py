"""Line-delimited JSON ingest — the reference's native input format
(SURVEY.md §2.1 S1-S3, §2.2 P4).

elastic-freight consumes text files of one JSON object per line via
``TextInputFormat`` (example/IndexingJob.java:113), accepts a
pipe-separated list of input globs (:130-133, README.md:30-31), skips
null/empty payloads and counts — rather than fails on — malformed
documents (job/BaseESReducer.java:232-251, 270-272).

Spark mapping: ``spark.read.text`` + ``from_json`` — the schema'd
path. The raw ``spark.read.json`` reader's ``_corrupt_record`` column
carries a hard analyzer restriction (plans whose pruned scan schema
is corrupt-only are rejected — QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
any count over a corrupt-filtered stream explodes. Parsing
explicitly keeps malformed-row state in an ordinary column with
ordinary semantics:

* one-record-per-line JSON  → ``read.text`` (one string per line; the
  reference's stringly ``index|docId|json`` tuples and the '|'-re-join
  bug they cause, BaseESReducer.java:280-282, never exist)
* multi-path + glob inputs  → list-of-paths read ≡ implicit UNION ALL
* malformed-row policy      → ``from_json`` yields NULL for bad lines;
  ``split_corrupt`` forks good/quarantine streams, ``ingest_stats``
  counts both in one pass

Scale: schema inference is a full extra pass over 100 TB — always
pass an explicit schema in production; ``infer_json_schema`` exists
for exploration (samples N lines, driver-side inference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

RAW_COL = "_raw"
PARSED_COL = "_parsed"
CORRUPT_FIELD = "_corrupt_record"


def read_json_lines(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType | str,
) -> DataFrame:
    """Read LDJSON from one or many paths/globs.

    Returns columns ``(_raw string, _parsed struct<schema>)`` —
    ``_parsed`` is NULL exactly for malformed/blank lines. Use
    :func:`split_corrupt` to fork the streams.

    ``paths`` may be a list, a single path/glob, or the reference's
    pipe-separated multi-input string (README.md:30-31).
    """
    if isinstance(paths, str):
        paths = [p for p in paths.split("|") if p]
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    # PERMISSIVE from_json yields an all-null struct (not NULL) for
    # malformed lines; a columnNameOfCorruptRecord field inside the
    # struct is the reliable malformed-line marker.
    if CORRUPT_FIELD not in schema.fieldNames():
        schema = schema.add(CORRUPT_FIELD, "string")
    raw = spark.read.text(paths).withColumnRenamed("value", RAW_COL)
    return raw.withColumn(
        PARSED_COL,
        F.from_json(
            F.col(RAW_COL), schema, {"columnNameOfCorruptRecord": CORRUPT_FIELD}
        ),
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows, quarantine) from a :func:`read_json_lines` frame.

    good: parsed fields flattened to top-level typed columns.
    quarantine: the raw text of malformed lines (blank lines are
    silently skipped, matching the reference's null-payload skip,
    BaseESReducer.java:270-272).
    """
    corrupt = F.col(PARSED_COL).isNull() | F.col(f"{PARSED_COL}.{CORRUPT_FIELD}").isNotNull()
    good = (
        df.filter(~corrupt)
        .select(f"{PARSED_COL}.*")
        .drop(CORRUPT_FIELD)
    )
    bad = df.filter(corrupt & (F.trim(F.col(RAW_COL)) != "")).select(
        F.col(RAW_COL).alias("corrupt_record")
    )
    return good, bad


def ingest_stats(df: DataFrame) -> dict[str, int]:
    """good/corrupt/blank counts in ONE pass (counter surface,
    §2.1 P4 — the reference's INDEX_DOC_CREATED / INDEXING_DOC_FAIL)."""
    corrupt = F.col(PARSED_COL).isNull() | F.col(f"{PARSED_COL}.{CORRUPT_FIELD}").isNotNull()
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((~corrupt).cast("long")).alias("good"),
        F.sum(
            (corrupt & (F.trim(F.col(RAW_COL)) == "")).cast("long")
        ).alias("blank"),
    ).collect()[0]
    total, good = int(row["total"]), int(row["good"] or 0)
    blank = int(row["blank"] or 0)
    return {"total": total, "good": good, "corrupt": total - good - blank, "blank": blank}


def infer_json_schema(spark: SparkSession, path: str, sample_lines: int = 1000) -> StructType:
    """Exploration helper: infer a schema from a sample (never from
    the full 100 TB input)."""
    sample = spark.read.text(path).limit(sample_lines)
    return spark.read.json(sample.rdd.map(lambda r: r[0])).schema


def parse_json_column(
    df: DataFrame, col: str, schema: StructType | str, keep_raw: bool = False
) -> DataFrame:
    """``from_json`` over an embedded JSON string column (the
    reference re-parses its tuple payloads in the reducer,
    BaseESReducer.java:284-285 — here it's one typed projection)."""
    parsed = df.withColumn("_p", F.from_json(F.col(col), schema))
    keep = [c for c in df.columns if c != col or keep_raw]
    return parsed.select(*keep, "_p.*")
