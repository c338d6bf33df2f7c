"""Array / map scalar-function surface (SURVEY.md §2.9 F12): the
higher-order-function toolkit over array columns, all JVM-side
(whole-stage-codegen'd) — tokenize, explode, transform, filter,
aggregate, distinct — checked against DuckDB's list functions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elastic_freight_spark.registry import query
from elastic_freight_spark.session import load_tables


@query(
    "f_array_token_profile",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_split_to_array(lower(text), '\\s+') AS tokens
      FROM documents
    )
    SELECT doc_id, lang,
           len(tokens) AS n_tokens,
           len(list_distinct(tokens)) AS n_distinct,
           tokens[1] AS first_token,
           list_contains(tokens, 'the') AS has_the,
           len(list_filter(tokens, x -> strlen(x) > 6)) AS n_long,
           CAST(list_sum(list_transform(tokens, x -> strlen(x))) AS BIGINT)
             AS total_chars
    FROM t
    WHERE doc_id < 200
    """,
)
def f_array_token_profile(spark, sf_dir):
    """Per-document token-array profile via higher-order functions:
    size / array_distinct / element_at / array_contains / filter /
    aggregate — every op stays inside codegen (no Python)."""
    docs = load_tables(spark, sf_dir)["documents"]
    t = docs.filter(F.col("doc_id") < 200).select(
        "doc_id",
        "lang",
        F.split(F.lower(F.col("text")), r"\s+").alias("tokens"),
    )
    return t.select(
        "doc_id",
        "lang",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct"),
        F.element_at("tokens", 1).alias("first_token"),
        F.array_contains("tokens", "the").alias("has_the"),
        F.size(F.filter("tokens", lambda x: F.length(x) > 6)).alias("n_long"),
        F.aggregate(
            F.transform("tokens", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("total_chars"),
    )


@query(
    "f_explode_token_bigrams",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS tokens
      FROM documents WHERE doc_id < 100
    ),
    bi AS (
      SELECT doc_id,
             tokens[i] || ' ' || tokens[i + 1] AS bigram
      FROM t, UNNEST(range(1, len(tokens))) AS u(i)
    )
    SELECT bigram, COUNT(*) AS n
    FROM bi GROUP BY bigram HAVING COUNT(*) >= 3
    """,
)
def f_explode_token_bigrams(spark, sf_dir):
    """Bigram counts via zip-with-shifted-self + explode — the
    array→rows fan-out pattern (F12 explode) feeding a count agg."""
    docs = load_tables(spark, sf_dir)["documents"]
    t = docs.filter(F.col("doc_id") < 100).select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("tokens")
    )
    bigrams = t.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("tokens", 1, F.size("tokens") - 1),
                F.slice("tokens", 2, F.size("tokens") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
    )
