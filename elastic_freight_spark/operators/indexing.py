"""Indexing-pipeline operators as oracle-checkable queries
(SURVEY.md §2.1-2.3, §2.11): shard routing + distribution, grouped
batching stats, manifest dedup, missing-shard detection, and the
pandas-UDF extension surface.

These are the query-shaped faces of the reference's core machinery
(mapper → ShardPartitioner → reducer → post-processor); the actual
write pipeline lives in elastic_freight_spark.indexer and is
exercised end-to-end by tests/test_indexer.py and entry().
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from elastic_freight_spark.functions import dsum, sql_dsum
from elastic_freight_spark.registry import query
from elastic_freight_spark.session import load_tables
from elastic_freight_spark.sharding import (
    lcg_org_subset_shard_col,
    lcg_org_subset_shard_sql,
    lcg_shard_col,
    lcg_shard_sql,
)

N_SHARDS = 16


@query(
    "shard_distribution",
    oracle=f"""
    SELECT {lcg_shard_sql('user_id', N_SHARDS)} AS shard,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1
    """,
)
def shard_distribution(spark, sf_dir):
    """The reference's map+shuffle phase as a query: route every
    document to its shard (ShardPartitioner.java:35-39) and count
    per-shard load — the docs-per-reducer histogram an operator
    would use to spot skew before the write."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .withColumn("shard", lcg_shard_col("user_id", N_SHARDS))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", "sum_value"),
        )
    )


@query(
    "shard_missing_detection",
    oracle=f"""
    SELECT CAST(r.range AS INT) AS shard
    FROM range(64) r
    WHERE NOT EXISTS (
      SELECT 1 FROM (
        SELECT {lcg_shard_sql('user_id', 64)} AS shard
        FROM events WHERE user_id < 20
      ) p WHERE p.shard = r.range
    )
    ORDER BY shard
    """,
)
def shard_missing_detection(spark, sf_dir):
    """Missing-shard detection (IndexingPostProcessor.placeMissing
    Shards → BaseTransport.java:144-167): expected shard ids minus
    produced, as a left-anti join of a range frame against the
    sharded subset. 20 users over 64 shards guarantees gaps."""
    t = load_tables(spark, sf_dir)
    produced = (
        t["events"]
        .filter(F.col("user_id") < 20)
        .select(lcg_shard_col("user_id", 64).alias("shard"))
        .distinct()
    )
    expected = spark.range(64).select(F.col("id").cast("int").alias("shard"))
    return expected.join(produced, "shard", "left_anti")


@query(
    "manifest_dedup",
    oracle="""
    SELECT idx, CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(SUM(n_docs) AS BIGINT) AS total_docs
    FROM (
      SELECT 'events_' || CAST(user_id % 3 AS VARCHAR) AS idx,
             user_id % 8 AS shard_id,
             COUNT(*) AS n_docs
      FROM events
      GROUP BY 1, 2
    )
    GROUP BY idx
    """,
)
def manifest_dedup(spark, sf_dir):
    """Manifest merge + dedup (IndexingPostProcessor.java:148-173):
    per-(index, shard) manifest entries collapse to one row per
    index with shard count and doc totals — the reference's HashSet
    dedup as groupBy/distinct."""
    t = load_tables(spark, sf_dir)
    entries = (
        t["events"]
        .select(
            F.concat(F.lit("events_"), (F.col("user_id") % 3).cast("string")).alias("idx"),
            (F.col("user_id") % 8).alias("shard_id"),
        )
        .groupBy("idx", "shard_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return entries.groupBy("idx").agg(
        F.count(F.lit(1)).alias("n_shards"), F.sum("n_docs").alias("total_docs")
    )


@query(
    "grouped_batch_stats",
    oracle="""
    SELECT shard, CAST(CEIL(n_docs / 20000.0) AS BIGINT) AS n_batches,
           n_docs
    FROM (
      SELECT user_id % 8 AS shard, COUNT(*) AS n_docs
      FROM events GROUP BY 1
    )
    ORDER BY shard
    """,
)
def grouped_batch_stats(spark, sf_dir):
    """Bulk batching math (§2.1 S5): the reference flushes every
    20,000 docs (IndexingJob.java:64-67) — per-shard batch counts at
    that threshold."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy((F.col("user_id") % 8).alias("shard"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "shard",
            F.ceil(F.col("n_docs") / 20000.0).alias("n_batches"),
            "n_docs",
        )
    )


ORG_SHARDS = 32  # N
ORG_K = 4  # partition size: each org spreads over k of N shards


@query(
    "org_routing_subset",
    oracle=f"""
    SELECT org,
           CAST(COUNT(DISTINCT {lcg_org_subset_shard_sql('org', 'event_id', 32, 4)})
             AS BIGINT) AS n_shards_used,
           COUNT(*) AS n_docs
    FROM (SELECT user_id % 50 AS org, user_id, event_id FROM events)
    GROUP BY org
    """,
)
def org_routing_subset(spark, sf_dir):
    """Org→k-of-N subset routing (the scheme the reference documents
    but never implemented, ElasticsearchRoutingStrategyV5.java:18-40;
    ES shipped it as routing_partition_size): hash(org) picks a
    k-wide shard window, hash(doc) spreads within it. Per-org shard
    fan-out must be ≤ k — the middle ground between hot-org
    concentration (k=1) and full fan-out (k=N). Query-side, an org
    filter prunes to its k shards (lcg_possible_org_shards)."""
    t = load_tables(spark, sf_dir)
    orgs = t["events"].select(
        (F.col("user_id") % 50).alias("org"), "user_id", "event_id"
    )
    return (
        orgs.withColumn(
            "shard", lcg_org_subset_shard_col("org", "event_id", ORG_SHARDS, ORG_K)
        )
        .groupBy("org")
        .agg(
            F.countDistinct("shard").alias("n_shards_used"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@query(
    "manifest_catalog",
    oracle="""
    SELECT * FROM (
      SELECT 'customer_idx' AS index_name, 4 AS num_shards,
             CAST(COUNT(*) AS BIGINT) AS doc_created,
             CAST(0 AS BIGINT) AS doc_failed
      FROM customer
      UNION ALL
      SELECT 'orders_idx', 8, CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT)
      FROM orders
    ) ORDER BY index_name
    """,
)
def manifest_catalog(spark, sf_dir):
    """Multi-index job + post-processor merge (IndexingPostProcessor
    .java:144-246 + ShardConfig.java:13-38): build two real indexes
    with per-index shard counts from one ShardConfig, merge their
    manifests into one catalog, and report the catalog's per-index
    row (shards, created/failed counters). The doc counts are
    oracle-checkable against the source tables because the build
    routes every non-null-id row."""
    import tempfile

    from elastic_freight_spark.indexer import ShardConfig, build_indexes

    t = load_tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="efs_catalog_")
    cat = build_indexes(
        {
            "customer_idx": t["customer"].withColumnRenamed("c_custkey", "doc_id"),
            "orders_idx": t["orders"].withColumnRenamed("o_orderkey", "doc_id"),
        },
        doc_id_col="doc_id",
        output_path=out,
        shard_config=ShardConfig({"orders_idx": 8}, default_shards=4),
    )
    rows = [
        (
            name,
            int(e["num_shards"]),
            int(e["counters"]["index_doc_created"]),
            int(e["counters"]["indexing_doc_fail"]),
        )
        for name, e in sorted(cat["indices"].items())
    ]
    return spark.createDataFrame(
        rows,
        "index_name string, num_shards int, doc_created bigint, doc_failed bigint",
    ).orderBy("index_name")


@query(
    "index_upsert_latest",
    oracle="""
    WITH base AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(CASE WHEN user_id % 7 = 0 THEN n_events * 10
                     ELSE n_events END AS BIGINT) AS n_events,
           CAST(CASE WHEN user_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT) AS version
    FROM base
    WHERE user_id % 13 <> 3
    """,
)
def index_upsert_latest(spark, sf_dir):
    """Incremental upsert surface (beyond the reference's immutable
    snapshot): build a per-user base index, apply an update batch
    (v1: users %7==0 get 10x counts) and a tombstone batch (v2:
    users %13==3 deleted), then resolve merge-on-read latest. The
    oracle recomputes the same end state relationally — the
    log-structured mechanics must be invisible in the result."""
    import tempfile

    from elastic_freight_spark.indexer import (
        IndexConfig,
        build_index,
        read_index_latest,
        upsert_index,
    )

    t = load_tables(spark, sf_dir)
    base = t["events"].groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    out = tempfile.mkdtemp(prefix="efs_upsert_")
    man = build_index(
        base, IndexConfig("upsert_idx", "user_id", 8, out, routing="lcg")
    )
    updates = base.filter(F.col("user_id") % 7 == 0).withColumn(
        "n_events", F.col("n_events") * 10
    )
    upsert_index(updates, man["path"])
    deletes = base.filter(F.col("user_id") % 13 == 3).select("user_id")
    upsert_index(deletes, man["path"], delete=True)
    latest = read_index_latest(spark, man["path"])
    return latest.select(
        "user_id",
        "n_events",
        F.coalesce(F.col("_version"), F.lit(0)).alias("version"),
    )


@query("es_parity_shard_distribution")  # rows-only: murmur3/UTF-16LE not in SQL
def es_parity_shard_distribution(spark, sf_dir):
    """Bit-exact ES 5.x routing over string ids via the pandas UDF
    (§2.11) — distribution check. No SQL oracle (murmur3 over
    UTF-16LE isn't expressible); parity is pinned by known-answer
    unit tests in tests/test_sharding.py instead."""
    from elastic_freight_spark.sharding import es_murmur3_shard_udf

    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .select(es_murmur3_shard_udf(8)(F.col("user_id").cast("string")).alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "apply_in_pandas_group_rank",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id) AS INT)
             AS value_rank
    FROM events
    """,
)
def apply_in_pandas_group_rank(spark, sf_dir):
    """The reference's per-group reducer hook surface (§2.11:
    subclassing BaseESReducer) as applyInPandas: an arbitrary
    pandas computation per user group. Integer output keeps it
    oracle-exact; the same slot hosts any custom per-group logic."""
    t = load_tables(spark, sf_dir)

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # Vectorized numpy body (optimization guide §4.2: hand whole
        # batches to native code): lexsort on the raw arrays + direct
        # column construction replaces sort_values + row-copy subset —
        # measured 4.3-4.9 s → 2.7-2.9 s for the full query at sf0.1,
        # bit-identical output incl. the 337 (user, value) tie groups
        # (lexsort's last key is primary: -value desc, event_id asc).
        import numpy as np

        eid = pdf["event_id"].to_numpy()
        order = np.lexsort((eid, -pdf["value"].to_numpy()))
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy()[order],
                "event_id": eid[order],
                "value_rank": np.arange(1, len(eid) + 1, dtype="int32"),
            }
        )

    return (
        t["events"]
        .select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(rank_group, schema="user_id long, event_id long, value_rank int")
    )


@query(
    "apply_in_arrow_group_rank",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id) AS INT)
             AS value_rank
    FROM events
    """,
)
def apply_in_arrow_group_rank(spark, sf_dir):
    """The SAME per-group rank as ``apply_in_pandas_group_rank`` via
    the Arrow-NATIVE grouped-map API (``applyInArrow``, Spark 4): the
    worker function receives a ``pyarrow.Table`` directly — no
    Arrow→pandas→Arrow conversion, no index materialization, no NaN
    coercion of nullable ints. For binary/wide multimodal columns the
    pandas hop is the dominant per-batch cost, so this is the surface
    a 100 TB decode pipeline should prefer; keeping both queries
    oracle-identical pins that the two APIs agree bit-for-bit."""
    import sys

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyspark

    # Ship by value: executors must not need this repo importable.
    pyspark.cloudpickle.register_pickle_by_value(sys.modules[__name__])

    def rank_group(table: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            table,
            sort_keys=[("value", "descending"), ("event_id", "ascending")],
        )
        t = table.take(idx)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "value_rank": pa.array(
                    range(1, t.num_rows + 1), pa.int32()
                ),
            }
        )

    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInArrow(
            rank_group, schema="user_id long, event_id long, value_rank int"
        )
    )


@query(
    "pandas_udaf_group_geomean",
    oracle="""
    SELECT o_orderstatus,
           ROUND(EXP(AVG(LN(o_totalprice))), 6) AS geomean_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def pandas_udaf_group_geomean(spark, sf_dir):
    """The grouped-aggregate pandas UDF surface (§2.11's custom-UDAF
    slot — the one UDF API variant the other pins don't cover): a
    vectorized numpy geometric mean per order status. Spark plans it
    as a real aggregate (partial batches stream through Arrow), not a
    collect-the-group applyInPandas. SQL-oracle via the
    geomean ≡ exp(avg(ln(x))) identity, rounded to 6 decimals to
    absorb libm/summation-order ULP differences (the unit test pins
    the unrounded UDAF against the JVM identity more tightly)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(F.round(geomean("o_totalprice"), 6).alias("geomean_price"))
    )


@query(
    "udtf_text_segments",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), seg AS (
      SELECT doc_id,
             CAST(i - 1 AS INTEGER) AS seg_id,
             CAST(len(toks[(i-1)*40+1 : LEAST(i*40, len(toks))]) AS INTEGER)
               AS n_tokens
      FROM tok,
           UNNEST(range(1, CAST((len(toks) + 39) // 40 AS BIGINT) + 1)) AS r(i)
    )
    SELECT doc_id, seg_id, n_tokens FROM seg
    """,
)
def udtf_text_segments(spark, sf_dir):
    """The Python UDTF surface (§2.11's table-function slot): one row
    in, N rows out, consumed via SQL LATERAL join — the API a user
    reaches for when a per-row expansion needs imperative Python (a
    real tokenizer, a parser) rather than a JVM higher-order
    function. Here: fixed 40-token segmentation of each document.

    Arrow-batched (``useArrow=True``) like every Python surface in
    this engine; the equivalent JVM-only plan exists
    (``dedup_paragraph_spans`` uses transform/slice) — this entry
    pins the UDTF API, the others stay JVM. At scale a UDTF is
    embarrassingly parallel: no shuffle, each worker expands its own
    partition."""
    import sys

    import pyspark
    from pyspark.sql.functions import udtf

    # Ship by value: executors must not need this repo importable.
    pyspark.cloudpickle.register_pickle_by_value(sys.modules[__name__])

    @udtf(returnType="seg_id: int, n_tokens: int", useArrow=True)
    class TextSegments:
        def eval(self, text: str):
            toks = text.lower().split(" ")
            for i in range(0, len(toks), 40):
                yield i // 40, len(toks[i : i + 40])

    load_tables(spark, sf_dir)
    spark.udtf.register("text_segments", TextSegments)
    return spark.sql(
        """
        SELECT d.doc_id, s.seg_id, s.n_tokens
        FROM documents d, LATERAL text_segments(d.text) s
        """
    )


@query(
    "shard_balance_report",
    oracle=f"""
    WITH sharded AS (
      SELECT {lcg_shard_sql('o_custkey', 16)} AS shard FROM orders
    ), counts AS (
      SELECT shard, COUNT(*) AS n FROM sharded GROUP BY shard
    ), tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(MIN(n) AS BIGINT) AS min_docs,
           CAST(MAX(n) AS BIGINT) AS max_docs,
           ROUND(MAX(n) / CAST(MIN(n) AS DOUBLE), 9) AS balance_ratio,
           ROUND(SUM((n - total / 16.0) * (n - total / 16.0))
                 / (MAX(total) / 16.0), 9) AS chi_square
    FROM counts CROSS JOIN tot
    """,
)
def shard_balance_report(spark, sf_dir):
    """Shard-balance audit as a query — the reference's
    ``testOrgDistribution`` (ElasticsearchRoutingStrategyV5Test.java
    :130-141: fixed orgs must spread across all shards) promoted from
    a 15-row unit test to the production health check an operator
    runs after every build: docs per shard, max/min balance ratio,
    and the chi-square statistic against uniform routing. For 16
    shards (15 dof, alpha=0.001) chi-square above ~37.7 means the
    routing is NOT behaving uniformly — the number that predicts a
    straggler reducer BEFORE a 100 TB shuffle runs, not after."""
    t = load_tables(spark, sf_dir)
    sharded = t["orders"].select(
        lcg_shard_col("o_custkey", N_SHARDS).alias("shard")
    )
    counts = sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("double").alias("total"))
    exp = F.col("total") / N_SHARDS
    return counts.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.min("n").cast("bigint").alias("min_docs"),
        F.max("n").cast("bigint").alias("max_docs"),
        F.round(F.max("n") / F.min("n").cast("double"), 9).alias("balance_ratio"),
        F.round(
            F.sum((F.col("n") - exp) * (F.col("n") - exp)) / F.first(exp), 9
        ).alias("chi_square"),
    )


# Shared SCD2 version-interval definition (spliced after WITH in both
# scd2 oracles) — ONE fragment so the history builder and the
# point-in-time lookup can never desynchronize on what a "version" is.
_SCD2_VERSIONS_SQL = """changes AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    versions AS (
      SELECT user_id, ts, event_type,
             LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM changes
      WHERE prev_type IS NULL OR event_type <> prev_type
    )"""


def scd2_versions(spark, sf_dir):
    """Spark twin of _SCD2_VERSIONS_SQL: the user state-change
    version frame both scd2 queries are built from."""
    from pyspark.sql import Window as W

    ev = load_tables(spark, sf_dir)["events"]
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(wo))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .withColumn("next_ts", F.lead("ts").over(wo))
    )


@query(
    "index_scd2_history",
    oracle=f"""
    WITH {_SCD2_VERSIONS_SQL}
    SELECT user_id,
           event_type AS state,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(next_ts) AS BIGINT) AS valid_to_us,
           CAST(CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS INT)
             AS is_current
    FROM versions
    ORDER BY user_id, valid_from_us
    """,
)
def index_scd2_history(spark, sf_dir):
    """Slowly-changing-dimension TYPE-2 history build — the versioned
    face of the upsert family (`index_upsert_latest` keeps only the
    latest row per key, type 1; this materializes every state CHANGE
    as a [valid_from, valid_to) row with an is_current flag), here
    tracking each user's event-type state machine. Two same-partition
    windows over ONE user-keyed shuffle: LAG collapses consecutive
    duplicates into change rows, LEAD closes each version with the
    next change's timestamp (NULL = open/current). Interval bounds
    in integer microseconds per the timestamp discipline; a
    time-travel reader slices history with
    ``valid_from_us <= t < COALESCE(valid_to_us, +inf)``. At scale
    the change-row frame is change-sized, not event-sized — the only
    event-sized work is the first window pass."""
    versions = scd2_versions(spark, sf_dir)
    return versions.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros("next_ts").alias("valid_to_us"),
        F.when(F.col("next_ts").isNull(), 1).otherwise(0).cast("int").alias(
            "is_current"
        ),
    ).orderBy("user_id", "valid_from_us")


@query(
    "scd2_asof_lookup",
    oracle=f"""
    WITH {_SCD2_VERSIONS_SQL},
    bounds AS (
      SELECT CAST(epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS BIGINT) AS lo,
             CAST(epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS BIGINT) AS hi
      FROM events
    ),
    probes AS (
      SELECT k, lo + (hi - lo) * k // 4 AS probe_us
      FROM bounds, (SELECT unnest([1, 2, 3]) AS k)
    )
    SELECT CAST(p.k AS INT) AS probe_k, p.probe_us,
           v.event_type AS state,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM probes p
    JOIN versions v
      ON CAST(epoch_us(v.ts) AS BIGINT) <= p.probe_us
     AND (v.next_ts IS NULL
          OR CAST(epoch_us(v.next_ts) AS BIGINT) > p.probe_us)
    GROUP BY 1, 2, 3
    ORDER BY probe_k, state
    """,
)
def scd2_asof_lookup(spark, sf_dir):
    """Point-in-time state census over the SCD2 history — the
    feature-store PIT read: "how many users were in each state at
    time t" for the three quartile instants of the event-time range.
    Shares the version-interval definition with `index_scd2_history`
    via ONE fragment (`_SCD2_VERSIONS_SQL` / `scd2_versions`), so the
    lookup can never disagree with the history it reads. Probe times
    are integer-microsecond arithmetic (lo + (hi−lo)·k div 4) per the
    thresholds-as-integers discipline; the interval predicate is a
    3-row broadcast against the change-sized version frame, and each
    user matches at most one version per probe by construction
    (intervals partition the timeline), so n_users is a plain
    count."""
    versions = scd2_versions(spark, sf_dir)
    ev = load_tables(spark, sf_dir)["events"]
    bounds = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    )
    probes = bounds.select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
        "lo",
        "hi",
    ).select(
        "k",
        # integer `div`, not double /: exact past 2^53 microseconds
        F.expr("lo + (hi - lo) * k div 4").cast("bigint").alias("probe_us"),
    )
    v = versions.select(
        "event_type",
        F.unix_micros("ts").alias("from_us"),
        F.unix_micros("next_ts").alias("to_us"),
    )
    joined = F.broadcast(probes).join(
        v,
        (F.col("from_us") <= F.col("probe_us"))
        & (F.col("to_us").isNull() | (F.col("to_us") > F.col("probe_us"))),
    )
    return (
        joined.groupBy(
            F.col("k").cast("int").alias("probe_k"),
            "probe_us",
            F.col("event_type").alias("state"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("probe_k", "state")
    )
