"""Sampling / profiling / reshaping operators for training-data
pipelines: pivot (crosstab), stratified sampling, train/test split,
and column profiling.

No reference analogue (elastic-freight moves every document,
unsampled); these are north-star pipeline ops. Sampling at 100 TB is
map-side only — `sample`/`sampleBy` evaluate a seeded hash per row
inside the scan, no shuffle, so a 1% stratified sample of 100 TB
costs one read pass and writes 1 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elastic_freight_spark.registry import query
from elastic_freight_spark.session import load_tables


def sorted_fold(terms_col):
    """Order-pinned float summation: left-fold an array of
    ``struct(<sort keys...>, v: double)`` after ``sort_array`` (which
    orders by the struct fields in declaration order — put the
    group-unique key fields FIRST and the double term LAST).

    This is the stats_anova_oneway pattern (relational.py) made
    reusable after the salted-100x battery caught
    ``text_unigram_lm_score`` flipping a ROUND(..., 9) boundary
    RUN-TO-RUN: a plain ``F.sum`` over float terms is
    order-unspecified (task scheduling changes the reduction order),
    which is banned in hash-compared paths. The DuckDB twin is
    ``list_reduce(list_transform(list_sort(list(struct_pack(k := ...,
    v := ...))), x -> x.v), (a, b) -> a + b)`` — an UNORDERED list
    aggregate sorted by the scalar ``list_sort`` (struct comparison is
    field-order lexicographic, matching Spark's sort_array), NOT the
    ``list(... ORDER BY ...)`` ordered-aggregate form: DuckDB's
    ordered aggregate buffers pathologically (it blew a 92 GB limit
    in 27 s on the salted-100x corpus where the list_sort form runs
    the identical reduction in 1 s). Both engines then evaluate the
    IDENTICAL left-fold tree — the
    0.0 seed here matches DuckDB's seedless first element because
    0.0 + x == x bit-exactly for every x that is not -0.0, and no
    term in the five converted queries can be -0.0 (ln(1.0) is +0.0
    and c·(+0.0) stays +0.0).

    Scale: each array is ONE GROUP's terms — bounded by doc length
    for the per-doc queries, and pre-bucketed (md5-prefix) for the
    corpus-sized groups in text_source_drift_kl."""
    return F.aggregate(
        F.sort_array(terms_col), F.lit(0.0), lambda acc, x: acc + x["v"]
    )


@query(
    "pivot_priority_by_status",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS urgent,
           CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS high,
           CAST(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS medium,
           CAST(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS notspec,
           CAST(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def pivot_priority_by_status(spark, sf_dir):
    """groupBy().pivot(): long→wide crosstab. Pivot values are
    declared explicitly — at scale an undeclared pivot needs an extra
    distinct pass over the pivot column first."""
    orders = load_tables(spark, sf_dir)["orders"]
    return (
        orders.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
        .select(
            "o_orderstatus",
            F.coalesce(F.col("1-URGENT"), F.lit(0)).alias("urgent"),
            F.coalesce(F.col("2-HIGH"), F.lit(0)).alias("high"),
            F.coalesce(F.col("3-MEDIUM"), F.lit(0)).alias("medium"),
            F.coalesce(F.col("4-NOT SPECIFIED"), F.lit(0)).alias("notspec"),
            F.coalesce(F.col("5-LOW"), F.lit(0)).alias("low"),
        )
    )


@query(
    "profile_documents_table",
    oracle="""
    SELECT 'n_chars' AS column_name,
           CAST(COUNT(n_chars) AS BIGINT) AS n_non_null,
           CAST(COUNT(*) - COUNT(n_chars) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS n_distinct,
           CAST(MIN(n_chars) AS DOUBLE) AS min_val,
           CAST(MAX(n_chars) AS DOUBLE) AS max_val
    FROM documents
    UNION ALL
    SELECT 'doc_id',
           CAST(COUNT(doc_id) AS BIGINT),
           CAST(COUNT(*) - COUNT(doc_id) AS BIGINT),
           CAST(COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(MIN(doc_id) AS DOUBLE), CAST(MAX(doc_id) AS DOUBLE)
    FROM documents
    """,
)
def profile_documents_table(spark, sf_dir):
    """Column-profile pass (null counts, cardinality, range) — the
    data-quality gate before any training run. One scan computes every
    column's stats (a single aggregate, not one job per column)."""
    docs = load_tables(spark, sf_dir)["documents"]

    def stats(col):
        return [
            F.count(F.col(col)).alias(f"{col}__n_non_null"),
            (F.count(F.lit(1)) - F.count(F.col(col))).alias(f"{col}__n_null"),
            F.countDistinct(F.col(col)).alias(f"{col}__n_distinct"),
            F.min(F.col(col)).cast("double").alias(f"{col}__min_val"),
            F.max(F.col(col)).cast("double").alias(f"{col}__max_val"),
        ]

    wide = docs.agg(*(stats("n_chars") + stats("doc_id")))
    # unpivot wide one-row stats → (column_name, metric...) rows
    return wide.selectExpr(
        "stack(2, "
        "'n_chars', n_chars__n_non_null, n_chars__n_null, n_chars__n_distinct, "
        "n_chars__min_val, n_chars__max_val, "
        "'doc_id', doc_id__n_non_null, doc_id__n_null, doc_id__n_distinct, "
        "doc_id__min_val, doc_id__max_val"
        ") AS (column_name, n_non_null, n_null, n_distinct, min_val, max_val)"
    )


@query(
    "sample_class_balance_plan",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    target AS (SELECT MIN(n) AS floor_n FROM counts)
    SELECT c.lang, CAST(c.n AS BIGINT) AS n_docs,
           ROUND(CAST(t.floor_n AS DOUBLE) / c.n, 9) AS sample_fraction
    FROM counts c CROSS JOIN target t
    """,
)
def sample_class_balance_plan(spark, sf_dir):
    """Class-rebalance planning: per-language doc counts and the
    downsampling fraction that levels every class to the smallest —
    the deterministic half of stratified sampling (the fractions that
    feed sampleBy)."""
    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    floor_n = counts.agg(F.min("n").alias("floor_n"))
    return (
        counts.crossJoin(F.broadcast(floor_n))
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            F.round(F.col("floor_n").cast("double") / F.col("n"), 9).alias(
                "sample_fraction"
            ),
        )
    )


@query("sample_stratified_by_lang")  # rows-only: seeded sampling is engine-specific
def sample_stratified_by_lang(spark, sf_dir):
    """Stratified sample via sampleBy (seeded, map-side, no shuffle):
    ~40% of each language's documents; per-language sampled counts.
    Determinism across engines is impossible (different PRNGs), so
    this is rows-only; the unit test pins seed-stability and bounds."""
    docs = load_tables(spark, sf_dir)["documents"]
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    sampled = docs.sampleBy("lang", {lang: 0.4 for lang in langs}, seed=42)
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


def train_test_split(df, weights=(0.8, 0.2), seed: int = 42):
    """Deterministic split — not randomSplit (whose per-partition
    sampling re-deals rows when the partitioning changes) but a stable
    hash of the row content: reproducible across cluster sizes, the
    property a 100 TB training/eval split must have."""
    total = float(sum(weights))
    bounds, acc = [], 0.0
    for w in weights[:-1]:
        acc += w / total
        bounds.append(acc)
    # pmod, not abs: abs(Long.MIN_VALUE) is still negative in the JVM,
    # which would drop that row from every split
    bucket = F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000)) / 1_000_000.0
    frames = []
    prev = 0.0
    for b in [*bounds, 1.0]:
        frames.append(df.filter((bucket >= prev) & (bucket < b)))
        prev = b
    return frames


@query(
    "sample_source_mix_plan",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs,
             POWER(COUNT(*), 0.5) AS w
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT SUM(w) AS wsum, SUM(n_docs) AS total FROM counts
    )
    SELECT c.lang, CAST(c.n_docs AS BIGINT) AS n_docs,
           ROUND(c.w / t.wsum, 6) AS mix_weight,
           CAST(FLOOR(10000 * c.w / t.wsum) AS BIGINT) AS docs_per_epoch,
           ROUND((c.w / t.wsum) / (c.n_docs / CAST(t.total AS DOUBLE)), 6)
             AS upsample_factor
    FROM counts c CROSS JOIN tot t
    """,
)
def sample_source_mix_plan(spark, sf_dir):
    """Temperature-flattened source mixing (alpha=0.5, the multilingual
    -sampling rule): weight each source/language by count^alpha so rare
    sources are upsampled toward parity without drowning the head. The
    plan reports per-source mix weight, docs per 10k-sample epoch, and
    the implied upsample factor — the numbers a training-data loader
    consumes. One aggregate + a broadcast 1-row total: no second
    corpus scan for the normalizer."""
    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    counts = counts.withColumn("w", F.pow(F.col("n_docs"), F.lit(0.5)))
    tot = counts.agg(
        F.sum("w").alias("wsum"), F.sum("n_docs").alias("total")
    )
    mix = F.col("w") / F.col("wsum")
    share = F.col("n_docs") / F.col("total").cast("double")
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(mix, 6).alias("mix_weight"),
        # (10000*w)/wsum, the oracle's association — NOT 10000*(w/wsum),
        # which double-rounds and can floor one off at exact-integer
        # boundaries (the sample_temperature_sweep sf0.001 finding;
        # sqrt weights make a hit unlikely here, but the expressions
        # must be the same tree on both sides regardless)
        F.floor(F.lit(10000) * F.col("w") / F.col("wsum"))
        .cast("bigint")
        .alias("docs_per_epoch"),
        F.round(mix / share, 6).alias("upsample_factor"),
    )


@query(
    "sample_reservoir_per_lang",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 10
    """,
)
def sample_reservoir_per_lang(spark, sf_dir):
    """Deterministic 'reservoir' k-per-stratum sample: rank rows by a
    content hash (md5 of the id — engine-portable, unlike any PRNG)
    and keep the k smallest per language. Statistically a uniform
    without-replacement sample per stratum, but reproducible across
    engines, partitionings, AND corpus growth: a document keeps or
    loses its slot only based on hashes, never on arrival order —
    the property randomSplit/sampleBy cannot give. At scale the
    window is a single shuffle on the stratum key; with a hot stratum
    compose with skewed_topk_per_group (same shape: min-k by a key)."""
    docs = load_tables(spark, sf_dir)["documents"]
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 10)
    )


def dq_check(df, checks):
    """Deequ-style declarative data-quality gate: ``checks`` maps a
    constraint name to an aggregate expression counting its VIOLATIONS
    (0 = pass). All constraints fold into ONE aggregate — a 20-check
    suite over 100 TB costs a single map-side-combined pass, never one
    job per check — then unpivot to a (constraint, violations, passed)
    report via stack()."""
    from pyspark.sql import functions as F

    agg = df.agg(*[c.cast("bigint").alias(n) for n, c in checks.items()])
    pairs = ", ".join(f"'{n}', {n}" for n in checks)
    return agg.selectExpr(
        f"stack({len(checks)}, {pairs}) AS (constraint_name, violations)"
    ).withColumn("passed", F.col("violations") == 0)


@query(
    "dq_orders_constraints",
    oracle="""
    WITH a AS (
      SELECT COUNT(*) AS n_rows,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_key,
             SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price,
             SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P')
                      THEN 1 ELSE 0 END) AS bad_status,
             SUM(CASE WHEN o_orderdate < DATE '1990-01-01'
                       OR o_orderdate > DATE '2005-01-01'
                      THEN 1 ELSE 0 END) AS bad_date
      FROM orders
    )
    SELECT constraint_name, CAST(violations AS BIGINT) AS violations,
           violations = 0 AS passed
    FROM (
      SELECT 'complete_custkey' AS constraint_name, null_cust AS violations FROM a
      UNION ALL SELECT 'unique_orderkey', dup_key FROM a
      UNION ALL SELECT 'positive_totalprice', bad_price FROM a
      UNION ALL SELECT 'valid_orderstatus', bad_status FROM a
      UNION ALL SELECT 'orderdate_in_range', bad_date FROM a
    )
    """,
)
def dq_orders_constraints(spark, sf_dir):
    """Data-quality constraint suite on orders (completeness,
    uniqueness, range, domain, freshness-window) — the ingestion gate
    a pipeline runs before accepting a drop. One pass, one report."""
    orders = load_tables(spark, sf_dir)["orders"]
    ok_status = F.col("o_orderstatus").isin("F", "O", "P")
    in_range = F.col("o_orderdate").between("1990-01-01", "2005-01-01")
    return dq_check(
        orders,
        {
            "complete_custkey": F.sum(F.col("o_custkey").isNull().cast("int")),
            "unique_orderkey": F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
            "positive_totalprice": F.sum((F.col("o_totalprice") <= 0).cast("int")),
            "valid_orderstatus": F.sum((~ok_status).cast("int")),
            "orderdate_in_range": F.sum((~in_range).cast("int")),
        },
    )


@query(
    "training_shuffle_order",
    oracle="""
    SELECT doc_id, md5(concat('42:', CAST(doc_id AS VARCHAR))) AS shuffle_key
    FROM documents
    ORDER BY shuffle_key, doc_id
    LIMIT 100
    """,
)
def training_shuffle_order(spark, sf_dir):
    """Deterministic global training-order shuffle: the order key is
    md5(seed || doc_id) — reproducible across engines, partition
    counts, and reruns (unlike ``rand()``), and a new seed is a new
    epoch permutation with zero data movement until the export. At
    scale the export is ``repartitionByRange(shuffle_key) +
    sortWithinPartitions`` (a range shuffle, no global sort gather);
    the query surface returns the first 100 docs of the seed-42
    epoch, which a TakeOrderedAndProject serves without materializing
    the full order."""
    docs = load_tables(spark, sf_dir)["documents"]
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    return keyed.orderBy("shuffle_key", "doc_id").limit(100)


@query(
    "sample_det_hash_fraction",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN md5(concat('ws:', CAST(doc_id AS VARCHAR)))
                              < '1999999999999999999999999999999999'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents
    GROUP BY source
    """,
)
def sample_det_hash_fraction(spark, sf_dir):
    """Deterministic ~10% sample via hash thresholding: a row is in
    the sample iff md5(salt‖doc_id) falls in the first 1/10 of hex
    space (lexicographic compare — portable to any engine with md5,
    unlike rand() or xxhash64). The membership decision is a pure
    function of the row key: stable under repartitioning, engine
    swaps, reruns, and corpus growth (old rows never change fate) —
    the property a reproducible training-data subset needs. Returns
    per-source totals; the sample itself is the same filter without
    the aggregate."""
    docs = load_tables(spark, sf_dir)["documents"]
    in_sample = (
        F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
        < "1999999999999999999999999999999999"
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(in_sample.cast("int")).cast("bigint").alias("n_sampled"),
    )


@query(
    "batch_padding_plan",
    oracle="""
    WITH tok AS (
      SELECT doc_id, LENGTH(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    sorted_b AS (
      SELECT n_tokens,
             CAST((ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) - 1) // 32 AS BIGINT)
               AS batch_id
      FROM tok
    ),
    arrival_b AS (
      SELECT n_tokens,
             CAST((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 32 AS BIGINT)
               AS batch_id
      FROM tok
    ),
    s AS (
      SELECT 'length_sorted' AS strategy,
             CAST(COUNT(DISTINCT batch_id) AS BIGINT) AS n_batches,
             CAST(SUM(pad) AS BIGINT) AS total_padding
      FROM (
        SELECT batch_id,
               MAX(n_tokens) OVER (PARTITION BY batch_id) - n_tokens AS pad
        FROM sorted_b
      ) GROUP BY 1
    ),
    a AS (
      SELECT 'arrival_order' AS strategy,
             CAST(COUNT(DISTINCT batch_id) AS BIGINT) AS n_batches,
             CAST(SUM(pad) AS BIGINT) AS total_padding
      FROM (
        SELECT batch_id,
               MAX(n_tokens) OVER (PARTITION BY batch_id) - n_tokens AS pad
        FROM arrival_b
      ) GROUP BY 1
    )
    SELECT * FROM s UNION ALL SELECT * FROM a
    """,
)
def batch_padding_plan(spark, sf_dir):
    """Inference/training batch packing audit: pad-to-longest waste of
    batch-size-32 batches under length-sorted vs arrival-order
    assignment (length bucketing is why serving stacks sort by
    sequence length — this measures exactly what it saves). No global
    row_number anywhere (the round-5 scale finding):

    - length_sorted is PURE DISTRIBUTION MATH — the sorted sequence
      is determined by the length multiset, a batch's max is the
      length at its last global rank, and the number of full batches
      ending inside a length block is ``cum div 32 − start div 32``,
      so total padding = Σ 32·v·(full batches ending in v's block)
      + (n mod 32)·max_len − total tokens, all over the token-length
      ECDF (`windows.bucketed_cum`, length-domain buckets).
    - arrival_order genuinely needs per-row ranks; doc_id is unique,
      so `windows.dist_rank_unique` ranks inside width-65536 id
      ranges with a two-level bucketed prefix for the offsets, then
      one groupBy(batch_id) computes each batch's max/sum."""
    from elastic_freight_spark.operators.windows import (
        bucketed_cum,
        dist_rank_unique,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )

    counts = (
        tok.groupBy(F.col("n_tokens").cast("bigint").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn("b", F.expr("v div 64"))
    )
    cum = bucketed_cum(counts, "v", "b", ["c"])
    stats = counts.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("bigint").alias("tok_total"),
        F.max("v").alias("vmax"),
    )
    s = (
        cum.join(F.broadcast(stats), F.lit(True), "left")
        .agg(
            F.sum(
                32
                * F.col("v")
                * (
                    F.expr("c_cum div 32")
                    - F.expr("(c_cum - c) div 32")
                )
            ).alias("full_term"),
            F.max("n").alias("n"),
            F.max("tok_total").alias("tok_total"),
            F.max("vmax").alias("vmax"),
        )
        .select(
            F.lit("length_sorted").alias("strategy"),
            F.expr("cast((n + 31) div 32 as bigint)").alias("n_batches"),
            (
                F.col("full_term")
                + F.when(
                    F.expr("n % 32") > 0,
                    F.expr("n % 32") * F.col("vmax"),
                ).otherwise(0)
                - F.col("tok_total")
            )
            .cast("bigint")
            .alias("total_padding"),
        )
    )

    ranked = dist_rank_unique(tok, "doc_id")
    batches = (
        ranked.withColumn("batch_id", F.expr("(rank - 1) div 32"))
        .groupBy("batch_id")
        .agg(
            F.max("n_tokens").alias("mx"),
            F.sum("n_tokens").alias("sm"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    a = batches.agg(
        F.lit("arrival_order").alias("strategy"),
        F.count(F.lit(1)).cast("bigint").alias("n_batches"),
        F.sum(F.col("mx") * F.col("cnt") - F.col("sm"))
        .cast("bigint")
        .alias("total_padding"),
    )
    return s.unionByName(a)


@query(
    "sample_quality_weighted",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             0.1 + 0.8 * LEAST(1.0, n_chars / 500.0) AS weight,
             CAST(concat('0x', substr(md5(concat('qw:', CAST(doc_id AS VARCHAR))), 1, 8))
                  AS BIGINT) / 4294967296.0 AS frac
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CAST(weight AS DECIMAL(18,6))) AS DOUBLE) AS expected_kept,
           CAST(SUM(CASE WHEN frac < weight THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM w
    GROUP BY source
    """,
)
def sample_quality_weighted(spark, sf_dir):
    """Importance sampling by per-document weight (the DCLM-style
    quality-weighted data selection): each document is kept with
    probability equal to its quality weight, decided by a pure
    function of the row key — md5(salt‖doc_id) mapped to a [0,1)
    fraction and compared to the weight. Like
    ``sample_det_hash_fraction`` this is stable under repartitioning,
    reruns, engine swaps, and corpus growth, but the acceptance
    threshold now varies per row, which is what lets a pipeline
    oversample high-quality sources without a separate pass per
    stratum. The weight here is a transparent length proxy
    (0.1 + 0.8·min(1, n_chars/500)); swap in any scored column.

    Portability: the hex→fraction bridge is substr(md5,1,8) parsed
    base-16 on both engines (Spark ``conv``, DuckDB ``'0x…'`` cast) —
    48 remaining md5 hex chars are ignored, 32 bits is plenty for a
    sampling decision. Expected-vs-actual kept counts per source make
    the report self-auditing (LLN: they converge)."""
    docs = load_tables(spark, sf_dir)["documents"]
    weight = F.lit(0.1) + 0.8 * F.least(F.lit(1.0), F.col("n_chars") / 500.0)
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("qw:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    return (
        docs.withColumn("weight", weight)
        .withColumn("frac", frac)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("weight").cast("decimal(18,6)"))
            .cast("double")
            .alias("expected_kept"),
            F.sum((F.col("frac") < F.col("weight")).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


# Deterministic split assignment — ONE fragment shared by the split
# panel and the near-dup leakage audit (a verbatim copy would let the
# two silently diverge on who is in eval).
_SPLIT_SQL = """CASE WHEN md5(concat('split:', CAST(doc_id AS VARCHAR))) < 'e'
                  THEN 'train'
                  WHEN md5(concat('split:', CAST(doc_id AS VARCHAR))) < 'f'
                  THEN 'val'
                  ELSE 'test' END"""


def split_col():
    """Spark twin of _SPLIT_SQL."""
    h = F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    return F.when(h < "e", "train").when(h < "f", "val").otherwise("test")


@query(
    "dataset_split_assignment",
    oracle=f"""
    WITH assigned AS (
      SELECT source, {_SPLIT_SQL} AS split
      FROM documents
    )
    SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM assigned
    GROUP BY source, split
    ORDER BY source, split
    """,
)
def dataset_split_assignment(spark, sf_dir):
    """Deterministic train/val/test split (87.5 / 6.25 / 6.25 via
    md5 hex-prefix ranges — same portable-hash discipline as
    ``sample_det_hash_fraction``): a document's split is a pure
    function of its id, so the assignment is stable under
    repartitioning, reruns, engine swaps, and corpus growth — no
    document ever migrates between train and eval when new data
    lands, which is the property that keeps eval sets uncontaminated
    across dataset versions. Returns the per-source split panel; the
    split itself is the same CASE without the aggregate. One hash
    per row, one uniform-key aggregate — flat at any scale."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.withColumn("split", split_col())
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "split")
    )


@query(
    "source_dataset_card",
    oracle="""
    WITH base AS (
      SELECT source, lang, n_chars,
             CAST(LENGTH(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    lang_counts AS (
      SELECT source, lang, COUNT(*) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY COUNT(*) DESC, lang
             ) AS rn
      FROM base GROUP BY source, lang
    )
    SELECT b.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
           ROUND(AVG(n_tokens), 6) AS avg_tokens,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars), 6)
             AS median_chars,
           CAST(COUNT(DISTINCT b.lang) AS BIGINT) AS n_langs,
           MIN(lc.lang) AS top_lang
    FROM base b
    JOIN lang_counts lc ON lc.source = b.source AND lc.rn = 1
    GROUP BY b.source
    ORDER BY b.source
    """,
)
def source_dataset_card(spark, sf_dir):
    """Per-source "dataset card" panel — the one-screen summary a
    training-data release ships per subset (docs, token mass, length
    profile, language makeup, dominant language). One scan builds
    the per-doc base; a source×lang aggregate (tiny) finds the
    dominant language via deterministic rank (count desc, lang asc);
    the final source-grain aggregate joins it back. All shuffles are
    source- or source×lang-sized."""
    docs = load_tables(spark, sf_dir)["documents"]
    base = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    from pyspark.sql import Window as W

    lang_counts = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("source").orderBy(
                    F.col("n").desc(), F.col("lang").asc_nulls_last()
                )
            ),
        )
    )
    top_lang = lang_counts.filter(F.col("rn") == 1).select(
        "source", F.col("lang").alias("top_lang")
    )
    card = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens_total"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("median_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    return (
        card.join(F.broadcast(top_lang), "source")
        .select(
            "source",
            "n_docs",
            "n_tokens_total",
            "avg_tokens",
            "median_chars",
            "n_langs",
            "top_lang",
        )
        .orderBy("source")
    )


@query(
    "sample_stratified_det",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN md5(concat('strat:', CAST(doc_id AS VARCHAR)))
                              < (CASE WHEN lang = 'en' THEN '4' ELSE 'c' END)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN md5(concat('strat:', CAST(doc_id AS VARCHAR)))
                               < (CASE WHEN lang = 'en' THEN '4' ELSE 'c' END)
                          THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 9)
             AS kept_frac
    FROM documents
    GROUP BY lang
    """,
)
def sample_stratified_det(spark, sf_dir):
    """Deterministic stratified sampling — the hash-checkable twin of
    ``sample_stratified_by_lang`` (which pins Spark's native
    ``sampleBy`` and stays rows-only because its Bernoulli draws are
    engine-private). Per-stratum rates ride the SAME md5-threshold
    membership as ``sample_det_hash_fraction``: keep 25% of the
    dominant 'en' stratum and 75% of every other lang (hex-prefix
    thresholds '4' and 'c'), each row's fate a pure function of its
    id — stable under repartitioning, engine swaps, reruns, corpus
    growth. One scan, one lang-keyed aggregate."""
    docs = load_tables(spark, sf_dir)["documents"]
    h = F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    kept = h < F.when(F.col("lang") == "en", "4").otherwise("c")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
        F.round(
            F.sum(kept.cast("int")) / F.count(F.lit(1)).cast("double"), 9
        ).alias("kept_frac"),
    )


@query(
    "dsir_importance_weights",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    toks2 AS (
      SELECT doc_id, lang, substr(md5(token), 1, 2) AS bucket
      FROM toks WHERE token <> ''
    ),
    tgt AS (
      SELECT bucket, COUNT(*) AS nt FROM toks2 WHERE lang = 'en' GROUP BY 1
    ),
    raw AS (SELECT bucket, COUNT(*) AS nr FROM toks2 GROUP BY 1),
    tot AS (
      SELECT (SELECT SUM(nt) FROM tgt) AS st,
             (SELECT SUM(nr) FROM raw) AS sr
    ),
    db AS (
      SELECT doc_id, bucket, COUNT(*) AS c FROM toks2 GROUP BY 1, 2
    )
    SELECT d.doc_id,
           CAST(SUM(d.c) AS BIGINT) AS n_tokens,
           ROUND(list_reduce(
               list_transform(
                 list_sort(list(struct_pack(
                   k := d.bucket,
                   v := CAST(d.c AS DOUBLE)
                        * ln(((COALESCE(g.nt, 0) + 1)
                              / CAST(st + 256 AS DOUBLE))
                             / ((r.nr + 1)
                                / CAST(sr + 256 AS DOUBLE)))))),
                 x -> x.v),
               (a, b) -> a + b)
                 / SUM(d.c), 9) AS log_importance
    FROM db d
    JOIN raw r USING (bucket)
    LEFT JOIN tgt g USING (bucket)
    CROSS JOIN tot
    GROUP BY d.doc_id
    """,
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR-style importance weights for data selection (Xie et al.,
    "Data Selection for Language Models via Importance Resampling",
    public arXiv 2302.03169): score every raw document by how much
    its hashed-n-gram feature distribution looks like the TARGET
    domain (here: the 'en' stratum) versus the raw corpus —
    log w(x) = mean over tokens of ln(p_target(b)/p_raw(b)) with
    add-one smoothing over 256 md5-prefix buckets. Downstream, keep
    probabilities proportional to exp(log w) resample the corpus
    toward the target (``sample_quality_weighted`` is the kept-side
    mechanism).

    Plan shape: the bucket is a 2-hex-char md5 prefix (portable,
    vocabulary-free, bounded at 256 rows per distribution — the
    hashed-feature trick from the paper that makes the estimator
    corpus-size-independent); both distributions come from ONE token
    scan, ride back as 256-row broadcast joins, and scoring is one
    doc-keyed aggregate. At 100 TB: one text pass, two tiny
    broadcasts, no vocabulary blow-up."""
    docs = load_tables(spark, sf_dir)["documents"]
    toks = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .select(
            "doc_id", "lang", F.substring(F.md5("token"), 1, 2).alias("bucket")
        )
        # referenced by three aggregations (target dist, raw dist,
        # per-doc buckets): unmaterialized, each re-ran the text
        # explode + per-token md5 (round 11) — one checkpointed pass
        .localCheckpoint(eager=True)
    )
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    raw = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("nr"))
    tot = tgt.agg(F.sum("nt").alias("st")).crossJoin(
        raw.agg(F.sum("nr").alias("sr"))
    )
    # round 10: fold c·ln(ratio) over the doc's DISTINCT buckets in
    # bucket order (≤256 terms by construction) — the plain F.sum was
    # an order-unspecified float reduction, the class the salted-100x
    # battery caught flipping ROUND(9) boundaries run-to-run in
    # text_unigram_lm_score.
    db = toks.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    term = F.col("c").cast("double") * F.log(
        ((F.coalesce(F.col("nt"), F.lit(0)) + 1)
         / (F.col("st") + 256).cast("double"))
        / ((F.col("nr") + 1) / (F.col("sr") + 256).cast("double"))
    )
    return (
        db.join(F.broadcast(raw), "bucket")
        .join(F.broadcast(tgt), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.collect_list(
                F.struct(F.col("bucket").alias("k"), term.alias("v"))
            ).alias("terms"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                sorted_fold(F.col("terms")) / F.col("n_tokens"), 9
            ).alias("log_importance"),
        )
    )


@query(
    "dq_documents_constraints",
    oracle="""
    WITH a AS (
      SELECT SUM(CASE WHEN text IS NULL OR trim(text) = ''
                      THEN 1 ELSE 0 END) AS empty_text,
             COUNT(*) - COUNT(DISTINCT doc_id) AS dup_doc_id,
             SUM(CASE WHEN lang NOT IN ('en','de','es','fr','zh')
                       OR lang IS NULL THEN 1 ELSE 0 END) AS bad_lang,
             SUM(CASE WHEN n_chars IS NULL OR n_chars <= 0
                      THEN 1 ELSE 0 END) AS bad_n_chars,
             SUM(CASE WHEN LENGTH(text) <> n_chars
                      THEN 1 ELSE 0 END) AS n_chars_mismatch,
             SUM(CASE WHEN source IS NULL OR source = ''
                      THEN 1 ELSE 0 END) AS missing_source
      FROM documents
    )
    SELECT constraint_name, CAST(violations AS BIGINT) AS violations,
           violations = 0 AS passed
    FROM (
      SELECT 'nonempty_text' AS constraint_name, empty_text AS violations FROM a
      UNION ALL SELECT 'unique_doc_id', dup_doc_id FROM a
      UNION ALL SELECT 'valid_lang', bad_lang FROM a
      UNION ALL SELECT 'positive_n_chars', bad_n_chars FROM a
      UNION ALL SELECT 'n_chars_matches_text', n_chars_mismatch FROM a
      UNION ALL SELECT 'source_present', missing_source FROM a
    )
    """,
)
def dq_documents_constraints(spark, sf_dir):
    """The corpus-ingestion quality gate: the documents-table twin of
    ``dq_orders_constraints`` for the LLM-pipeline path — non-empty
    text, unique doc ids, declared language codes, positive and
    CONSISTENT length metadata (n_chars must equal LENGTH(text): the
    stored-metadata-vs-payload check that catches truncated loads),
    source present. Same one-pass fold: six constraints, one
    map-side-combined aggregate, stack() to the report."""
    docs = load_tables(spark, sf_dir)["documents"]
    empty_text = F.col("text").isNull() | (F.trim("text") == "")
    bad_lang = (
        ~F.col("lang").isin("en", "de", "es", "fr", "zh")
    ) | F.col("lang").isNull()
    return dq_check(
        docs,
        {
            "nonempty_text": F.sum(empty_text.cast("int")),
            "unique_doc_id": F.count(F.lit(1)) - F.countDistinct("doc_id"),
            "valid_lang": F.sum(bad_lang.cast("int")),
            "positive_n_chars": F.sum(
                (F.col("n_chars").isNull() | (F.col("n_chars") <= 0)).cast("int")
            ),
            "n_chars_matches_text": F.sum(
                (F.length("text") != F.col("n_chars")).cast("int")
            ),
            "source_present": F.sum(
                (F.col("source").isNull() | (F.col("source") == "")).cast("int")
            ),
        },
    )


@query(
    "multi_epoch_mixture_schedule",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    epochs AS (SELECT unnest(range(1, 5)) AS epoch),
    sched AS (
      SELECT e.epoch, c.source, c.n,
             POWER(c.n, 1.0 - (e.epoch - 1) * 0.5 / 3) AS w
      FROM counts c CROSS JOIN epochs e
    )
    SELECT epoch, source, CAST(n AS BIGINT) AS n_docs,
           ROUND(1.0 - (epoch - 1) * 0.5 / 3, 9) AS alpha,
           ROUND(w / SUM(w) OVER (PARTITION BY epoch), 9) AS mix_weight
    FROM sched
    """,
)
def multi_epoch_mixture_schedule(spark, sf_dir):
    """Curriculum mixing schedule: per-epoch source sampling weights
    interpolating from the NATURAL distribution (epoch 1, α=1: weight
    ∝ n) to a temperature-flattened one (epoch 4, α=0.5: weight ∝
    √n) — the anneal-toward-parity schedule multilingual/multi-source
    training runs use, extending the single-α
    ``sample_source_mix_plan`` to a whole training plan. Everything
    after the one source-counts aggregate is (sources × epochs)-sized
    arithmetic; the per-epoch normalization window runs on that tiny
    frame."""
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    epochs = spark.range(1, 5).select(F.col("id").cast("int").alias("epoch"))
    alpha = 1.0 - (F.col("epoch") - 1) * 0.5 / 3
    sched = counts.crossJoin(epochs).withColumn(
        "w", F.pow(F.col("n"), alpha)
    )
    return sched.select(
        "epoch",
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(alpha, 9).alias("alpha"),
        F.round(
            F.col("w") / F.sum("w").over(W.partitionBy("epoch")), 9
        ).alias("mix_weight"),
    )


@query(
    "dq_embeddings_constraints",
    oracle="""
    WITH a AS (
      SELECT COUNT(*) - COUNT(DISTINCT vec_id) AS dup_vec_id,
             SUM(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS null_vec,
             SUM(CASE WHEN embedding IS NOT NULL AND len(embedding) <> 64
                      THEN 1 ELSE 0 END) AS bad_dim,
             SUM(CASE WHEN embedding IS NOT NULL AND
                       len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0
                      THEN 1 ELSE 0 END) AS nonfinite,
             SUM(CASE WHEN embedding IS NOT NULL AND
                       list_sum(list_transform(embedding,
                                               x -> CAST(x AS DOUBLE) * x)) = 0
                      THEN 1 ELSE 0 END) AS zero_norm,
             SUM(CASE WHEN label IS NULL THEN 1 ELSE 0 END) AS null_label
      FROM embeddings
    )
    SELECT constraint_name, CAST(violations AS BIGINT) AS violations,
           violations = 0 AS passed
    FROM (
      SELECT 'unique_vec_id' AS constraint_name, dup_vec_id AS violations FROM a
      UNION ALL SELECT 'embedding_present', null_vec FROM a
      UNION ALL SELECT 'dimension_64', bad_dim FROM a
      UNION ALL SELECT 'all_finite', nonfinite FROM a
      UNION ALL SELECT 'nonzero_norm', zero_norm FROM a
      UNION ALL SELECT 'label_present', null_label FROM a
    )
    """,
)
def dq_embeddings_constraints(spark, sf_dir):
    """The vector-table quality gate, completing the DQ family
    (orders, documents, embeddings): unique ids, payload present,
    UNIFORM dimension (a ragged embedding column breaks every
    downstream zip_with), all-finite values (one NaN poisons a whole
    centroid), non-zero norm (unit-normalization would divide by
    zero), label present. Same one-pass fold as the other gates —
    six constraints, one map-side-combined aggregate; the finiteness
    probe is a JVM higher-order ``exists``, so the scan stays
    codegen'd at any corpus size. Zero-norm uses the exact ``== 0.0``
    compare: a sum of squares is exactly 0.0 iff every element is
    ±0.0, so no epsilon is needed (and both engines agree
    bit-exactly)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    nonfinite = F.expr(
        "exists(embedding, x -> isnan(x) OR abs(x) = cast('Infinity' AS FLOAT))"
    )
    zero_norm = (
        F.expr(
            "aggregate(transform(embedding, x -> cast(x as double) * x), "
            "cast(0.0 as double), (acc, v) -> acc + v)"
        )
        == 0.0
    )
    has_vec = F.col("embedding").isNotNull()
    return dq_check(
        emb,
        {
            "unique_vec_id": F.count(F.lit(1)) - F.countDistinct("vec_id"),
            "embedding_present": F.sum((~has_vec).cast("int")),
            "dimension_64": F.sum(
                (has_vec & (F.size("embedding") != 64)).cast("int")
            ),
            "all_finite": F.sum((has_vec & nonfinite).cast("int")),
            "nonzero_norm": F.sum((has_vec & zero_norm).cast("int")),
            "label_present": F.sum(F.col("label").isNull().cast("int")),
        },
    )


EPOCH_SHUFFLE_EPOCHS = 2  # orderings audited side by side
EPOCH_SHUFFLE_SHARDS = 16  # first md5 hex char -> 16-way shard split


@query(
    "epoch_shuffle_plan",
    oracle=f"""
    WITH assigned AS (
      SELECT CAST(e.e AS INTEGER) AS epoch, d.doc_id,
             md5('ep' || CAST(e.e AS VARCHAR) || ':' ||
                 CAST(d.doc_id AS VARCHAR)) AS h
      FROM documents d CROSS JOIN range({EPOCH_SHUFFLE_EPOCHS}) e(e)
    )
    SELECT epoch, substr(h, 1, 1) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(min_by(doc_id, h) AS BIGINT) AS first_doc,
           MIN(h) AS min_hash
    FROM assigned
    GROUP BY epoch, substr(h, 1, 1)
    """,
)
def epoch_shuffle_plan(spark, sf_dir):
    """Deterministic global training-order shuffle: epoch e places
    ``doc_id`` at rank ``md5('ep<e>:' || doc_id)`` and shard =
    first hex char — a full random permutation per epoch that is
    reproducible across runs, engines, and partitionings (no
    ``rand()``, no seed-per-partition coupling), with orderings
    decorrelated BETWEEN epochs because the epoch number is inside
    the hash. This is how a 100 TB corpus gets its per-epoch read
    order: one map pass stamps (shard, rank), one range write per
    epoch materializes it — the shuffle work is a sort by an
    already-uniform key, the best case for Spark's RangePartitioner
    (fences land uniformly; see ``range_partition_boundaries``).

    The audited plan folds each epoch's permutation to its 16 shard
    summaries (count, first document in shuffle order, shard-min
    hash): enough to pin the whole assignment — balance, determinism,
    and epoch decorrelation — in 32 rows. Constant fan-out: the
    explode is EPOCHS×, a fixed multiplier, not data-dependent."""
    docs = load_tables(spark, sf_dir)["documents"]
    assigned = docs.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(e) for e in range(EPOCH_SHUFFLE_EPOCHS)])
        ).alias("epoch"),
    ).withColumn(
        "h",
        F.md5(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ),
    )
    return (
        assigned.groupBy("epoch", F.substring("h", 1, 1).alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min_by("doc_id", "h").cast("bigint").alias("first_doc"),
            F.min("h").alias("min_hash"),
        )
    )


# Temperature-sweep alphas, each an EXACT composition of sqrt (IEEE
# correctly-rounded in both engines, unlike POWER(x, a) in general):
# 1.0 = n, 0.5 = sqrt(n), 0.25 = sqrt(sqrt(n)), 0.75 = sqrt(n)*sqrt(sqrt(n)).
_TEMP_SWEEP_W = (
    ("0.25", "sqrt(sqrt({n}))"),
    ("0.5", "sqrt({n})"),
    ("0.75", "sqrt({n}) * sqrt(sqrt({n}))"),
    ("1.0", "{n}"),
)


def _temp_sweep_sql() -> str:
    arms = "\n      UNION ALL\n".join(
        f"      SELECT {a} AS alpha, lang, n_docs,"
        f" {w.format(n='CAST(n_docs AS DOUBLE)')} AS w FROM counts"
        for a, w in _TEMP_SWEEP_W
    )
    return f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    arms AS (
{arms}
    ),
    tot AS (
      SELECT alpha, SUM(w) AS wsum, SUM(n_docs) AS total
      FROM arms GROUP BY alpha
    )
    SELECT a.alpha, a.lang, CAST(a.n_docs AS BIGINT) AS n_docs,
           ROUND(a.w / t.wsum, 9) AS mix_weight,
           CAST(FLOOR(10000 * a.w / t.wsum) AS BIGINT) AS docs_per_epoch,
           ROUND((a.w / t.wsum)
                 / (a.n_docs / CAST(t.total AS DOUBLE)), 9)
             AS upsample_factor
    FROM arms a JOIN tot t ON t.alpha = a.alpha
    """


@query("sample_temperature_sweep", oracle=_temp_sweep_sql())
def sample_temperature_sweep(spark, sf_dir):
    """The temperature-tuning view of source mixing: the full
    per-language mix table at alpha in {0.25, 0.5, 0.75, 1.0} in one
    result, so choosing the flattening temperature is a data-driven
    read-off (alpha=1 is proportional sampling, lower alpha pulls
    rare languages toward parity) — the same decision-sweep shape as
    `dedup_threshold_sensitivity`. `sample_source_mix_plan` stays the
    single-alpha production plan.

    Portability: every weight is an EXACT composition of sqrt
    (correctly rounded per IEEE in both engines), never POWER(x, a)
    with a fractional exponent whose libm result may differ in the
    last ulp — which is why this sweep can ROUND to 9 while the
    single-alpha plan's POWER-based oracle rounds to 6. The wsum
    normalizer sums ~|langs| doubles inside one group; language
    cardinality is bounded (10 here), so the sum is evaluated in one
    deterministic partial per engine — with a genuinely large
    stratum count, route wsum through DECIMAL like the other
    cross-row float sums.

    Scale shape: one corpus aggregate, then everything is
    |langs|x|alphas|-sized: the 4-arm union, the per-alpha
    normalizers, the broadcast join."""
    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    arms = None
    for a, w in _TEMP_SWEEP_W:
        arm = counts.select(
            F.lit(float(a)).alias("alpha"),
            "lang",
            "n_docs",
            F.expr(w.format(n="CAST(n_docs AS DOUBLE)")).alias("w"),
        )
        arms = arm if arms is None else arms.unionByName(arm)
    tot = arms.groupBy("alpha").agg(
        F.sum("w").alias("wsum"), F.sum("n_docs").alias("total")
    )
    mix = F.col("w") / F.col("wsum")
    share = F.col("n_docs") / F.col("total").cast("double")
    return arms.join(F.broadcast(tot), "alpha").select(
        "alpha",
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(mix, 9).alias("mix_weight"),
        # MUST associate as (10000*w)/wsum — the oracle's left-to-right
        # parse — not 10000*(w/wsum): at alpha=1.0 the weights are
        # integer counts, so (10000*w)/wsum is one correctly-rounded
        # division (EXACT whenever the true ratio is an integer), while
        # w/wsum first rounds the small ratio and 10000*x re-rounds it,
        # landing a hair under integer boundaries and flooring one off
        # (caught by the sf0.001 degenerate sweep: de = 1420000/1000
        # floored to 1419 on this side, 1420 in DuckDB).
        F.floor(F.lit(10000) * F.col("w") / F.col("wsum"))
        .cast("bigint")
        .alias("docs_per_epoch"),
        F.round(mix / share, 9).alias("upsample_factor"),
    )


@query(
    "sample_weighted_reservoir",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             0.1 + 0.8 * LEAST(1.0, n_chars / 500.0) AS weight,
             (CAST(concat('0x', substr(md5(concat('aes:', CAST(doc_id AS VARCHAR))), 1, 8))
                   AS BIGINT) + 0.5) / 4294967296.0 AS frac
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, source, weight,
             -ln(frac) / weight AS arrival
      FROM w
    )
    SELECT source, doc_id, ROUND(arrival, 9) AS arrival
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY arrival, doc_id) AS rn
      FROM keyed
    ) WHERE rn <= 3
    ORDER BY source, arrival, doc_id
    """,
)
def sample_weighted_reservoir(spark, sf_dir):
    """Weighted sampling WITHOUT replacement, k=3 per source stratum,
    by the Efraimidis–Spirakis exponential race: each doc draws
    arrival time -ln(u)/w from a deterministic md5-keyed uniform (the
    repo's portable-PRNG bridge, +0.5 offset so u ∈ (0,1) strictly —
    ln(0) can never fire), and the k earliest arrivals win. Unlike
    ``sample_quality_weighted`` (Bernoulli, random sample SIZE) this
    yields exactly k per stratum with inclusion probability
    proportional to weight — the "pick exactly 10k docs, favor
    quality" selection a curation pipeline actually runs. Stable
    under repartitioning/reruns/engine swaps/corpus growth (a doc's
    arrival never changes; growth only adds competitors). One
    source-keyed window on the doc-sized frame; at scale the same
    race runs as a per-partition top-k + k·|strata| merge, no global
    sort. ln is the IEEE-libm primitive every scoring query here
    already certifies."""
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir)["documents"]
    weight = F.lit(0.1) + 0.8 * F.least(F.lit(1.0), F.col("n_chars") / 500.0)
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("aes:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "source",
        "doc_id",
        (-F.log(frac) / weight).alias("arrival"),
    )
    rn = F.row_number().over(
        W.partitionBy("source").orderBy("arrival", "doc_id")
    )
    return (
        keyed.withColumn("rn", rn)
        .filter(F.col("rn") <= 3)
        .select("source", "doc_id", F.round("arrival", 9).alias("arrival"))
        .orderBy("source", "arrival", "doc_id")
    )


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
    ORDER BY fk_edge
    """,
)
def dq_referential_integrity(spark, sf_dir):
    """Cross-table referential-integrity audit over the star schema —
    the DQ family's missing member (the dq_*_constraints gates are
    single-table): per FK edge, child row count and orphan count
    (children whose key has no parent). Orphans via LEFT ANTI join —
    for the dim-sided edges (part/supplier/nation/customer) the
    parent key set broadcasts, so each check is ONE map-side pass
    over the child table; counts are pure integers. A healthy
    pipeline reports 0 orphans everywhere; after a partial backfill
    or a late-arriving dimension this is the first query to fire."""
    t = load_tables(spark, sf_dir)
    edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for name, child, ck, parent, pk in edges:
        c = t[child].select(F.col(ck).alias("k"))
        p = t[parent].select(F.col(pk).alias("k")).distinct()
        row = (
            c.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
            .crossJoin(
                c.join(F.broadcast(p), "k", "left_anti").agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_orphans")
                )
            )
            .select(F.lit(name).alias("fk_edge"), "n_child", "n_orphans")
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("fk_edge")
