"""Round-8 adversarial pins — the systematized tie-hunt (round-7
verdict task 3). Both round-7 bugs were cross-engine rounding ties on
shared numeric bridges, so this file pins each numeric-bridge FAMILY
at its tie boundary instead of waiting for a sweep to trip over the
next instance:

1. ROUND(double, 9) at dyadic half-way points — engines AGREE
   (both round the scaled double half away from zero); pinned so a
   future engine upgrade that changes either side fails loudly here.
2. CAST(double AS DECIMAL(18,9)) at the same ties — engines AGREE.
3. DECIMAL → lower-scale DECIMAL casts — engines DIVERGE (Spark
   HALF_UP, DuckDB truncates toward zero), at ANY value with digits
   beyond the target scale, not just ties. The primitive is BANNED
   from oracle-paired paths; this test is the documentation.
4. Negative zero: DuckDB ROUND(double) preserves IEEE sign-of-zero
   (-1e-12 -> "-0.0" in the to_csv hash) while Spark's BigDecimal
   round has no signed zero ("0.0"). registry.query() closes the
   family by wrapping every oracle ROUND call as (ROUND(...) + 0);
   pinned at the primitive level AND end-to-end through a registered
   query on a crafted tiny-negative-delta fixture.
5. vector_label_centroids' sum(BIGINT) overflow envelope (round-7
   advisor): Spark's non-ANSI sum wraps while DuckDB promotes to
   HUGEINT, so the bridge is exact only below ~9.2e9 unit-normalized
   rows per (label,pos); the envelope arithmetic is pinned so the
   bound stays visible.
"""
import duckdb
import pytest

from elastic_freight_spark import registry
from elastic_freight_spark.registry import _normalize_round_zero_sign

# Dyadic doubles whose *1e9 scaling is an exact .5 (p odd, k=10:
# p * 2**-10 * 1e9 = p * 976562.5), plus coarse-grain .5 ties.
DYADIC_TIES = [
    2.0**-10,
    -(2.0**-10),
    3 * 2.0**-10,
    -(3 * 2.0**-10),
    5 * 2.0**-10,
    0.5,
    1.5,
    2.5,
    -0.5,
    -1.5,
    -2.5,
]


def _duck_one(expr, v):
    return duckdb.sql(
        f"SELECT {expr.format(v=repr(v))} AS x"
    ).fetchone()[0]


def test_round9_dyadic_ties_cross_engine(spark):
    """Family 1: ROUND(double, 9) at exact binary half-way points must
    agree between Spark and DuckDB (both half-away-from-zero on the
    scaled double)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in DYADIC_TIES], "v double")
    got = {
        r.v: r.r
        for r in df.select("v", F.round("v", 9).alias("r")).collect()
    }
    for v in DYADIC_TIES:
        want = _duck_one("ROUND(CAST({v} AS DOUBLE), 9)", v)
        assert got[v] == want, (v, got[v], want)


def test_double_to_decimal_quantize_ties_cross_engine(spark):
    """Family 2: CAST(double AS DECIMAL(18,9)) at the same dyadic
    ties must agree (both engines round the scaled value half away
    from zero at these magnitudes — the round-7 centroid fix removed
    the one site that did NOT hold, at sf0.1-only inputs; the plain
    cast of these ties is pinned stable here)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in DYADIC_TIES], "v double")
    got = {
        r.v: str(r.d)
        for r in df.select(
            "v", F.col("v").cast("decimal(18,9)").alias("d")
        ).collect()
    }
    for v in DYADIC_TIES:
        want = str(_duck_one("CAST(CAST({v} AS DOUBLE) AS DECIMAL(18,9))", v))
        assert got[v] == want, (v, got[v], want)


def test_double_to_decimal_ties_agree_at_every_coarse_scale(spark):
    """Family 2 completion: the half-away tie agreement holds at every
    int64-backed scale the money tier uses (2, 4, 6) and at scale 9 —
    the divergence starts exactly at scale 10 (int128 path, pinned
    below). Ties constructed per scale s as odd multiples of
    2^-(s_bits) where v*10^s is an exact .5."""
    from pyspark.sql import functions as F

    per_scale = {
        2: [5 * 2.0**-3, -5 * 2.0**-3, 3 * 2.0**-3],
        4: [5 * 2.0**-5, -5 * 2.0**-5, 7 * 2.0**-5],
        6: [5 * 2.0**-7, -5 * 2.0**-7, 11 * 2.0**-7],
        9: [2.0**-10, -(2.0**-10), 3 * 2.0**-10],
    }
    for s, vals in per_scale.items():
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = {
            r.v: str(r.d)
            for r in df.select(
                "v", F.col("v").cast(f"decimal(18,{s})").alias("d")
            ).collect()
        }
        for v in vals:
            assert (v * 10**s) % 1 == 0.5, (s, v)  # really a tie
            want = str(
                _duck_one(
                    "CAST(CAST({v} AS DOUBLE) AS DECIMAL(18,%d))" % s, v
                )
            )
            assert got[v] == want, (s, v, got[v], want)


def test_round_normalizer_is_idempotent():
    """Double-normalization must not stack '+ 0' wrappers — a future
    caller passing already-registered oracle text back through
    query() would otherwise grow the SQL on every pass."""
    cases = [
        "SELECT ROUND(x, 9) AS r FROM t",
        "SELECT ROUND(ROUND(x,4), 2)",
        "SELECT LENGTH('ROUND(') + ROUND(x,1)",
        "SELECT ROUND(a / NULLIF(b,0), 9) FROM t ORDER BY ROUND(a, 2)",
    ]
    for src in cases:
        once = _normalize_round_zero_sign(src)
        assert _normalize_round_zero_sign(once) == once, src


def test_decimal_scale_down_cast_diverges_and_is_banned(spark):
    """Family 3: DECIMAL(18,4) -> DECIMAL(18,2) rounds HALF_UP in
    Spark but TRUNCATES toward zero in DuckDB — divergent at any
    value with nonzero digits beyond the target scale (1.019 -> 1.02
    vs 1.01), not just ties. No oracle-paired bridge may reduce a
    decimal's scale; quantize the DOUBLE once at the final scale
    instead (the centroid floor(v*1e9 + 0.5) pattern). This test
    documents the ban by proving the divergence."""
    from pyspark.sql import functions as F

    vals = ["1.005", "1.015", "1.019", "2.675", "-1.005"]
    df = spark.createDataFrame([(s,) for s in vals], "s string")
    spark_down = {
        r.s: str(r.d)
        for r in df.select(
            "s",
            F.col("s")
            .cast("decimal(18,4)")
            .cast("decimal(18,2)")
            .alias("d"),
        ).collect()
    }
    duck_down = {
        s: str(
            duckdb.sql(
                f"SELECT CAST(CAST('{s}' AS DECIMAL(18,4)) AS DECIMAL(18,2))"
            ).fetchone()[0]
        )
        for s in vals
    }
    # Spark HALF_UP
    assert spark_down == {
        "1.005": "1.01",
        "1.015": "1.02",
        "1.019": "1.02",
        "2.675": "2.68",
        "-1.005": "-1.01",
    }
    # DuckDB truncation toward zero
    assert duck_down == {
        "1.005": "1.00",
        "1.015": "1.01",
        "1.019": "1.01",
        "2.675": "2.67",
        "-1.005": "-1.00",
    }
    assert all(spark_down[s] != duck_down[s] for s in vals)


def test_negative_zero_round_primitive(spark):
    """Family 4, primitive level: DuckDB ROUND keeps IEEE -0.0 (which
    to_csv renders '-0.0'), Spark's BigDecimal round cannot; integer
    + 0 normalizes DuckDB's to +0.0. This asymmetry is why
    registry.query() wraps every oracle ROUND as (ROUND(...) + 0)."""
    from pyspark.sql import functions as F

    raw, plus0 = duckdb.sql(
        "SELECT ROUND(-1e-12, 9), ROUND(-1e-12, 9) + 0"
    ).fetchone()
    assert str(raw) == "-0.0"
    assert str(plus0) == "0.0"
    sp = (
        spark.createDataFrame([(-1e-12,)], "v double")
        .select(F.round("v", 9).alias("r"))
        .collect()[0]
        .r
    )
    assert str(sp) == "0.0"


def test_round_normalizer_rewrites_calls_only():
    """The registration-time rewriter wraps every ROUND CALL —
    including nested ones and calls after paren-bearing string
    literals — and never touches bare `round` identifiers (the
    graph_kcore_peel output column)."""
    cases = [
        ("SELECT ROUND(x, 9) AS r", "SELECT (ROUND(x, 9) + 0) AS r"),
        (
            "SELECT ROUND(ROUND(x,4), 2)",
            "SELECT (ROUND((ROUND(x,4) + 0), 2) + 0)",
        ),
        (
            "SELECT 1 AS round, r ORDER BY round",
            "SELECT 1 AS round, r ORDER BY round",
        ),
        (
            "SELECT ROUND(REPLACE(s, '(', ')') :: DOUBLE, 2)",
            "SELECT (ROUND(REPLACE(s, '(', ')') :: DOUBLE, 2) + 0)",
        ),
        (
            "SELECT LENGTH('ROUND(') + ROUND(x,1)",
            "SELECT LENGTH('ROUND(') + (ROUND(x,1) + 0)",
        ),
        ("SELECT xround(x,1)", "SELECT xround(x,1)"),
    ]
    for src, want in cases:
        assert _normalize_round_zero_sign(src) == want, src
    # and the live registry carries only normalized ROUND calls
    import re

    registry.load_all()
    for name, sql in registry.ORACLE.items():
        for m in re.finditer(r"\bROUND\s*\(", sql, flags=re.I):
            assert sql[m.start() - 1] == "(", (
                f"{name}: un-normalized ROUND at offset {m.start()}"
            )


def test_negative_zero_end_to_end_lag_delta(spark, tmp_path):
    """Family 4, end-to-end: two consecutive orders whose totalprice
    differs by -2^-40 (~ -9.1e-13, exactly representable so both
    engines compute the identical double). ROUND(delta, 4) is -0.0 in
    raw DuckDB and +0.0 in Spark — '-0.0' vs '0.0' under the driver's
    to_csv hash — so this test fails if the (ROUND(...) + 0) oracle
    normalization ever regresses."""
    import datetime

    from tests.oracle_util import oracle_df

    tiny = 2.0**-40
    rows = [
        (1, 101, 1000.0, datetime.date(1995, 1, 1)),
        (1, 102, 1000.0 - tiny, datetime.date(1995, 2, 1)),
        (2, 201, 500.0, datetime.date(1995, 1, 15)),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "o_custkey bigint, o_orderkey bigint, o_totalprice double,"
        " o_orderdate date",
    ).coalesce(1).write.parquet(f"{sf}/orders.parquet")
    registry.load_all()
    name = "w_lag_lead_price_delta"
    got = (
        registry.QUERIES[name](spark, sf)
        .toPandas()
        .sort_values(["o_custkey", "o_orderkey"], ignore_index=True)
    )
    want = oracle_df(sf, registry.ORACLE[name]).sort_values(
        ["o_custkey", "o_orderkey"], ignore_index=True
    )
    assert sorted(got.columns) == sorted(want.columns)
    d_spark = got["delta"].map(str).tolist()
    d_duck = want["delta"].map(str).tolist()
    assert d_spark == d_duck, (d_spark, d_duck)
    # the crafted row really hit the tiny-negative branch and both
    # sides rendered POSITIVE zero
    assert d_spark[1] == "0.0"
    # and the raw (un-normalized) oracle would have diverged — the pin
    # has teeth
    import re

    raw_sql = re.sub(
        r"\((ROUND\()", r"\1", registry.ORACLE[name], flags=re.I
    ).replace(") + 0)", ")", 1)
    raw = oracle_df(sf, raw_sql).sort_values(
        ["o_custkey", "o_orderkey"], ignore_index=True
    )
    assert str(raw["delta"].iloc[1]) == "-0.0"


def test_label_centroids_bigint_overflow_envelope(spark, tmp_path):
    """Family 5 (round-7 advisor): the centroid bridge sums
    floor(v*1e9 + 0.5) as BIGINT. Spark's non-ANSI sum(long) WRAPS
    silently on overflow while DuckDB promotes to HUGEINT, so the
    bridge is exact only while rows_per_label * max|v| * 1e9 < 2^63.
    Pin the envelope arithmetic and prove the quantized terms on the
    real test corpus sit far inside it."""
    from pyspark.sql import functions as F

    # envelope: unit-normalized embeddings (|v| <= 1) keep the bridge
    # exact up to ~9.2e9 rows per label
    assert int(2**63 / 1e9) == 9_223_372_036
    # worst-case quantized term magnitude on the real sf0.001 corpus
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    n_rows = emb.count()
    mx = (
        emb.select(F.explode("embedding").alias("v"))
        .agg(F.max(F.abs(F.col("v").cast("double"))).alias("mx"))
        .collect()[0]
        .mx
    )
    term_bound = int(mx * 1e9) + 1
    # a (label,pos) group has at most n_rows terms; the BIGINT sum can
    # only wrap once group size reaches 2^63/term_bound rows — assert
    # at least four orders of magnitude of headroom on this corpus
    assert 2**63 // term_bound > n_rows * 10**4, (term_bound, n_rows)


def test_double_to_decimal_scale10plus_ties_diverge(spark):
    """Family 2b (the round-8 primitive finding that drove the
    floor-form conversions): double -> DECIMAL casts at scale >= 10
    land on DuckDB's int128 path, which rounds exact .5 ties HALF-EVEN
    while Spark's BigDecimal cast is HALF_UP at every scale — so
    2^-13 (x1e12 = ...312.5) quantizes to ...313 in Spark and ...312
    in DuckDB. scale <= 9 agrees (both half-away; pinned above). If
    an engine upgrade makes this test fail, re-evaluate the oracle
    lint below before relaxing anything."""
    from pyspark.sql import functions as F

    t13 = 2.0**-13
    sp = str(
        spark.createDataFrame([(t13,)], "v double")
        .select(F.col("v").cast("decimal(24,12)").alias("d"))
        .collect()[0]
        .d
    )
    du = str(
        duckdb.sql(
            f"SELECT CAST(CAST({t13!r} AS DOUBLE) AS DECIMAL(24,12))"
        ).fetchone()[0]
    )
    assert sp == "0.000122070313"  # HALF_UP
    assert du == "0.000122070312"  # half-even
    assert sp != du


def test_no_oracle_casts_to_decimal_scale10plus():
    """Lint: after the round-8 conversions (vector_norm_outliers,
    embedding_int8_quantize, embedding_variance_profile,
    supplier_herfindahl -> exact floor(v*10^s + 0.5) BIGINT bridges),
    NO oracle may cast to a DECIMAL with scale >= 10 — that cast is
    cross-engine divergent at ties (test above) and, past 2^53 of
    scaled magnitude, at every value. Quantize the double once with
    the floor form instead (the vector_label_centroids pattern)."""
    import re

    registry.load_all()
    offenders = [
        (name, m.group(0))
        for name, sql in registry.ORACLE.items()
        for m in re.finditer(r"DECIMAL\(\s*\d+\s*,\s*(\d+)\s*\)", sql, re.I)
        if int(m.group(1)) >= 10
    ]
    assert offenders == [], offenders


def test_variance_profile_exact_on_tie_components(spark, tmp_path):
    """End-to-end: embeddings whose components sit exactly on the
    1e-10 quantization tie (5*2^-11 -> x1e10 = 24414062.5, dyadic so
    both engines compute the identical double). The pre-round-8
    DECIMAL(24,10) bridge left that .5 to divergent cast rounding;
    the floor(v*1e10 + 0.5) form is pinned here to full-column
    equality against the oracle."""
    from tests.oracle_util import oracle_df

    tie = 5 * 2.0**-11
    rows = [
        (1, [tie, -tie, 0.125], 0),
        (2, [tie, 3 * tie, -0.25], 0),
        (3, [-tie, tie, 0.5], 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")
    registry.load_all()
    name = "embedding_variance_profile"
    got = (
        registry.QUERIES[name](spark, sf)
        .toPandas()
        .sort_values(["dim"], ignore_index=True)
    )
    want = oracle_df(sf, registry.ORACLE[name]).sort_values(
        ["dim"], ignore_index=True
    )
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want) == 3
    for c in got.columns:
        assert list(got[c].map(str)) == list(want[c].map(str)), c
    # dim 0's mean really crossed the quantization tie: terms
    # (tie, tie, -tie) quantize to (24414063, 24414063, -24414062)
    # exactly under floor(+0.5) on BOTH engines
    assert got["mean_x"][0] == round((24414063 + 24414063 - 24414062) / 3e10, 9)


# Unrounded float64 oracle columns that are ALLOWED: each is a SINGLE
# IEEE double operation (almost always one division) applied to
# operands both engines derive exactly (DECIMAL sums, integer counts,
# integer set sizes), so the result is bit-identical by IEEE-754
# determinism without a ROUND grain. Anything NOT in this list must
# either ROUND(...,9) on both sides or earn an entry here with the
# same argument. (query, column) -> why.
_UNROUNDED_FLOAT_ALLOW = {
    # exact-BIGINT quantized sum / 1e9 / count — the r7 centroid form
    ("vector_label_centroids", "mean_val"): "bigint_sum/1e9/count",
    # integer intersection / integer union (set sizes)
    ("neardup_ngram_jaccard", "jaccard"): "int/int",
    ("neardup_ngram_jaccard_uncapped_audit", "jaccard"): "int/int",
    ("neardup_containment", "contain_a"): "int/int",
    ("neardup_containment", "contain_b"): "int/int",
    # DECIMAL-exact sum cast to double / integer count (TPC-H avgs)
    ("q1_pricing_summary", "avg_qty"): "decimal_sum/count",
    ("q1_pricing_summary", "avg_price"): "decimal_sum/count",
    ("q1_pricing_summary", "avg_disc"): "decimal_sum/count",
    ("q17_small_quantity_revenue", "avg_yearly"): "decimal_sum/const",
    ("q2_min_cost_supplier", "unit_cost"): "decimal/decimal",
    ("q8_market_share", "mkt_share"): "decimal/decimal",
    ("q14_promo_revenue", "promo_share"): "decimal/decimal",
    # fixed-order IEEE tree over int64-derived operands (the 100x
    # finding: ROUND(x,6) itself diverges past |x|*1e6 > 2^53, while
    # the unrounded fixed tree is bit-identical — see stats_anova)
    ("stats_anova_oneway", "ss_between"): "fixed_tree_int64_operands",
    ("stats_anova_oneway", "ss_within"): "fixed_tree_int64_operands",
    ("stats_anova_oneway", "f_stat"): "fixed_tree_int64_operands",
    ("agg_multi_measure", "avg_price"): "decimal_sum/count",
    ("agg_weighted_avg", "wavg_price"): "decimal_sum/decimal_sum",
    # integer character counts / integer length
    ("text_quality_scores", "space_ratio"): "int/int",
    # greatest/least of literal-derived doubles (no accumulation)
    ("f_greatest_least_bits", "g"): "pure_literal_expr",
    ("f_greatest_least_bits", "l"): "pure_literal_expr",
}


def test_unrounded_float_oracle_columns_are_allowlisted():
    """Sweeping audit (round 8): every float64 column an oracle emits
    must be ROUND(...,9)-quantized — the CLAUDE.md float-output
    discipline — unless it is allowlisted above as a single IEEE
    operation on engine-identical exact operands. Catches a future
    oracle leaking an unguarded float accumulation into the value
    hash. Runs all 282 oracles on DuckDB at sf0.001."""
    import os

    import duckdb

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings"
    ).split():
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    offenders = []
    for name, sql in registry.ORACLE.items():
        df = con.execute(sql).df()
        for c in df.columns:
            if df[c].dtype != "float64":
                continue
            vals = df[c].dropna()
            if len(vals) and not all(x == round(x, 9) for x in vals):
                if (name, c) not in _UNROUNDED_FLOAT_ALLOW:
                    offenders.append((name, c, [x for x in vals][:2]))
    assert offenders == [], offenders
    # and the allowlist carries no stale entries for renamed queries
    stale = [
        (q, c)
        for q, c in _UNROUNDED_FLOAT_ALLOW
        if q not in registry.ORACLE
    ]
    assert stale == [], stale


def test_money_and_value_columns_are_two_decimal_grid():
    """Data canary (round 8): the quantization-tie analysis rests on
    every raw money/value double sitting EXACTLY on the 2-decimal
    grid — scaled by 10^s (s >= 2) such values land on integers,
    never near a .5 cast tie, which is why the wide money-tier
    DECIMAL(18,2/4/6) bridges are tie-free BY DATA (computed ratios /
    embedding components, which are NOT grid-aligned, use ROUND(9) or
    the exact floor form instead). If the driver ever regenerates
    testdata with full-mantissa doubles, this fails and points at the
    analysis to redo — the test_ntz_timestamps pattern for a
    different regen hazard."""
    import duckdb

    for sf in ("sf0.001", "sf0.01"):
        n_off = duckdb.sql(
            f"""
            SELECT
              (SELECT COUNT(*) FILTER (value != ROUND(value, 2))
               FROM read_parquet('/root/testdata/{sf}/events.parquet'))
            + (SELECT COUNT(*) FILTER (l_extendedprice != ROUND(l_extendedprice, 2))
               FROM read_parquet('/root/testdata/{sf}/lineitem.parquet'))
            + (SELECT COUNT(*) FILTER (o_totalprice != ROUND(o_totalprice, 2))
               FROM read_parquet('/root/testdata/{sf}/orders.parquet'))
            + (SELECT COUNT(*) FILTER (s_acctbal != ROUND(s_acctbal, 2))
               FROM read_parquet('/root/testdata/{sf}/supplier.parquet'))
            + (SELECT COUNT(*) FILTER (c_acctbal != ROUND(c_acctbal, 2))
               FROM read_parquet('/root/testdata/{sf}/customer.parquet'))
            """
        ).fetchone()[0]
        assert n_off == 0, (sf, n_off)


# --- round-8 continuation: findings from the 10x-replica oracle sweep -------
#
# Running the FULL oracle contract against the 10x offset-key replica
# (tools/replicate_10x.py; EFS_DRIVER_MEM for the bigger heap) caught
# three divergences invisible at every driver scale:
#   1. max_by/min_by argmax ties — replicated rows manufacture exact
#      o_totalprice ties and the two engines picked different keys;
#   2. dsum(scale=6) totals past 2^53 scaled units — the final
#      DECIMAL->DOUBLE cast is correctly rounded in Java but composes
#      two roundings in DuckDB's int128 path (1-ULP splits on
#      q1 sum_charge);
#   3. stats_anova_oneway's order-unspecified 5-term float reduction
#      drifting past ROUND(6) under between-groups cancellation.
# The fixes: unique packed argmax keys, dsum_cents (BIGINT cents;
# int64->double conversions are HARDWARE-rounded, hence identical),
# and the ordered-fold exact-moment ANOVA. These tests pin each class
# with manufactured ties/magnitudes, so the pins run at suite scale.


def test_argmax_packed_key_tie_breaks_agree_across_engines(spark):
    """Exact price ties (the replica scenario) must resolve to the
    SAME orderkey in both engines: smallest key among max-price rows,
    smallest key among min-price rows — via the unique packed key
    cents*2^37 +/- key that agg_max_by_min_by uses."""
    import duckdb

    from pyspark.sql import functions as F

    rows = [
        # status, orderkey, totalprice — two max-ties and two min-ties
        ("F", 101, 499.99), ("F", 7, 499.99), ("F", 55, 1.01),
        ("F", 3, 1.01), ("F", 40, 250.00),
        ("O", 9, 10.00), ("O", 2, 10.00),
    ]
    sdf = spark.createDataFrame(rows, "o_orderstatus string, o_orderkey long, o_totalprice double")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    got = {
        r["o_orderstatus"]: (r["big"], r["small"])
        for r in sdf.groupBy("o_orderstatus")
        .agg(
            F.max_by(
                "o_orderkey",
                cents * F.lit(137438953472) + (F.lit(137438953471) - F.col("o_orderkey")),
            ).alias("big"),
            F.min_by(
                "o_orderkey", cents * F.lit(137438953472) + F.col("o_orderkey")
            ).alias("small"),
        )
        .collect()
    }
    assert got == {"F": (7, 3), "O": (2, 2)}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE o(o_orderstatus VARCHAR, o_orderkey BIGINT, o_totalprice DOUBLE)"
    )
    con.executemany("INSERT INTO o VALUES (?, ?, ?)", rows)
    want = {
        s: (b, m)
        for s, b, m in con.execute(
            """
            SELECT o_orderstatus,
                   arg_max(o_orderkey,
                           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 137438953472
                           + (137438953471 - o_orderkey)),
                   arg_min(o_orderkey,
                           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 137438953472
                           + o_orderkey)
            FROM o GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want


def test_dsum_cents_exact_past_decimal_double_envelope(spark):
    """A money total past dsum(scale=6)'s engine-exact envelope
    (|total|*10^6 > 2^53, i.e. > ~$9B) must still hash-agree through
    dsum_cents: BIGINT cents sum (exact, order-free), one division.
    Pins Spark == DuckDB == python exact recompute, including sub-cent
    residuals (x.yyyyyy values) and a negative row."""
    import duckdb

    from elastic_freight_spark.functions import dsum_cents, sql_dsum_cents

    # 4000 rows of ~ $9.2M each with 6-decimal residuals -> total
    # ~ $3.7e10, scaled 3.7e16 > 2^53 (the scale-6 danger zone), while
    # cents total 3.7e12 stays far inside 2^53.
    vals = [9_200_000.0 + i / 64.0 + 0.000625 * (i % 7) for i in range(4000)]
    vals.append(-123_456.789125)
    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    got = sdf.agg(dsum_cents("v", "total")).first()["total"]
    total_scaled = sum(abs(v) for v in vals) * 1e6
    assert total_scaled > 2**53  # really outside the old envelope
    import math

    py = sum(math.floor(v * 100 + 0.5) for v in vals) / 100.0
    assert got == py
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(f"SELECT {sql_dsum_cents('v', 'total')} FROM t").fetchone()[0]
    assert got == want


def test_anova_ordered_fold_matches_oracle_on_skewed_magnitudes(spark):
    """The ANOVA rewrite's one float reduction (five u_g^2/n_g terms)
    folds in event-type order on BOTH sides; with group magnitudes
    spread over 6 decades (worst case for fold-order sensitivity) the
    engines must agree bit-for-bit after ROUND(6). Runs the same
    manufactured frame through the Spark plan fragment and the oracle
    fragment."""
    import duckdb

    from pyspark.sql import functions as F

    rows = []
    for t_name, scale_v, n in [
        ("click", 0.01, 400), ("error", 490.02, 400), ("purchase", 12.34, 50),
        ("signup", 333.33, 3), ("view", 0.05, 1000),
    ]:
        rows += [(t_name, scale_v + (i % 3) * 0.01) for i in range(n)]
    sdf = spark.createDataFrame(rows, "event_type string, value double")
    g = sdf.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("u_g"),
    )
    term = (
        F.col("u_g").cast("double")
        * F.col("u_g").cast("double")
        / F.col("n_g").cast("double")
    )
    got = (
        g.agg(
            F.collect_list(
                F.struct(F.col("event_type").alias("t"), term.alias("v"))
            ).alias("terms")
        )
        .select(
            F.aggregate(
                F.sort_array(F.col("terms")), F.lit(0.0), lambda a, x: a + x["v"]
            ).alias("sqn4")
        )
        .first()["sqn4"]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e(event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO e VALUES (?, ?)", rows)
    want = con.execute(
        """
        WITH g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS u_g
          FROM e GROUP BY 1
        )
        SELECT list_reduce(
                 list(CAST(u_g AS DOUBLE) * CAST(u_g AS DOUBLE)
                      / CAST(n_g AS DOUBLE) ORDER BY event_type),
                 (a, b) -> a + b) FROM g
        """
    ).fetchone()[0]
    assert got == want  # bit-identical, not approximately equal
