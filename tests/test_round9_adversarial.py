"""Round-9 adversarial pins.

1. The ANOVA ordered-fold NULL-ordering assumption (r8 ADVICE item):
   stats_anova_oneway's one float reduction is an event-type-ORDERED
   left fold — Spark's sort_array is NULLS FIRST by definition, but
   DuckDB's ORDER BY defaults to NULLS LAST, so the fixture's lack of
   NULL event_types was silently load-bearing. The oracle now pins
   NULLS FIRST explicitly; this test manufactures a NULL group whose
   fold position CHANGES the IEEE sum (positive terms ~{1, 1, 1e16}:
   (1+1)+1e16 carries the +2 past the ulp boundary, 1e16+1+1 loses
   both), proving the two engines agree WITH the pin and that the
   un-pinned NULLS LAST order would diverge.
2. decode_avi uint32 width/height int32-overflow degrade (r8 ADVICE
   item) is pinned in tests/test_multimodal.py's corrupt-AVI test.
"""
import math

from elastic_freight_spark import registry

registry.load_all()


def test_anova_fold_order_with_null_event_type(spark, tmp_path):
    """A NULL event_type group must occupy the SAME fold slot in both
    engines (first — sort_array's definition, NULLS FIRST in the
    oracle). Terms are engineered so fold order changes the sum by
    2 ulp at 1e16, so this fails loudly if either side's NULL
    placement regresses."""
    import datetime

    from tests.oracle_util import oracle_df

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    # u_g²/n_g terms: NULL → 1.0, "aa" → 1.0, "mm" → 0.0, "zz" → 1e16;
    # the 2-row "mm" group keeps n > k (ANSI f_stat division needs
    # n - k > 0). NULLS FIRST fold: ((1+1)+0)+1e16 = 1e16 + 2;
    # NULLS LAST fold: ((1+0)+1e16)+1 = 1e16 — both +1 steps vanish
    # below ulp(1e16)/2.
    rows = [
        (1, ts, 10, None, 0.01, "{}"),
        (2, ts, 11, "aa", 0.01, "{}"),
        (3, ts, 12, "mm", 0.0, "{}"),
        (4, ts, 13, "mm", 0.0, "{}"),
        (5, ts, 14, "zz", 1_000_000.00, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    name = "stats_anova_oneway"
    got = registry.QUERIES[name](spark, sf).toPandas()
    want = oracle_df(sf, registry.ORACLE[name])
    assert sorted(got.columns) == sorted(want.columns)
    for c in ("n", "k", "ss_between", "ss_within", "f_stat"):
        assert str(got[c].iloc[0]) == str(want[c].iloc[0]), (
            c, got[c].iloc[0], want[c].iloc[0],
        )

    # Teeth: the NULLS FIRST fold really passed through the ulp
    # boundary (NULL term folded FIRST → 1+1 accumulates before 1e16),
    # and the un-pinned NULLS LAST order lands 2 ulp away.
    assert "NULLS FIRST" in registry.ORACLE[name]
    raw_sql = registry.ORACLE[name].replace(" NULLS FIRST", "")
    raw = oracle_df(sf, raw_sql)
    sp_between = float(got["ss_between"].iloc[0])
    raw_between = float(raw["ss_between"].iloc[0])
    assert sp_between != raw_between
    assert math.isclose(sp_between, raw_between, rel_tol=1e-12)
