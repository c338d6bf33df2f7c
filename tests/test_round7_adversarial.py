"""Round-7 adversarial pins — degenerate regimes found by the first
full sf0.001 oracle sweep (EFS_SF_DIR=/root/testdata/sf0.001
tools/drive_contract.py). One real divergence surfaced:
sample_temperature_sweep's docs_per_epoch floored one off whenever
10000*n_docs/total was an exact integer, because the Spark side
associated 10000*(w/wsum) while the oracle computed (10000*w)/wsum —
one rounding vs two. The fixture here makes EVERY language hit an
exact integer boundary at alpha=1.0, the worst case."""
import pytest

from elastic_freight_spark import registry


@pytest.fixture()
def docs_exact_ratio(spark, tmp_path):
    """1000 documents with integer-permille language shares, so every
    alpha=1.0 arm's 10000*n/total is an exact integer (142 de -> 1420,
    500 en -> 5000, 250 fr -> 2500, 108 ja -> 1080)."""
    rows = []
    did = 0
    for lang, n in (("de", 142), ("en", 500), ("fr", 250), ("ja", 108)):
        for _ in range(n):
            rows.append((did, lang))
            did += 1
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id bigint, lang string").coalesce(
        1
    ).write.parquet(f"{sf}/documents.parquet")
    registry.load_all()
    return sf


def test_temperature_sweep_exact_integer_boundaries(spark, docs_exact_ratio):
    from tests.oracle_util import oracle_df

    sf = docs_exact_ratio
    name = "sample_temperature_sweep"
    got = registry.QUERIES[name](spark, sf).toPandas()
    want = oracle_df(sf, registry.ORACLE[name])
    g = got.sort_values(["alpha", "lang"], ignore_index=True)
    w = want.sort_values(["alpha", "lang"], ignore_index=True)
    assert sorted(g.columns) == sorted(w.columns)
    assert len(g) == len(w) == 16  # 4 alphas x 4 langs
    for c in g.columns:
        assert list(g[c]) == list(w[c]), (c, list(g[c]), list(w[c]))
    # the boundary values themselves: alpha=1.0 is proportional, so
    # docs_per_epoch must be the exact permille*10 counts, not one off
    a1 = {
        r["lang"]: r["docs_per_epoch"]
        for _, r in g[g["alpha"] == 1.0].iterrows()
    }
    assert a1 == {"de": 1420, "en": 5000, "fr": 2500, "ja": 1080}


def test_source_mix_plan_same_tree_on_exact_fixture(spark, docs_exact_ratio):
    """sample_source_mix_plan carries the same (10000*w)/wsum
    association contract (sqrt weights make an exact boundary hit
    unlikely, but the trees must match regardless) — full-column
    equality against its oracle on the integer-permille fixture."""
    from tests.oracle_util import oracle_df

    sf = docs_exact_ratio
    name = "sample_source_mix_plan"
    got = registry.QUERIES[name](spark, sf).toPandas()
    want = oracle_df(sf, registry.ORACLE[name])
    g = got.sort_values(["lang"], ignore_index=True)
    w = want.sort_values(["lang"], ignore_index=True)
    assert sorted(g.columns) == sorted(w.columns)
    assert len(g) == len(w) == 4
    for c in g.columns:
        assert list(g[c]) == list(w[c]), (c, list(g[c]), list(w[c]))


def test_label_centroids_decimal_tie_components(spark, tmp_path):
    """Embedding components that sit EXACTLY on a 1e-9 rounding tie
    (2^-10 = 0.0009765625 -> x1e9 = 976562.5, all values dyadic and
    the products exact): the old CAST(v AS DECIMAL(18,9)) quantization
    left the tie to each engine's decimal-cast rounding mode (Spark
    HALF_UP vs DuckDB round-half-even — the round-7 sf0.1 sweep caught
    a live 4.6e-12 divergence this way); the floor(v*1e9 + 0.5) form
    is three IEEE ops both engines execute identically."""
    from tests.oracle_util import oracle_df

    from elastic_freight_spark import registry

    tie = 2.0**-10  # * 1e9 == 976562.5 exactly
    rows = [
        (1, [tie, -tie, 0.25], 0),
        (2, [tie, tie, -0.5], 0),
        (3, [-tie, 3 * tie, 1.0], 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")
    registry.load_all()
    name = "vector_label_centroids"
    got = registry.QUERIES[name](spark, sf).toPandas()
    want = oracle_df(sf, registry.ORACLE[name])
    g = got.sort_values(["label", "pos"], ignore_index=True)
    w = want.sort_values(["label", "pos"], ignore_index=True)
    assert len(g) == len(w) == 6
    for c in g.columns:
        assert list(g[c]) == list(w[c]), (c, list(g[c]), list(w[c]))
    # and the tie rounded UP by the floor(+0.5) definition on both
    # engines: label 0 pos 1 mean = (tie + tie)/2 with the quantized
    # component being 976563e-9, not 976562e-9
    m = g[(g["label"] == 0) & (g["pos"] == 1)]["mean_val"].iloc[0]
    assert m == 976563e-9 / 1e0  # 0.000976563
