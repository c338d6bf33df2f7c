"""Sampling/profiling operator tests: seed-stable stratified samples,
deterministic content-hash train/test split (stable across
partitionings — the property randomSplit lacks)."""

from pyspark.sql import functions as F

from elastic_freight_spark.operators.sampling import train_test_split
from elastic_freight_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_stratified_sample_seed_stable_and_bounded(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    fr = {lang: 0.4 for lang in langs}
    a = docs.sampleBy("lang", fr, seed=42).count()
    b = docs.sampleBy("lang", fr, seed=42).count()
    assert a == b  # seeded → reproducible in-engine
    total = docs.count()
    assert 0.2 * total < a < 0.6 * total  # loose Chernoff-ish bounds


def test_train_test_split_partitioning_invariant(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    tr1, te1 = train_test_split(docs, (0.8, 0.2))
    tr32, te32 = train_test_split(docs.repartition(32), (0.8, 0.2))
    # same rows land on the same side regardless of partitioning
    assert tr1.select("doc_id").exceptAll(tr32.select("doc_id")).count() == 0
    assert te1.select("doc_id").exceptAll(te32.select("doc_id")).count() == 0
    # disjoint and complete
    assert tr1.count() + te1.count() == docs.count()
    assert tr1.join(te1, "doc_id", "inner").count() == 0
    # ratio in the right neighborhood
    frac = tr1.count() / docs.count()
    assert 0.7 < frac < 0.9


def test_epoch_shuffle_plan_balanced_decorrelated_pinned(spark):
    """Epoch-shuffle contract: 2 epochs x 16 shards, each epoch's
    shard counts sum to the corpus, the shard-min hashes equal a
    hashlib recompute (pinning 'ep<e>:<doc_id>'), and the two epochs
    produce different first-document assignments for most shards —
    the decorrelation a multi-epoch training order exists to provide."""
    import hashlib

    import duckdb

    from elastic_freight_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["epoch_shuffle_plan"](spark, sf).collect()
    assert len(rows) == 32
    doc_ids = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')")
        .fetchall()
    ]
    want = {}
    for e in range(2):
        for d in doc_ids:
            h = hashlib.md5(f"ep{e}:{d}".encode()).hexdigest()
            key = (e, h[0])
            cur = want.get(key)
            if cur is None or h < cur[0]:
                want[key] = (h, d)
    per_epoch_n = {0: 0, 1: 0}
    firsts = {0: {}, 1: {}}
    for r in rows:
        per_epoch_n[r["epoch"]] += r["n_docs"]
        assert (r["min_hash"], r["first_doc"]) == want[(r["epoch"], r["shard"])]
        firsts[r["epoch"]][r["shard"]] = r["first_doc"]
    assert per_epoch_n == {0: len(doc_ids), 1: len(doc_ids)}
    n_diff = sum(1 for s in firsts[0] if firsts[0][s] != firsts[1].get(s))
    assert n_diff >= 12  # epochs must not share an ordering


def test_temperature_sweep_flattens_monotonically(spark):
    """Sweep semantics: alpha=1.0 reproduces proportional sampling
    (mix_weight == corpus share, upsample_factor == 1), and lowering
    alpha monotonically raises the rarest language's upsample factor
    while lowering the most common one's — the flattening the
    temperature knob exists to provide."""
    from elastic_freight_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["sample_temperature_sweep"](spark, sf).collect()
    by_alpha = {}
    for r in rows:
        by_alpha.setdefault(r["alpha"], {})[r["lang"]] = r
    assert set(by_alpha) == {0.25, 0.5, 0.75, 1.0}
    total = sum(r["n_docs"] for r in by_alpha[1.0].values())
    for r in by_alpha[1.0].values():
        assert r["upsample_factor"] == 1.0
        assert abs(r["mix_weight"] - r["n_docs"] / total) < 1e-9
    langs = by_alpha[1.0]
    rare = min(langs, key=lambda k: langs[k]["n_docs"])
    common = max(langs, key=lambda k: langs[k]["n_docs"])
    alphas = [1.0, 0.75, 0.5, 0.25]
    rare_f = [by_alpha[a][rare]["upsample_factor"] for a in alphas]
    common_f = [by_alpha[a][common]["upsample_factor"] for a in alphas]
    assert rare_f == sorted(rare_f)  # rare lang upsampled more
    assert common_f == sorted(common_f, reverse=True)  # head shrinks


def test_sample_weighted_reservoir_matches_python_recompute(spark):
    """Exact recompute of the Efraimidis-Spirakis race: same md5
    bridge, same weights, same top-3-per-source selection."""
    import hashlib
    import math
    from collections import defaultdict

    from elastic_freight_spark import registry
    from elastic_freight_spark.session import load_tables

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["sample_weighted_reservoir"](spark, sf).collect()
    got = defaultdict(list)
    for r in rows:
        got[r["source"]].append((r["doc_id"], r["arrival"]))
    racers = defaultdict(list)
    for row in load_tables(spark, sf)["documents"].collect():
        w = 0.1 + 0.8 * min(1.0, row["n_chars"] / 500.0)
        raw = int(
            hashlib.md5(f"aes:{row['doc_id']}".encode()).hexdigest()[:8], 16
        )
        u = (raw + 0.5) / 4294967296.0
        racers[row["source"]].append((-math.log(u) / w, row["doc_id"]))
    for src, lst in racers.items():
        want = sorted(lst)[:3]
        assert [d for _, d in want] == [d for d, _ in got[src]]
        for (wa, _), (_, ga) in zip(want, got[src]):
            assert abs(round(wa, 9) - ga) < 1e-9
    assert set(got) == set(racers)


def test_dq_referential_integrity_clean_and_injected_orphans(spark, tmp_path):
    """On the generated star schema every FK edge must report zero
    orphans; on a synthetic dir with deliberate breaks, each edge
    counts exactly its injected orphans (key-only tables are enough —
    the query reads nothing but the key columns)."""
    from elastic_freight_spark import registry

    registry.load_all()
    rows = registry.QUERIES["dq_referential_integrity"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 5
    assert all(r["n_orphans"] == 0 for r in rows)
    assert all(r["n_child"] > 0 for r in rows)

    sf = str(tmp_path)

    def w(name, schema, data):
        spark.createDataFrame(data, schema).coalesce(1).write.parquet(
            f"{sf}/{name}.parquet"
        )

    w("lineitem", "l_orderkey long, l_partkey long, l_suppkey long",
      [(1, 10, 100), (2, 11, 100), (99, 10, 999)])  # orderkey 99 + supp 999 orphaned
    w("orders", "o_orderkey long, o_custkey long", [(1, 7), (2, 8)])  # cust 8 orphaned
    w("customer", "c_custkey long, c_nationkey long", [(7, 0), (9, 5)])  # nation 5 orphaned
    w("part", "p_partkey long", [(10,), (11,)])
    w("supplier", "s_suppkey long", [(100,)])
    w("nation", "n_nationkey long", [(0,)])
    got = {
        r["fk_edge"]: (r["n_child"], r["n_orphans"])
        for r in registry.QUERIES["dq_referential_integrity"](
            spark, sf
        ).collect()
    }
    assert got == {
        "lineitem.l_orderkey->orders": (3, 1),
        "orders.o_custkey->customer": (2, 1),
        "lineitem.l_partkey->part": (3, 0),
        "lineitem.l_suppkey->supplier": (3, 1),
        "customer.c_nationkey->nation": (2, 1),
    }
