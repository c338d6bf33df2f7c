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
