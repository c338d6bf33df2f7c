"""LDJSON ingest tests: schema'd reads, multi-path union, globs,
malformed-row tolerance, blank-line skip, pipe-in-payload regression
(the reference's tuple re-join bug class), end-to-end indexing."""

import json

import pytest
from pyspark.sql import functions as F

from elastic_freight_spark.sources.json_source import (
    infer_json_schema,
    ingest_stats,
    parse_json_column,
    read_json_lines,
    split_corrupt,
)

SCHEMA = (
    "user_id string, org_id string, event_type string, value double, "
    "props string, payload_pipe string"
)


@pytest.fixture(scope="module")
def json_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ldjson")
    rows_a = [
        {
            "user_id": f"u{i}",
            "org_id": f"org{i % 3}",
            "event_type": "click",
            "value": i * 1.5,
            "props": json.dumps({"k": i}),
            # literal pipes — the reference's '|' tuple separator broke on
            # these (BaseESReducer.java:280-282); real columns cannot
            "payload_pipe": f"a|b|{i}|c",
        }
        for i in range(50)
    ]
    rows_b = [
        {
            "user_id": f"v{i}",
            "org_id": "org9",
            "event_type": "view",
            "value": -1.0,
            "props": "{}",
            "payload_pipe": "|||",
        }
        for i in range(20)
    ]
    with open(d / "part-00000.json", "w") as f:
        for r in rows_a:
            f.write(json.dumps(r) + "\n")
    with open(d / "part-00001.json", "w") as f:
        for r in rows_b[:10]:
            f.write(json.dumps(r) + "\n")
        f.write('{"user_id": broken JSON!!\n')  # malformed
        f.write("not json at all\n")  # malformed
        f.write("\n")  # blank — skipped, not corrupt
        for r in rows_b[10:]:
            f.write(json.dumps(r) + "\n")
    return str(d)


def test_read_with_schema_and_corrupt_handling(spark, json_dir):
    df = read_json_lines(spark, f"{json_dir}/part-*.json", schema=SCHEMA)
    assert ingest_stats(df) == {"total": 73, "good": 70, "corrupt": 2, "blank": 1}
    good, bad = split_corrupt(df)
    assert good.count() == 70
    assert bad.count() == 2  # plain column — no corrupt-only plan restriction
    assert good.columns == SCHEMA.replace(" string", "").replace(" double", "").split(", ")


def test_multi_path_pipe_list_union(spark, json_dir):
    # reference CLI style: pipe-separated input paths
    df = read_json_lines(
        spark,
        f"{json_dir}/part-00000.json|{json_dir}/part-00001.json",
        schema=SCHEMA,
    )
    assert df.count() == 73


def test_pipes_in_payload_survive(spark, json_dir):
    good, _ = split_corrupt(read_json_lines(spark, json_dir, schema=SCHEMA))
    row = good.filter(F.col("user_id") == "u7").first()
    assert row["payload_pipe"] == "a|b|7|c"


def test_inferred_schema_sample(spark, json_dir):
    schema = infer_json_schema(spark, f"{json_dir}/part-00000.json")
    assert {f.name for f in schema.fields} >= {"user_id", "org_id", "value"}


def test_nested_json_column_parse(spark, json_dir):
    good, _ = split_corrupt(read_json_lines(spark, json_dir, schema=SCHEMA))
    parsed = parse_json_column(good, "props", "k long")
    assert parsed.filter(F.col("k") == 7).count() == 1


def test_ldjson_to_index_end_to_end(spark, json_dir, tmp_path_factory):
    """The reference's whole job: LDJSON in → sharded parquet index
    out, malformed rows counted not fatal."""
    from elastic_freight_spark.indexer import IndexConfig, build_index, read_index

    raw = read_json_lines(spark, json_dir, schema=SCHEMA)
    good, _ = split_corrupt(raw)
    out = str(tmp_path_factory.mktemp("json_idx"))
    manifest = build_index(
        good,
        IndexConfig(index_name="docs", doc_id_col="user_id", num_shards=4, output_path=out),
    )
    assert manifest["counters"]["index_doc_created"] == 70
    restored = read_index(spark, manifest["path"])
    assert restored.count() == 70
    assert restored.filter(F.col("payload_pipe").contains("|")).count() == 70


# --- format dispatch (S4/S9) and schema files (S8) ------------------------


def test_csv_roundtrip_with_schema(spark, tmp_path_factory):
    from elastic_freight_spark.sources.formats import read_any, write_any

    d = str(tmp_path_factory.mktemp("csvfmt"))
    df = spark.range(100).selectExpr("id", "id * 2 AS dbl", "concat('r', id) AS name")
    write_any(df, d, "csv")
    back = read_any(spark, d, "csv", schema="id long, dbl long, name string")
    assert back.count() == 100
    assert back.orderBy("id").first()["name"] == "r0"


def test_orc_roundtrip_and_pushdown(spark, tmp_path_factory):
    from elastic_freight_spark.plans import assert_pushed_filters
    from elastic_freight_spark.sources.formats import read_any, write_any

    d = str(tmp_path_factory.mktemp("orcfmt"))
    df = spark.range(1000).selectExpr("id", "id % 7 AS bucket")
    write_any(df, d, "orc")
    back = read_any(spark, d, "orc").filter("bucket = 3")
    assert_pushed_filters(back, "EqualTo(bucket,3)")
    assert back.count() == 143


def test_avro_roundtrip_or_clear_gate(spark, tmp_path_factory):
    """Avro resolves to the FQCN when the short name isn't
    service-registered; if the classes are absent entirely the gate
    raises the deploy hint instead of a deep ClassNotFound."""
    from elastic_freight_spark.sources.formats import read_any, write_any

    d = str(tmp_path_factory.mktemp("avrofmt"))
    df = spark.range(50).selectExpr("id", "concat('n', id) AS name")
    try:
        write_any(df, d, "avro")
    except RuntimeError as exc:
        assert "spark-avro" in str(exc)
        return
    back = read_any(spark, d, "avro")
    assert back.count() == 50
    assert back.orderBy("id").first()["name"] == "n0"


def test_schema_file_json_and_ddl(spark, tmp_path_factory):
    from elastic_freight_spark.sources.formats import load_schema_file, save_schema_file

    d = tmp_path_factory.mktemp("schemas")
    events = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    jpath = str(d / "schema.json")
    save_schema_file(events.schema, jpath)
    assert load_schema_file(spark, jpath) == events.schema

    dpath = str(d / "schema.ddl")
    with open(dpath, "w") as f:
        f.write("doc_id BIGINT, text STRING, lang STRING")
    ddl = load_schema_file(spark, dpath)
    assert [f.name for f in ddl.fields] == ["doc_id", "text", "lang"]


def test_map_column_ops_and_parquet_roundtrip(spark, tmp_path_factory):
    """F12 map surface: construction, key/value access, concat,
    parquet round-trip (MapType columns at rest)."""
    from pyspark.sql import functions as F

    df = spark.range(20).select(
        "id",
        F.map_from_arrays(
            F.array(F.lit("a"), F.lit("b")),
            F.array(F.col("id"), F.col("id") * 2),
        ).alias("m"),
    )
    got = df.select(
        "id",
        F.map_keys("m").alias("ks"),
        F.map_values("m").alias("vs"),
        F.element_at("m", "b").alias("b_val"),
        F.map_concat("m", F.create_map(F.lit("c"), F.lit(9))).alias("m2"),
    )
    row = got.orderBy("id").collect()[3]
    assert row["ks"] == ["a", "b"] and row["vs"] == [3, 6]
    assert row["b_val"] == 6 and row["m2"]["c"] == 9

    out = str(tmp_path_factory.mktemp("map_pq"))
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.filter(F.element_at("m", "a") == 7).count() == 1


def test_explode_outer_preserves_empty_arrays(spark):
    """explode vs explode_outer: outer keeps rows whose array is
    empty/null (the fan-out-without-row-loss variant)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)], "id int, xs array<string>"
    )
    assert df.select("id", F.explode("xs")).count() == 2
    outer = df.select("id", F.explode_outer("xs").alias("x"))
    assert outer.count() == 4
    assert outer.filter(F.col("x").isNull()).count() == 2
