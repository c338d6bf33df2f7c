"""Multimodal-column tests (SURVEY.md §2.12 X6): binary payload
schema, Arrow mapInPandas decode/resize/frame-sample plumbing, and
parquet round-trip of binary + struct metadata columns."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructType

from elastic_freight_spark.operators.multimodal import (
    attach_media,
    decode_media,
    resize_images,
    sample_frames,
)
from elastic_freight_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return attach_media(load_tables(spark, SF_DIR)["documents"])


def test_media_schema(media):
    assert isinstance(media.schema["content"].dataType, BinaryType)
    assert isinstance(media.schema["meta"].dataType, StructType)
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_binary_parquet_roundtrip(spark, media, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("media_pq"))
    media.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert isinstance(back.schema["content"].dataType, BinaryType)
    orig = media.select("doc_id", F.col("meta.sha256").alias("s"))
    rt = back.select(
        "doc_id", F.sha2(F.col("content"), 256).alias("s")
    )
    assert orig.exceptAll(rt).count() == 0


def test_decode_deterministic_and_typed(media):
    feats = decode_media(media)
    assert feats.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,n_bytes:bigint,"
        "width:int,height:int,duration_ms:int,feature_hash:bigint>"
    )
    a = feats.orderBy("doc_id").collect()
    b = decode_media(media).orderBy("doc_id").collect()
    assert a == b  # deterministic fake decode
    img = [r for r in a if r["media_type"] == "image"]
    aud = [r for r in a if r["media_type"] == "audio"]
    assert all(r["width"] >= 16 and r["duration_ms"] == 0 for r in img)
    assert all(r["width"] == 0 and r["duration_ms"] >= 0 for r in aud)


def test_custom_decoder_injection(media):
    def decoder(payload, media_type):
        return (1, 2, 3, len(payload))

    row = decode_media(media, decoder=decoder).first()
    assert (row["width"], row["height"], row["duration_ms"]) == (1, 2, 3)
    assert row["feature_hash"] == row["n_bytes"]


def test_resize_only_images_and_bounded(media):
    resized = resize_images(media, max_side=64)
    rows = resized.collect()
    n_images = media.filter(F.col("media_type") == "image").count()
    assert len(rows) == n_images
    assert all(max(r["width"], r["height"]) <= 64 for r in rows)
    assert all(len(r["content"]) >= 1 for r in rows)


def test_frame_sample_explodes_videos(media):
    frames = sample_frames(media, every_ms=60_000)
    n_videos = media.filter(F.col("media_type") == "video").count()
    per_video = frames.groupBy("doc_id").count()
    assert per_video.count() == n_videos  # every video yields ≥1 frame
    assert frames.count() >= n_videos
    # frame hashes differ across frame_idx for multi-frame videos
    multi = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("frame_hash").alias("d")
    ).filter(F.col("n") > 1)
    assert multi.filter(F.col("n") != F.col("d")).count() == 0


def test_phash_neardup_matches_bruteforce(spark):
    """Banded candidate join + exact verify must equal the brute-force
    all-pairs Hamming scan (pigeonhole guarantees no missed pair), and
    the synthetic corpus must actually contain near-dup media."""
    from elastic_freight_spark.operators.multimodal import (
        attach_media,
        phash_media,
        phash_neardup_pairs,
        _fake_phash,
    )
    from elastic_freight_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    media = attach_media(docs)
    hashed = phash_media(media)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_neardup_pairs(hashed, max_hamming=4).collect()
    }

    rows = [
        (r["doc_id"], r["media_type"], r["phash"])
        for r in hashed.collect()
    ]
    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[1] != b[1]:
                continue
            d = bin((a[2] ^ b[2]) & ((1 << 64) - 1)).count("1")
            if d <= 4:
                key = (min(a[0], b[0]), max(a[0], b[0]))
                want[key] = d
    assert got == want
    assert len(got) > 0  # the corpus's synthetic near-dups are found

    # locality of the (stand-in) phash: a small in-place edit moves
    # the hash by only the few grams overlapping the edit
    base = bytes(range(256)) * 4
    edited = bytearray(base)
    edited[512] ^= 0xFF
    d = bin(
        (_fake_phash(base) ^ _fake_phash(bytes(edited))) & ((1 << 64) - 1)
    ).count("1")
    assert d <= 8
