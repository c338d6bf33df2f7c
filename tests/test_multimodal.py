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


# --- real PNG codec (round-8: the decode pin is end-to-end honest) ---------


def _encode_png(rows, channels, filter_type=0):
    """Minimal test-side PNG ENCODER (pure stdlib): 8-bit, color type
    from channels (1->grey, 3->RGB, 4->RGBA), non-interlaced, one
    filter type applied to every scanline — the forward transform of
    the five filters decode_png must invert."""
    import struct
    import zlib

    height = len(rows)
    width = len(rows[0]) // channels
    color = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    stride = width * channels
    bpp = channels
    raw = bytearray()
    prev = bytearray(stride)
    for r in rows:
        line = bytearray(r)
        assert len(line) == stride
        f = bytearray(stride)
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if filter_type == 0:
                f[i] = line[i]
            elif filter_type == 1:
                f[i] = (line[i] - a) & 0xFF
            elif filter_type == 2:
                f[i] = (line[i] - b) & 0xFF
            elif filter_type == 3:
                f[i] = (line[i] - ((a + b) >> 1)) & 0xFF
            elif filter_type == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                f[i] = (line[i] - pr) & 0xFF
        raw.append(filter_type)
        raw.extend(f)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    from elastic_freight_spark.operators.multimodal import PNG_MAGIC

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# a 5x3 RGB fixture with distinct per-channel structure: R ramps by
# column, G ramps by row, B constant 7
PNG_W, PNG_H = 5, 3
PNG_ROWS = [
    bytes(
        v
        for x in range(PNG_W)
        for v in (x * 50, y * 80, 7)
    )
    for y in range(PNG_H)
]


def test_png_codec_inverts_all_five_filters():
    """decode_png recovers the exact pixel bytes under every PNG
    scanline filter (None/Sub/Up/Average/Paeth) — the codec is a real
    decoder, not a fixture-shaped one."""
    from elastic_freight_spark.operators.multimodal import decode_png

    for ftype in range(5):
        payload = _encode_png(PNG_ROWS, 3, filter_type=ftype)
        w, h, ch, rows = decode_png(payload)
        assert (w, h, ch) == (PNG_W, PNG_H, 3), ftype
        assert [bytes(r) for r in rows] == PNG_ROWS, ftype


def test_png_codec_greyscale_and_rgba():
    from elastic_freight_spark.operators.multimodal import decode_png

    grey = [bytes((x * 17 + y) & 0xFF for x in range(4)) for y in range(2)]
    w, h, ch, rows = decode_png(_encode_png(grey, 1, filter_type=2))
    assert (w, h, ch) == (4, 2, 1) and [bytes(r) for r in rows] == grey
    rgba = [
        bytes(v for x in range(3) for v in (x, 2 * x, 3 * x, 255))
        for _ in range(2)
    ]
    w, h, ch, rows = decode_png(_encode_png(rgba, 4, filter_type=4))
    assert (w, h, ch) == (3, 2, 4) and [bytes(r) for r in rows] == rgba


def test_real_png_through_decode_stage(spark):
    """End-to-end: REAL PNG bytes through the SAME mapInPandas decode
    stage the registered mm_decode_features plan runs (default
    decoder, magic-sniffed dispatch) — width/height come from the
    actual codec, non-PNG payloads still take the deterministic fake,
    and the decoded channel statistics pin the pixel math."""
    import zlib

    from elastic_freight_spark.operators.multimodal import (
        decode_media,
        decode_png,
    )

    payload = _encode_png(PNG_ROWS, 3, filter_type=1)
    fake_payload = b"not a png at all"
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(payload)),
            (2, "image", bytearray(fake_payload)),
        ],
        "doc_id long, media_type string, content binary",
    )
    feats = {r["doc_id"]: r for r in decode_media(media).collect()}
    # real path: true dimensions + crc32 feature hash
    assert (feats[1]["width"], feats[1]["height"]) == (PNG_W, PNG_H)
    assert feats[1]["duration_ms"] == 0
    assert feats[1]["feature_hash"] == zlib.crc32(payload)
    assert feats[1]["n_bytes"] == len(payload)
    # fake path untouched for non-PNG images (dims are hash-derived)
    h = zlib.crc32(fake_payload)
    assert feats[2]["width"] == 16 + (h % 2048)

    # channel stats from the decoded pixels: exact means per channel
    _, _, ch, rows = decode_png(payload)
    flat = [b for r in rows for b in r]
    means = [
        sum(flat[c::ch]) / (PNG_W * PNG_H) for c in range(ch)
    ]
    assert means[0] == sum(x * 50 for x in range(5)) * 3 / 15  # R: col ramp
    assert means[1] == sum(y * 80 for y in range(3)) * 5 / 15  # G: row ramp
    assert means[2] == 7.0  # B: constant


def test_corrupt_png_magic_degrades_to_fake(spark):
    """A payload carrying the PNG magic but corrupt bytes (truncated
    IDAT, garbage chunks) must degrade to the deterministic fake
    decoder — never propagate zlib/struct errors out of the Arrow
    batch."""
    import zlib

    from elastic_freight_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_media,
    )

    corrupt = PNG_MAGIC + b"\x00\x00\x00\x0dIHDRgarbage!!"
    truncated = _encode_png(PNG_ROWS, 3)[:-20]  # chop IEND + IDAT tail
    media = spark.createDataFrame(
        [(1, "image", bytearray(corrupt)), (2, "image", bytearray(truncated))],
        "doc_id long, media_type string, content binary",
    )
    feats = {r["doc_id"]: r for r in decode_media(media).collect()}
    for did, payload in ((1, corrupt), (2, truncated)):
        h = zlib.crc32(payload)
        assert feats[did]["width"] == 16 + (h % 2048)  # fake path
        assert feats[did]["feature_hash"] == h


# --- real JPEG parser (round 9: last common format off the fake path) -------


def _encode_jpeg(width=640, height=480, components=3, precision=8,
                 sof_marker=0xC0, fill_byte=False, app1=False,
                 skip_sof=False):
    """Minimal test-side JPEG ENCODER (hand-rolled marker stream):
    SOI, APP0/JFIF, optional APP1/Exif, DQT, optional 0xFF fill byte,
    SOFn, DHT, SOS + entropy bytes with a restart marker, EOI — the
    canonical segment layout decode_jpeg's walker must navigate.
    Entropy data is fake (the decoder must never read past SOF)."""
    import struct

    def seg(m, body):
        return bytes([0xFF, m]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    jfif = (b"JFIF\x00" + bytes([1, 1, 0])
            + struct.pack(">HH", 72, 72) + bytes([0, 0]))
    out += seg(0xE0, jfif)
    if app1:
        out += seg(0xE1, b"Exif\x00\x00" + bytes(10))
    out += seg(0xDB, bytes([0]) + bytes(64))  # DQT
    if fill_byte:
        out += b"\xff"  # legal padding before the next marker's 0xFF
    if not skip_sof:
        sof = (bytes([precision]) + struct.pack(">HH", height, width)
               + bytes([components]))
        for i in range(components):
            sof += bytes([i + 1, 0x11, 0])
        out += seg(sof_marker, sof)
    out += seg(0xC4, bytes([0]) + bytes(16) + bytes(1))  # DHT (non-frame)
    sos = (bytes([components])
           + b"".join(bytes([i + 1, 0]) for i in range(components))
           + bytes([0, 63, 0]))
    out += seg(0xDA, sos)
    out += b"\x01\x02\x03"  # fake entropy-coded data
    out += b"\xff\xd9"  # EOI
    return out


def test_jpeg_parser_recovers_frame_header():
    """decode_jpeg recovers width/height/components/precision from the
    first SOFn — baseline (C0), progressive (C2), greyscale, uint16
    extremes — through APPn segments and fill bytes, and never reads
    the entropy-coded data."""
    from elastic_freight_spark.operators.multimodal import decode_jpeg

    assert decode_jpeg(_encode_jpeg()) == (640, 480, 3, 8)
    assert decode_jpeg(
        _encode_jpeg(width=1920, height=1080, sof_marker=0xC2,
                     fill_byte=True, app1=True)
    ) == (1920, 1080, 3, 8)
    assert decode_jpeg(
        _encode_jpeg(width=65_535, height=65_535, components=1,
                     precision=12, sof_marker=0xC1)
    ) == (65_535, 65_535, 1, 12)


def test_jpeg_parser_rejects_out_of_profile():
    """Out-of-profile JPEG byte streams raise ValueError (the degrade
    trigger): wrong magic, no SOF before SOS, truncated segments,
    zero dimensions, DHT/JPG/DAC never mistaken for frame headers."""
    import pytest as _pytest

    from elastic_freight_spark.operators.multimodal import decode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with _pytest.raises(ValueError):  # SOS arrives with no frame header
        decode_jpeg(_encode_jpeg(skip_sof=True))
    with _pytest.raises(ValueError):  # segment length past the buffer
        decode_jpeg(_encode_jpeg()[:20])
    with _pytest.raises(ValueError):  # DNL-style deferred height
        decode_jpeg(_encode_jpeg(height=0))
    with _pytest.raises(ValueError):  # garbage where a marker must be
        decode_jpeg(b"\xff\xd8\xff\xe0\x00\x04\x00\x00garbage")
    # 0xFF 0x00 is a STUFFED byte (entropy-layer only) — at segment
    # level it is a desync, NOT a length-prefixed segment.  Before the
    # round-10 fix the walker read the next two bytes (0x00 0x08 here)
    # as a segment length and silently skipped to the trailing valid
    # SOF, returning success from a desynced stream.
    desynced = (b"\xff\xd8" + b"\xff\x00" + b"\x00\x08" + bytes(6)
                + _encode_jpeg()[2:])
    with _pytest.raises(ValueError, match="desync"):
        decode_jpeg(desynced)
    # a second SOI mid-stream is equally desynced (old code: skipped)
    midstream_soi = (b"\xff\xd8" + b"\xff\xd8" + b"\x00\x08" + bytes(6)
                     + _encode_jpeg()[2:])
    with _pytest.raises(ValueError, match="desync"):
        decode_jpeg(midstream_soi)


def test_real_jpeg_through_decode_stage(spark):
    """End-to-end: REAL JPEG bytes through the SAME mapInPandas decode
    stage the registered mm_decode_features plan runs (default
    decoder, magic-sniffed dispatch) — width/height come from the
    actual SOF parse, corrupt-but-magic'd payloads degrade to the
    fake, and PNG dispatch is unaffected."""
    import zlib

    from elastic_freight_spark.operators.multimodal import decode_media

    jpeg = _encode_jpeg(width=1024, height=768)
    corrupt = b"\xff\xd8\xff" + b"garbage-after-magic"
    png = _encode_png(PNG_ROWS, 3, filter_type=0)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(jpeg)),
            (2, "image", bytearray(corrupt)),
            (3, "image", bytearray(png)),
            (4, "audio", bytearray(jpeg)),  # wrong media_type → fake
        ],
        "doc_id long, media_type string, content binary",
    )
    feats = {r["doc_id"]: r for r in decode_media(media).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (1024, 768)
    assert feats[1]["duration_ms"] == 0
    assert feats[1]["feature_hash"] == zlib.crc32(jpeg)
    h = zlib.crc32(corrupt)
    assert feats[2]["width"] == 16 + (h % 2048)  # fake path
    assert feats[2]["feature_hash"] == h
    assert (feats[3]["width"], feats[3]["height"]) == (PNG_W, PNG_H)
    h4 = zlib.crc32(jpeg)
    assert feats[4]["duration_ms"] == h4 % 600_000  # audio fake path


# --- real WAV parser (round-8 cont.: the audio decode pin is honest) --------


def _encode_wav(channels=2, rate=16_000, width=2, n_frames=800, extra_chunk=False):
    """Minimal test-side WAV ENCODER: the stdlib `wave` writer for the
    canonical file, or a hand-rolled RIFF for the extra/odd-chunk
    layout decode_wav's chunk walker must skip over."""
    import io
    import struct
    import wave

    if not extra_chunk:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(
                b"".join(
                    struct.pack("<h" if width == 2 else "<b", (i * 7) % 120)
                    * channels
                    for i in range(n_frames)
                )
            )
        return buf.getvalue()
    # hand-rolled: fmt, an odd-length LIST chunk (forces the word-align
    # +1 skip), then data
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * width,
                      channels * width, width * 8)
    data = bytes(n_frames * channels * width)
    odd = b"INFOabc"  # 7 bytes — odd, so a pad byte follows
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_parser_recovers_format_metadata():
    """decode_wav recovers channels/rate/bits/frames/duration from
    real `wave`-module output across layouts, including a chunk list
    with an odd-length LIST chunk before data (word-alignment)."""
    from elastic_freight_spark.operators.multimodal import decode_wav

    for kw, want in [
        (dict(channels=2, rate=16_000, width=2, n_frames=800),
         (2, 16_000, 16, 800, 50)),
        (dict(channels=1, rate=8_000, width=1, n_frames=12_000),
         (1, 8_000, 8, 12_000, 1_500)),
        (dict(channels=2, rate=44_100, width=2, n_frames=44_100),
         (2, 44_100, 16, 44_100, 1_000)),
        (dict(channels=1, rate=16_000, width=2, n_frames=400,
              extra_chunk=True),
         (1, 16_000, 16, 400, 25)),
    ]:
        assert decode_wav(_encode_wav(**kw)) == want, kw


def test_real_wav_through_decode_stage(spark):
    """End-to-end: REAL WAV bytes through the SAME mapInPandas decode
    stage the registered mm_decode_features plan runs — duration_ms
    comes from the actual fmt/data parse, non-WAV audio payloads still
    take the deterministic fake, and image dispatch is untouched."""
    import zlib

    from elastic_freight_spark.operators.multimodal import decode_media

    wav = _encode_wav(channels=2, rate=16_000, width=2, n_frames=8_000)
    not_wav = b"opus-encoded-or-whatever"
    media = spark.createDataFrame(
        [(1, "audio", bytearray(wav)), (2, "audio", bytearray(not_wav))],
        "doc_id long, media_type string, content binary",
    )
    feats = {r["doc_id"]: r for r in decode_media(media).collect()}
    assert feats[1]["duration_ms"] == 500  # 8000 frames @ 16 kHz
    assert (feats[1]["width"], feats[1]["height"]) == (0, 0)
    assert feats[1]["feature_hash"] == zlib.crc32(wav)
    assert feats[1]["n_bytes"] == len(wav)
    h = zlib.crc32(not_wav)
    assert feats[2]["duration_ms"] == h % 600_000  # fake path
    assert feats[2]["feature_hash"] == h


def test_corrupt_wav_magic_degrades_to_fake(spark):
    """RIFF/WAVE magic with corrupt innards (no fmt chunk, zero-rate
    fmt, compressed format tag) must degrade to the deterministic fake
    — never propagate struct/Value errors out of the Arrow batch; and
    a WAV payload typed as video must NOT take the audio path."""
    import struct
    import zlib

    from elastic_freight_spark.operators.multimodal import decode_media

    no_fmt = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    bad_fmt = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 0, 0, 0, 8)  # rate/align zero
        + b"data" + struct.pack("<I", 0)
    )
    mp3ish = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 85, 2, 44_100, 0, 4, 16)  # tag 85 = MP3
        + b"data" + struct.pack("<I", 0)
    )
    real = _encode_wav()
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(no_fmt)),
            (2, "audio", bytearray(bad_fmt)),
            (3, "audio", bytearray(mp3ish)),
            (4, "video", bytearray(real)),  # wrong media_type → fake
        ],
        "doc_id long, media_type string, content binary",
    )
    feats = {r["doc_id"]: r for r in decode_media(media).collect()}
    for did, payload in ((1, no_fmt), (2, bad_fmt), (3, mp3ish), (4, real)):
        h = zlib.crc32(payload)
        assert feats[did]["duration_ms"] == h % 600_000, did  # fake path
        assert feats[did]["feature_hash"] == h, did


# --- real AVI parser (round-8 cont.: the video decode pin is honest) --------


def _encode_avi(width=320, height=240, n_frames=900, us_per_frame=33_333,
                junk_before_hdrl=False, avih_len=56):
    """Minimal test-side AVI ENCODER (hand-rolled RIFF): LIST/'hdrl'
    holding an avih main header, then an empty LIST/'movi' — the
    canonical layout decode_avi's recursive walker must navigate,
    optionally with a JUNK chunk first (real muxers emit these)."""
    import struct

    avih = struct.pack(
        "<IIIIIIIIII",
        us_per_frame, 4_000_000, 0, 0x10, n_frames, 0, 1, 65536, width, height,
    ) + bytes(avih_len - 40)
    hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    movi_body = b"movi"
    chunks = b""
    if junk_before_hdrl:
        junk = b"filler!"  # odd length — exercises the pad-byte skip
        chunks += b"JUNK" + struct.pack("<I", len(junk)) + junk + b"\x00"
    chunks += b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    chunks += b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"AVI " + chunks


def test_avi_parser_recovers_main_header():
    """decode_avi recovers width/height/frames/frame-period/duration
    from the avih header, through JUNK chunks and nested LISTs."""
    from elastic_freight_spark.operators.multimodal import decode_avi

    assert decode_avi(_encode_avi()) == (320, 240, 900, 33_333, 29_999)
    assert decode_avi(
        _encode_avi(width=1920, height=1080, n_frames=24, us_per_frame=41_708,
                    junk_before_hdrl=True)
    ) == (1920, 1080, 24, 41_708, 1_000)


def test_real_avi_through_decode_and_frame_sample(spark):
    """End-to-end: REAL AVI bytes through the decode stage (true
    dimensions + container duration) AND through sample_frames — the
    frame fan-out must follow the TRUE duration (max(1, dur // 60 s)),
    while non-AVI videos keep the fake-duration fan-out."""
    import zlib

    from elastic_freight_spark.operators.multimodal import (
        decode_media,
        sample_frames,
    )

    avi = _encode_avi(n_frames=9_000, us_per_frame=33_333)  # ~300 s
    not_avi = b"mp4-or-mkv-bytes"
    media = spark.createDataFrame(
        [(1, "video", bytearray(avi)), (2, "video", bytearray(not_avi))],
        "doc_id long, media_type string, content binary",
    )
    feats = {r["doc_id"]: r for r in decode_media(media).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (320, 240)
    assert feats[1]["duration_ms"] == (9_000 * 33_333) // 1000  # 299997
    assert feats[1]["feature_hash"] == zlib.crc32(avi)
    h = zlib.crc32(not_avi)
    assert feats[2]["duration_ms"] == h % 600_000  # fake path

    frames = {}
    for r in sample_frames(media).collect():
        frames[r["doc_id"]] = frames.get(r["doc_id"], 0) + 1
    assert frames[1] == max(1, 299_997 // 60_000)  # 4 — true duration
    assert frames[2] == max(1, (h % 600_000) // 60_000)  # fake duration


def test_corrupt_avi_magic_degrades_to_fake(spark):
    """RIFF/'AVI ' magic with corrupt innards (no hdrl, short avih,
    zero frame period) must degrade to the deterministic fake, and a
    real AVI typed as audio must NOT take the video path."""
    import struct
    import zlib

    from elastic_freight_spark.operators.multimodal import decode_media

    no_hdrl = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    short_avih = (
        b"RIFF" + struct.pack("<I", 24) + b"AVI "
        + b"LIST" + struct.pack("<I", 16) + b"hdrl"
        + b"avih" + struct.pack("<I", 4) + bytes(4)
    )
    zero_period = _encode_avi(us_per_frame=0)
    # dwWidth/dwHeight are uint32 in the container; a PARSEABLE header
    # past int32 must also degrade (DECODE_SCHEMA stores int32 — an
    # overflowing value would otherwise fail Arrow conversion and kill
    # the whole mapInPandas batch, r8 ADVICE item).
    wide = _encode_avi(width=2**31, height=1)
    tall = _encode_avi(width=1, height=2**32 - 1)
    real = _encode_avi()
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(no_hdrl)),
            (2, "video", bytearray(short_avih)),
            (3, "video", bytearray(zero_period)),
            (4, "audio", bytearray(real)),  # wrong media_type → fake
            (5, "video", bytearray(wide)),
            (6, "video", bytearray(tall)),
        ],
        "doc_id long, media_type string, content binary",
    )
    feats = {r["doc_id"]: r for r in decode_media(media).collect()}
    for did, payload in (
        (1, no_hdrl), (2, short_avih), (3, zero_period), (4, real),
        (5, wide), (6, tall),
    ):
        h = zlib.crc32(payload)
        assert feats[did]["duration_ms"] == h % 600_000, did
        assert feats[did]["feature_hash"] == h, did
