"""Multimodal plumbing tests: schema, batch shapes, frame explode,
feature vectors feeding the similarity operator, and the stubbed real-codec
path raising the marked NotImplementedError."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dexscraper_spark.operators.multimodal import (
    FEATURE_DIM, decode_media_meta, encode_fake_media, extract_features,
    resize_images, sample_frames, synthetic_media, _decode_real_image,
)


def test_decode_meta_schema_and_pruning(spark):
    media = synthetic_media(spark, 12)
    meta = decode_media_meta(media)
    rows = {r["media_id"]: r for r in meta.collect()}
    assert len(rows) == 12
    img = rows[0]
    assert img["kind"] == "image" and img["format"] == "fake"
    assert img["width"] == 16 and img["height"] == 9 and img["channels"] == 3
    assert img["payload_bytes"] > img["width"] * img["height"]
    aud = rows[1]
    assert aud["kind"] == "audio" and aud["sample_rate"] == 8000
    vid = rows[2]
    assert vid["kind"] == "video" and vid["n_frames"] >= 4
    # metadata-only aggregation works without touching payloads
    agg = meta.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r["n"] for r in agg) == 12


def test_resize_halves_dimensions(spark):
    media = synthetic_media(spark, 3)
    resized = decode_media_meta(resize_images(media, factor=2))
    r = resized.filter(F.col("media_id") == 0).collect()[0]
    assert (r["width"], r["height"]) == (8, 4)
    assert r["payload_bytes"] < 16 * 9 * 3


def test_sample_frames_explodes_videos(spark):
    media = synthetic_media(spark, 6)   # media 2 and 5 are videos
    frames = sample_frames(media, every=2).collect()
    by_media = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f)
    assert set(by_media) == {2, 5}
    for frames_list in by_media.values():
        idxs = sorted(f["frame_index"] for f in frames_list)
        assert idxs == list(range(0, 2 * len(idxs), 2))
        sizes = {len(f["frame"]) for f in frames_list}
        assert len(sizes) == 1  # constant frame byte size


def test_features_feed_similarity(spark):
    from dexscraper_spark.operators.similarity import cosine_topk
    media = synthetic_media(spark, 9)
    feats = extract_features(media)
    rows = feats.collect()
    assert all(len(r["embedding"]) == FEATURE_DIM for r in rows)
    assert all(abs(sum(r["embedding"]) - 1.0) < 1e-9 for r in rows)
    ann = cosine_topk(
        feats.withColumnRenamed("media_id", "vec_id"),
        feats.withColumnRenamed("media_id", "vec_id").filter(F.col("vec_id") == 0),
        k=3, dim=FEATURE_DIM)
    got = ann.collect()
    assert len(got) == 3 and all(r["query_id"] == 0 for r in got)


def test_real_codec_path_decodes_bmp_png_jpeg():
    """BMP/PNG/baseline-JPEG decode for real (pure-Python,
    tests/test_codecs.py + test_jpeg.py); only formats needing external
    codec libs stay stubbed."""
    from dexscraper_spark.operators.codecs import encode_bmp
    px = bytes(range(2 * 2 * 3))
    img = _decode_real_image(encode_bmp(2, 2, px))
    assert img["format"] == "bmp" and img["body"] == px
    # non-image bytes (the FAKE container) are not the real-codec path
    assert _decode_real_image(encode_fake_media(
        "image", width=2, height=2, channels=1, body=b"abcd")) is None
    from dexscraper_spark.operators.jpeg import encode_jpeg
    jimg = _decode_real_image(encode_jpeg(bytes([128] * 64), 8, 8, 1))
    assert jimg is not None and jimg["format"] == "jpeg"
    # PROGRESSIVE JPEG flows through the same bulk path — same pixels
    # as its baseline twin (pure coefficient reordering)
    from dexscraper_spark.operators.jpeg import encode_jpeg_progressive
    px3 = bytes(range(48)) * 4  # 8x8 RGB
    pimg = _decode_real_image(encode_jpeg_progressive(px3, 8, 8, 3))
    bimg = _decode_real_image(encode_jpeg(px3, 8, 8, 3))
    assert pimg is not None and pimg["format"] == "jpeg"
    assert pimg["body"] == bimg["body"]
    with pytest.raises(NotImplementedError, match="STUB"):
        from dexscraper_spark.operators.codecs import decode_image
        decode_image(b"RIFFxxxxWEBPdata")


def test_malformed_payload_yields_null_meta(spark):
    import pandas as pd
    from dexscraper_spark.operators.multimodal import MEDIA_SCHEMA
    pdf = pd.DataFrame({"media_id": [0, 1], "kind": ["image", "image"],
                        "payload": [b"NOTFAKE123456789", b""]})
    meta = decode_media_meta(spark.createDataFrame(pdf, schema=MEDIA_SCHEMA))
    rows = meta.collect()
    assert all(r["format"] is None for r in rows)


def test_decode_media_meta_corrupt_payload_yields_null_meta(spark):
    """One unsupported/corrupt image must not abort the whole job."""
    import struct as _struct
    import pandas as pd
    from dexscraper_spark.operators.codecs import PNG_SIGNATURE
    from dexscraper_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_media_meta)
    truncated_png = PNG_SIGNATURE + b"\x00" * 4  # signature, no IHDR
    pdf = pd.DataFrame([(0, "image", truncated_png),
                        (1, "image", b"BM" + b"\x00" * 10)],  # short BMP
                       columns=["media_id", "kind", "payload"])
    rows = decode_media_meta(
        spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)).collect()
    assert len(rows) == 2
    assert all(r.format is None and r.width is None for r in rows)


def test_probe_image_matches_full_decode_dims():
    from dexscraper_spark.operators.codecs import (
        decode_image, encode_bmp, encode_png, probe_image)
    px = bytes(range(48))  # 4x4 RGB
    for enc in (encode_bmp, encode_png):
        data = enc(4, 4, px, channels=3)
        probe, full = probe_image(data), decode_image(data)
        assert (probe["width"], probe["height"], probe["channels"]) == \
               (full["width"], full["height"], full["channels"])
        assert probe["format"] == full["format"]


def test_extract_features_format_independent(spark):
    """The same pixels as BMP vs PNG must embed identically (features over
    decoded pixels, not container bytes)."""
    import pandas as pd
    from dexscraper_spark.operators.codecs import encode_bmp, encode_png
    from dexscraper_spark.operators.multimodal import (
        MEDIA_SCHEMA, extract_features)
    px = bytes((x * 7) % 251 for x in range(4 * 4 * 3))
    pdf = pd.DataFrame(
        [(0, "image", encode_bmp(4, 4, px, channels=3)),
         (1, "image", encode_png(4, 4, px, channels=3))],
        columns=["media_id", "kind", "payload"])
    rows = {r.media_id: r.embedding for r in extract_features(
        spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)).collect()}
    assert rows[0] == rows[1]
