"""Decode-kernel tests: synthetic frame round-trip + malformed inputs
(mirrors reference tests/test_decode_pair.py and test_edge_cases.py:361-369)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dexscraper_spark.schemas import RAW_MESSAGES
from dexscraper_spark.sources.binary import (
    MALFORMED_FRAMES, make_frame, sample_pairs,
)
from dexscraper_spark.sources.decode import decode_messages, parse_frame


def test_roundtrip_pure_python():
    pairs = sample_pairs(4)
    rows = parse_frame(make_frame(pairs))
    assert len(rows) == 4
    assert rows[0]["chain"] == "solana"
    assert rows[0]["protocol"] == "pumpfun"
    assert abs(rows[0]["price"] - 0.000123) < 1e-15
    assert rows[0]["created_at"] == 1756793176
    assert rows[0]["record_position"] == 0
    assert rows[1]["record_position"] == 512


def test_malformed_frames_yield_nothing():
    for name, frame in MALFORMED_FRAMES.items():
        assert parse_frame(frame) == [], name
    assert parse_frame(b"\x00" * 1_000_000) == []


def test_decode_messages_spark(spark):
    pairs = sample_pairs(4)
    frames = [
        (0, make_frame(pairs[:2])),
        (1, make_frame(pairs[2:])),
        (2, MALFORMED_FRAMES["garbage"]),
        (3, None),
    ]
    raw = spark.createDataFrame(frames, schema=RAW_MESSAGES)
    out = decode_messages(raw)
    rows = sorted(out.collect(), key=lambda r: (r["msg_id"], r["record_position"]))
    assert len(rows) == 4
    assert [r["msg_id"] for r in rows] == [0, 0, 1, 1]
    assert rows[0]["base_token_symbol"] == "TK08"
    assert rows[0]["volume_h24"] == 1_000_000.5
    # downstream is pure DataFrame: filter+agg on decoded rows
    agg = (out.groupBy("chain").agg(F.count(F.lit(1)).alias("n"))
           .orderBy("chain").collect())
    assert [(r["chain"], r["n"]) for r in agg] == [("base", 2), ("solana", 2)]


def test_zero_metrics_dropped():
    """A record whose metric block is all zeros must not survive (F6)."""
    p = sample_pairs(1)[0]
    for f in ("price", "price_usd", "price_change_h24", "liquidity_usd",
              "volume_h24", "fdv", "created_at"):
        p[f] = 0.0
    assert parse_frame(make_frame([p])) == []


def test_text_mode_fallback():
    """S6: a pure-text frame decodes via the text strategy."""
    from dexscraper_spark.sources.decode import parse_frame_multi_strategy
    payload = (b"noise raydium PEPE "
               b"7xKXtg2CW87d97TXJSDpbD5jBkheTqA83TZRuJosgAsU "
               b"9yQNrg3DX98e08UYKTEqcE6kClifUrB94UASvKpthBtV "
               b"SuperToken extra words here")
    strategy, rows = parse_frame_multi_strategy(payload)
    assert strategy == "text"
    assert len(rows) == 1
    r = rows[0]
    assert r["protocol"] == "raydium"
    assert r["base_token_symbol"] == "PEPE"
    assert r["base_token_address"].startswith("7xKXtg2")
    assert r["pair_address"].startswith("9yQNrg3")
    assert r["base_token_name"] == "SuperToken"


def test_cluster_scan_fallback():
    """S7/S10: raw doubles without record structure decode via window
    clusters (price + volume in one 128-byte window)."""
    import struct
    from dexscraper_spark.sources.decode import parse_frame_multi_strategy
    window = bytearray(b"\x01" * 16)            # non-text noise, kills text path
    window += struct.pack("<d", 0.000555)       # price range
    window += b"\x02" * 8
    window += struct.pack("<d", 2_500_000.0)    # volume range
    window += b"\x03" * 8
    payload = bytes(window) + b"\x04" * 200
    strategy, rows = parse_frame_multi_strategy(payload)
    assert strategy == "clusters"
    assert rows[0]["price"] == 0.000555
    assert rows[0]["volume_h24"] == 2_500_000.0


def test_binary_strategy_preferred():
    """U2: structured records win over clusters/text when present."""
    from dexscraper_spark.sources.binary import make_frame, sample_pairs
    from dexscraper_spark.sources.decode import parse_frame_multi_strategy
    strategy, rows = parse_frame_multi_strategy(make_frame(sample_pairs(2)))
    assert strategy == "binary" and len(rows) == 2


def test_no_strategy_yields_none():
    from dexscraper_spark.sources.decode import parse_frame_multi_strategy
    assert parse_frame_multi_strategy(b"\x00" * 64) == ("none", [])
    assert parse_frame_multi_strategy(b"") == ("none", [])
