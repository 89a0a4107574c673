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
