"""Deterministic synthetic binary frames in the reference wire format.

Layout per record (reference dexscraper/protocol.py:75-137, 42-72):
    6 × [1-byte length][UTF-8 bytes] string fields
        (chain, protocol, pairAddress, baseTokenName, baseTokenSymbol,
         baseTokenAddress)
    pad to 8-byte alignment
    8 × little-endian float64:
        price, priceUsd, priceChangeH24, liquidityUsd, volumeH24, fdv,
        timestamp(epoch s), reserved
Frame layout (protocol.py:378-391):
    magic b"\\x00\\n1.3.0\\n" + b"pairs" marker + 4-byte header +
    fixed-size record chunks (RECORD_SIZE each, zero-padded).
    (protocol.py:388 parses at marker+5+4; scraper.py:272's enhanced path
    uses marker+20 — we standardize on the protocol.py framing, the one
    the reference's own parse_message applies to every frame.)

This module only *generates* test frames (the real system would receive
them from a socket); the decoder lives in decode.py. Malformed variants
mirror tests/test_decode_pair.py:26-34 and test_edge_cases.py:361-369.
"""

from __future__ import annotations

import struct

MAGIC = b"\x00\n1.3.0\n"
PAIRS_MARKER = b"pairs"
HEADER_SKIP = 4           # protocol.py:388: pos = pairs_start + 5 + 4
RECORD_SIZE = 512         # largest of the reference's 512/256/128 chunk sizes

STRING_FIELDS = ("chain", "protocol", "pair_address", "base_token_name",
                 "base_token_symbol", "base_token_address")
METRIC_FIELDS = ("price", "price_usd", "price_change_h24", "liquidity_usd",
                 "volume_h24", "fdv", "created_at")


def encode_record(pair: dict) -> bytes:
    """One fixed-size record: length-prefixed strings, 8-align, 8 doubles."""
    out = bytearray()
    first = str(pair.get(STRING_FIELDS[0], "")).encode("utf-8")[:200]
    if len(first) in (0, 10):
        # the decoder's reference-parity padding skip (protocol.py:83)
        # eats a leading 0x00/0x0A byte — a first field of length 0 or 10
        # would silently shift/drop the record in BOTH engines; refuse to
        # encode the ambiguous frame rather than corrupt it silently
        raise ValueError(
            f"first string field {STRING_FIELDS[0]!r} must not encode to "
            f"0 or 10 bytes (wire-ambiguous with leading padding)")
    for f in STRING_FIELDS:
        raw = str(pair.get(f, "")).encode("utf-8")[:200]
        out.append(len(raw))
        out += raw
    while len(out) % 8:
        out.append(0)
    metrics = [float(pair.get(f, 0.0) or 0.0) for f in METRIC_FIELDS]
    metrics.append(0.0)  # reserved 8th slot
    out += struct.pack("<8d", *metrics)
    if len(out) > RECORD_SIZE:
        raise ValueError(f"record too large: {len(out)}")
    out += b"\x00" * (RECORD_SIZE - len(out))
    return bytes(out)


def make_frame(pairs: list[dict]) -> bytes:
    """A complete wire frame holding ``pairs`` records."""
    body = b"".join(encode_record(p) for p in pairs)
    return MAGIC + PAIRS_MARKER + b"\x00" * HEADER_SKIP + body


MALFORMED_FRAMES = {
    "empty": b"",
    "garbage": b"\xff\x00\x01",
    "short_lenprefix": b"\x0ahello",          # declares 10 bytes, has 5
    "text_only": b"this is not a binary frame at all",
    "nulls": b"\x00" * 10,
    "no_marker": MAGIC + b"\x00" * 64,
}


def sample_pairs(n: int = 4, seed: int = 7) -> list[dict]:
    """Deterministic sample pair dicts (no RNG — closed-form values)."""
    out = []
    for i in range(n):
        k = (i + 1) * (seed + 1)
        out.append({
            "chain": "solana" if i % 2 == 0 else "base",
            "protocol": ["pumpfun", "raydium", "orca", "meteora"][i % 4],
            "pair_address": f"PAIR{k:04d}" + "x" * 30,
            "base_token_name": f"Token {k}",
            "base_token_symbol": f"TK{k:02d}",
            "base_token_address": f"MINT{k:04d}" + "y" * 30,
            "price": 0.000123 * (i + 1),
            "price_usd": 0.000123 * (i + 1),
            "price_change_h24": (-1) ** i * 5.5 * (i + 1),
            "liquidity_usd": 50_000.0 + 1000 * i,
            "volume_h24": 1_000_000.5 + 500 * i,
            "fdv": 5_000_000.0 + 10_000 * i,
            "created_at": 1756793176 + 60 * i,
        })
    return out
