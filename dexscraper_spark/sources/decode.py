"""D1 — the binary→rows decode kernel (SURVEY §2.10), the engine's single
mandatory Python stage.

Spark shape: ``mapInPandas`` over a ``raw_messages(msg_id, payload)``
DataFrame → exploded pair rows. Arrow moves the binary column to Python in
columnar batches; the per-frame parser is plain bytes code, amortized per
batch, never per-row-per-field round trips. Everything downstream of this
operator is pure DataFrame/SQL.

Scale notes:
* one frame is <=50 records (source-capped), so decode cost is linear in
  input bytes; partitions of frames decode independently — embarrassingly
  parallel across executors.
* the output schema is fixed (DECODED_SCHEMA); Catalyst prunes unused
  decode columns end-to-end.

Parser behavior mirrors the reference semantics (not its code):
  frame framing   protocol.py:378-391 (startswith-magic gate, b"pairs"+4
                  header skip, 512/256/128 adaptive chunking keeping the
                  max-yield split)
  record decode   protocol.py:75-200 (len-prefixed strings, clean_string,
                  >=2-char fields, 8-align, <8d metric block, non-finite →
                  drop, meaningful-row gate = (price AND priceUsd) OR
                  volumeH24 OR liquidityUsd, timestamp sanity < 4102444800)

Intentional deviation: reference decode_pair (protocol.py:88-93) routes any
chunk whose printable text contains solana/pump/raydium to text-mode parsing
BEFORE attempting structured decode; this engine always structured-parses
first and falls back (parse_frame_multi_strategy) — structured records carry
strictly more information, and the inversion is deliberate, not an oversight.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from dexscraper_spark.sources.binary import (
    HEADER_SKIP, MAGIC, PAIRS_MARKER, METRIC_FIELDS, STRING_FIELDS,
)

DECODED_SCHEMA = T.StructType(
    [T.StructField("msg_id", T.LongType())]
    + [T.StructField(f, T.StringType()) for f in STRING_FIELDS]
    + [T.StructField(f, T.DoubleType()) for f in METRIC_FIELDS[:-1]]
    + [T.StructField("created_at", T.LongType()),
       T.StructField("record_position", T.LongType())]
)

MAX_PAIRS_PER_FRAME = 50     # protocol.py:352
TS_SANITY_BOUND = 4102444800  # protocol.py:163
CHUNK_SIZES = (512, 256, 128)  # protocol.py:397-417


def _clean(s: str) -> str:
    cleaned = "".join(ch for ch in s if 32 <= ord(ch) < 127 or ord(ch) == 9)
    if "@" in cleaned or "\\" in cleaned:
        return cleaned.split("@")[0].split("\\")[0]
    return cleaned.strip()


def parse_record(chunk: bytes) -> dict | None:
    """Decode one record: strings → align → 8 doubles → validity gates."""
    pos = 0
    # leading-padding skip — byte-for-byte reference parity
    # (protocol.py:83). Known hazard inherited WITH the parity: a first
    # string field of length 0 or 10 (0x00/0x0A) has its length prefix
    # eaten as padding, shifting or dropping the record — the reference
    # corrupts the same frames identically. binary.py's encoder refuses
    # to emit such frames so synthetic fixtures can't hit it silently.
    while pos < len(chunk) and pos < 10 and chunk[pos] in (0x00, 0x0A):
        pos += 1
    strings: dict[str, str] = {}
    for field in STRING_FIELDS:
        if pos >= len(chunk):
            break
        str_len = chunk[pos]
        pos += 1
        if str_len > min(200, len(chunk) - pos):
            break
        if str_len == 0:
            continue
        value = _clean(chunk[pos:pos + str_len].decode("utf-8", errors="ignore"))
        if value and len(value) >= 2:
            strings[field] = value
        pos += str_len
    pos = (pos + 7) & ~7
    if pos + 64 > len(chunk):
        return None
    values = struct.unpack("<8d", chunk[pos:pos + 64])
    metrics: dict[str, float] = {}
    for name, v in zip(METRIC_FIELDS, values):
        if v != 0.0 and math.isfinite(v):
            metrics[name] = v
    if not metrics or len(strings) < 3:
        return None
    # meaningful-row gate (protocol.py:142-147, 188-196): price_data exists
    # only when BOTH price and priceUsd decoded; else volume or liquidity.
    if not (("price" in metrics and "price_usd" in metrics)
            or "volume_h24" in metrics or "liquidity_usd" in metrics):
        return None
    created = metrics.pop("created_at", None)
    created_at = int(created) if created is not None \
        and 0 <= created < TS_SANITY_BOUND else None
    return {**strings, **metrics, "created_at": created_at}


def parse_frame(payload: bytes) -> list[dict]:
    """Frame → records, with the reference's adaptive chunking: try each
    chunk size, keep the split that yields the most valid records."""
    if not payload or not payload.startswith(MAGIC):  # protocol.py:379
        return []
    idx = payload.find(PAIRS_MARKER)
    if idx < 0:
        return []
    body = payload[idx + len(PAIRS_MARKER) + HEADER_SKIP:]  # marker+5+4
    best: list[dict] = []
    for size in CHUNK_SIZES:
        rows = []
        for start in range(0, len(body), size):
            rec = parse_record(body[start:start + size])
            if rec is not None:
                rec["record_position"] = start
                rows.append(rec)
            if len(rows) >= MAX_PAIRS_PER_FRAME:
                break
        if len(rows) > len(best):
            best = rows
    return best


def decode_messages(raw: DataFrame, *, payload_col: str = "payload",
                    msg_id_col: str = "msg_id") -> DataFrame:
    """raw_messages(msg_id, payload BINARY) → decoded pair rows.

    Arrow-batched ``mapInPandas``: the only Python hop in the engine.
    """
    import pandas as pd

    out_cols = [f.name for f in DECODED_SCHEMA.fields]

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for msg_id, payload in zip(pdf[msg_id_col], pdf[payload_col]):
                for rec in parse_frame(bytes(payload) if payload is not None else b""):
                    rec["msg_id"] = int(msg_id)
                    rows.append(rec)
            yield pd.DataFrame(
                [{c: r.get(c) for c in out_cols} for r in rows],
                columns=out_cols,
            )

    return raw.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# S6 — text-mode record scan (fallback strategy 3). Reference semantics
# (protocol.py:203-281): printable projection → word classification
# (protocol marker / base58-length address / UPPER symbol / name) with
# first-wins slotting; a pair is emitted when any of name/symbol/address
# was found.
# ---------------------------------------------------------------------------

_TEXT_PROTOCOLS = ("pumpswap", "raydium", "meteora", "jupiter", "orca", "pumpfun")
_NAME_SKIP = ("twitter", "telegram", "website", "pump", "sol")


def parse_text_record(chunk: bytes) -> dict | None:
    printable = "".join(chr(b) if 32 <= b <= 126 else " " for b in chunk)
    words = [w.strip() for w in printable.split() if len(w.strip()) >= 2]
    if len(words) < 3:
        return None
    protocol = pair_address = token_name = token_symbol = token_address = ""
    for word in words:
        w = _clean(word)
        if not w or len(w) < 2:
            continue
        lw = w.lower()
        if any(p in lw for p in _TEXT_PROTOCOLS):
            protocol = w
        elif 32 <= len(w) <= 44 and w.replace("1", "").isalnum():
            if not token_address:
                token_address = w
            elif not pair_address:
                pair_address = w
        elif w.isupper() and 2 <= len(w) <= 10 and w.isalpha():
            if not token_symbol:
                token_symbol = w
        elif 3 <= len(w) <= 50 and not w.isnumeric() and not w.startswith("http"):
            if (not token_name or len(w) > len(token_name)) \
                    and not any(s in lw for s in _NAME_SKIP):
                token_name = w
    if token_name or token_symbol or len(token_address) >= 32:
        return {
            "chain": "solana", "protocol": protocol or "unknown",
            "pair_address": pair_address or None,
            "base_token_name": token_name or None,
            "base_token_symbol": token_symbol or None,
            "base_token_address": token_address or None,
        }
    return None


# ---------------------------------------------------------------------------
# S7/S10/S11 — sliding-window numeric cluster scan (fallback strategy 2).
# Reference semantics (enhanced_protocol.py:78-156; scraper.py:676-754):
# overlapping windows, unaligned f64/f32 sweeps, value-range
# classification, keep windows with >=1 price + volume signal.
# ---------------------------------------------------------------------------

_CLS_RANGES = {
    "price": (1e-6, 0.1),
    "volume": (1e5, 1e7),
    "liquidity": (1e4, 1e6),
    "market_cap": (1e5, 5e7),
}


def _classify(v: float) -> str | None:
    if not math.isfinite(v) or v == 0.0 or abs(v) in (1.0,):
        return None
    for name, (lo, hi) in _CLS_RANGES.items():
        if lo <= v <= hi:
            return name
    return None


def extract_numeric_clusters(payload: bytes, *, window: int = 128,
                             step: int = 64, max_clusters: int = 20) -> list[dict]:
    """Window scan: first qualifying value per field per window wins
    (W6 first-wins slotting); windows qualify with both a price and a
    volume-like signal; capped at ``max_clusters``."""
    clusters: list[dict] = []
    for start in range(0, max(len(payload) - window + 1, 1), step):
        chunk = payload[start:start + window]
        fields: dict[str, float] = {}
        for off in range(0, len(chunk) - 7):
            try:
                v = struct.unpack_from("<d", chunk, off)[0]
            except struct.error:
                break
            cls = _classify(v)
            if cls and cls not in fields:
                fields[cls] = v
        if "price" in fields and ("volume" in fields or "liquidity" in fields):
            clusters.append({"position": start, **fields})
            if len(clusters) >= max_clusters:
                break
    return clusters


def parse_frame_multi_strategy(payload: bytes) -> tuple[str, list[dict]]:
    """U2 — the reference's prefer-first fallback chain
    (protocol.py:365-423): structured records, else window clusters, else
    text extraction. Returns (strategy, rows)."""
    rows = parse_frame(payload)
    if rows:
        return "binary", rows
    clusters = extract_numeric_clusters(payload or b"")
    if clusters:
        out = []
        for c in clusters:
            out.append({
                "price": c.get("price"), "price_usd": c.get("price"),
                "volume_h24": c.get("volume"),
                "liquidity_usd": c.get("liquidity"),
                "fdv": c.get("market_cap"),
                "record_position": c["position"],
            })
        return "clusters", out
    text = parse_text_record(payload or b"")
    if text:
        text["record_position"] = 0
        return "text", [text]
    return "none", []
