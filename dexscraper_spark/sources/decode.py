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
  frame framing   protocol.py:362-428 (magic check, b"pairs"+20 skip,
                  512/256/128 adaptive chunking keeping the max-yield split)
  record decode   protocol.py:75-200 (len-prefixed strings, clean_string,
                  >=2-char fields, 8-align, <8d metric block, non-finite →
                  drop, meaningful-row gate, timestamp sanity < 4102444800)
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
    # meaningful-row gate (protocol.py:188-196)
    if not any(metrics.get(k) for k in
               ("price", "price_usd", "volume_h24", "liquidity_usd")):
        return None
    created = metrics.pop("created_at", None)
    created_at = int(created) if created is not None \
        and 0 <= created < TS_SANITY_BOUND else None
    return {**strings, **metrics, "created_at": created_at}


def parse_frame(payload: bytes) -> list[dict]:
    """Frame → records, with the reference's adaptive chunking: try each
    chunk size, keep the split that yields the most valid records."""
    if not payload or len(payload) < len(MAGIC):
        return []
    idx = payload.find(PAIRS_MARKER)
    if idx < 0:
        return []
    body = payload[idx + len(PAIRS_MARKER) + HEADER_SKIP:]
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
