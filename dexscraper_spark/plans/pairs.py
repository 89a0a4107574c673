"""Nested ``pairs`` projection (SURVEY §1.1): the reference's
``TradingPair`` with nested price/liquidity/volume structs
(dexscraper/models.py:93-143), built from the flat decoded rows, plus the
legacy JSON export (``to_dict``/``to_json`` parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_pairs(decoded: DataFrame) -> DataFrame:
    """Flat decode output → nested PAIRS schema."""
    return decoded.select(
        "chain", "protocol", "pair_address",
        F.col("base_token_name"),
        F.col("base_token_symbol"),
        F.col("base_token_address"),
        F.struct(
            F.col("price").alias("current"),
            F.col("price_usd").alias("usd"),
            F.col("price_change_h24").alias("change_24h"),
        ).alias("price"),
        F.struct(F.col("liquidity_usd").alias("usd")).alias("liquidity"),
        F.struct(F.col("volume_h24").alias("h24")).alias("volume"),
        F.col("fdv"),
        F.col("created_at"),
    )


def pairs_json(pairs: DataFrame) -> DataFrame:
    """One nested JSON document per pair (models.py:110-143 to_dict shape).

    NULL handling: Spark's ``to_json`` drops null fields — which is the
    reference's own semantics for the OPTIONAL fields (to_dict adds
    fdv/pairCreatedAt/price_data only when present, models.py:121-137).
    The reference's always-present header fields (chain/protocol/…) can
    still be None there; run the frame through
    ``functions.cleaning.null_free`` first if consumers require the full
    key set on every document."""
    return pairs.select(F.to_json(F.struct(*pairs.columns)).alias("json"))
