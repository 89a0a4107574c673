"""Validity predicates and value-range classification (SURVEY §2.3 F3-F9).

All pure ``Column`` expressions — they compile into whole-stage-codegen'd
CASE/AND trees, so at 100 TB these run inside the parquet scan stage with
zero extra passes.

Reference parity:
  F3  NaN/Inf scrub            — dexscraper/protocol.py:13-20, 63-66
  F4  float validity heuristic — dexscraper/utils.py:85-108, scraper.py:756-764
  F5  trading-data validation  — dexscraper/utils.py:445-469
  F6  meaningful-row filter    — dexscraper/protocol.py:140-141, 188-196
  F7  value-range classification — dexscraper/scraper.py:766-828, 97-105
  F8  completeness predicate   — dexscraper/models.py:346-348
  F9  high-confidence predicate — dexscraper/models.py:372-374
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Classification ranges (reference scraper.py:97-105). Each maps a raw
# decoded double to a field role by magnitude.
RANGES = {
    "price": (1e-6, 0.1),
    "volume": (1e5, 1e7),
    "liquidity": (1e4, 1e6),
    "market_cap": (1e5, 5e7),
    "txns": (10.0, 50_000.0),
    "makers": (10.0, 15_000.0),
    "percentage": (-100.0, 1000.0),
}


def scrub_nonfinite(c: Column, default: float = 0.0) -> Column:
    """F3: map NaN/±Inf to ``default`` (reference handle_double)."""
    finite = ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))
    return F.when(c.isNotNull() & finite, c).otherwise(F.lit(default))


def is_valid_float(c: Column) -> Column:
    """F4: finite, 1e-15 < |v| < 1e15, and not exactly 0.0 or ±1.0.

    The 0/±1 exclusion is the reference's uninitialized-memory heuristic
    (utils.py:104-106) — easy to lose in translation, pinned by unit test.
    """
    finite = ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))
    in_range = (F.abs(c) > 1e-15) & (F.abs(c) < 1e15)
    not_sentinel = (c != 0.0) & (c != 1.0) & (c != -1.0)
    return c.isNotNull() & finite & in_range & not_sentinel


def is_valid_trading_data(price: Column, volume: Column) -> Column:
    """F5: price ∈ (0, 1e6], volume ∈ [0, 1e12]."""
    return (
        price.isNotNull() & (price > 0.0) & (price <= 1e6)
        & volume.isNotNull() & (volume >= 0.0) & (volume <= 1e12)
    )


def is_meaningful_row(*metrics: Column, strings: list[Column] | None = None,
                      min_strings: int = 3) -> Column:
    """F6: keep a row if any metric ≠ 0, or ≥min_strings non-empty strings."""
    any_metric = F.lit(False)
    for m in metrics:
        any_metric = any_metric | (F.coalesce(m, F.lit(0.0)) != 0.0)
    if strings:
        n = sum(
            (F.when(s.isNotNull() & (F.length(s) > 0), 1).otherwise(0) for s in strings),
            start=F.lit(0),
        )
        return any_metric | (n >= min_strings)
    return any_metric


def classify_value(c: Column) -> Column:
    """F7: route a raw double into a field role by value range.

    First-match-wins CASE in the reference's priority order
    (scraper.py:766-828): price → txns → makers → volume → liquidity →
    market_cap → percentage → other. Chained ``when`` preserves priority
    exactly and stays in codegen.
    """
    def between(lo: float, hi: float) -> Column:
        return (c >= F.lit(lo)) & (c <= F.lit(hi))

    return (
        F.when(c.isNull() | F.isnan(c), F.lit("invalid"))
        .when(between(*RANGES["price"]), F.lit("price"))
        .when(between(*RANGES["txns"]) & (c == F.floor(c)), F.lit("txns"))
        .when(between(*RANGES["makers"]) & (c == F.floor(c)), F.lit("makers"))
        .when(between(*RANGES["volume"]), F.lit("volume"))
        .when(between(*RANGES["liquidity"]), F.lit("liquidity"))
        .when(between(*RANGES["market_cap"]), F.lit("market_cap"))
        .when(between(*RANGES["percentage"]), F.lit("percentage"))
        .otherwise(F.lit("other"))
    )


def is_complete(field_count: Column, confidence: Column,
                min_fields: int = 5, min_confidence: float = 0.3) -> Column:
    """F8: field_count >= 5 AND confidence_score >= 0.3."""
    return (field_count >= min_fields) & (confidence >= min_confidence)


def is_high_confidence(confidence: Column, threshold: float = 0.7) -> Column:
    """F9: confidence_score >= 0.7."""
    return confidence >= threshold
