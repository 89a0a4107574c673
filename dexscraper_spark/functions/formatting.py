"""Display/sink formatting (SURVEY §2.10 D5).

Reference parity: format_number / format_percentage / format_volume
(dexscraper/utils.py:305-358), format_large_number tiering
(dexscraper/cli.py:232-241), 8-decimal fixed point at sinks
(dexscraper/models.py:64-77, 511-514).

Built-in format_string/format_number/concat + when-tier logic — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_price(c: Column, precision: int = 8) -> Column:
    """D5: fixed-point with ``precision`` decimals, trailing zeros stripped,
    thousands separators for |v| >= 1; NULL → 'N/A' (utils.py:305-323)."""
    big = F.regexp_replace(
        F.regexp_replace(F.format_number(c, precision), r"0+$", ""), r"\.$", "")
    small = F.regexp_replace(
        F.regexp_replace(F.format_string(f"%.{precision}f", c), r"0+$", ""), r"\.$", "")
    return (
        F.when(c.isNull(), F.lit("N/A"))
        .when(F.abs(c) >= 1, big)
        .otherwise(small)
    )


def fixed8(c: Column) -> Column:
    """Sink-side strict 8-decimal fixed point (models.py:64-77) — golden-
    tested against the reference CSV/MT5 strings."""
    return F.format_string("%.8f", c)


def format_percentage(c: Column) -> Column:
    """D5: 0.05 → '5.0%'; NULL → 'N/A' (utils.py:326-338)."""
    return F.when(c.isNull(), F.lit("N/A")) \
            .otherwise(F.concat(F.format_string("%.1f", c * 100.0), F.lit("%")))


def format_volume(c: Column) -> Column:
    """D5: $-prefixed K/M/B tiering, 2 decimals (utils.py:341-358)."""
    a = F.abs(c)
    return (
        F.when(c.isNull(), F.lit("N/A"))
        .when(a >= 1e9, F.concat(F.lit("$"), F.format_string("%.2f", c / 1e9), F.lit("B")))
        .when(a >= 1e6, F.concat(F.lit("$"), F.format_string("%.2f", c / 1e6), F.lit("M")))
        .when(a >= 1e3, F.concat(F.lit("$"), F.format_string("%.2f", c / 1e3), F.lit("K")))
        .otherwise(F.concat(F.lit("$"), F.format_string("%.2f", c)))
    )


def format_large_number(c: Column) -> Column:
    """cli.py:232-241 tiering without the $ prefix."""
    a = F.abs(c)
    return (
        F.when(c.isNull(), F.lit("N/A"))
        .when(a >= 1e9, F.concat(F.format_string("%.2f", c / 1e9), F.lit("B")))
        .when(a >= 1e6, F.concat(F.format_string("%.2f", c / 1e6), F.lit("M")))
        .when(a >= 1e3, F.concat(F.format_string("%.2f", c / 1e3), F.lit("K")))
        .otherwise(F.format_string("%.2f", c))
    )
