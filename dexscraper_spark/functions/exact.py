"""Deterministic (order-independent) floating aggregation helpers.

Summing doubles is not associative: a 1000-executor sum and a single-thread
sum of the same column differ in the last ulps, which breaks bit-exact
cross-engine comparison AND makes production runs non-reproducible run to
run (shuffle order varies). The fix is the classic fixed-point trick: scale
each value to an integer (cents for money), sum exactly in LongType, and
divide once at the end. One extra codegen'd multiply per row — free at any
scale, and the result is identical on 1 core or 1000 executors.

``round_half_up(x, n)`` is defined as floor(x·10^n + 0.5)/10^n — the same
bits in every engine (Spark's ROUND and DuckDB's ROUND disagree on
half-even vs half-away; floor(+0.5) is unambiguous).

Input contract: FINITE doubles. NaN/±Inf take the wide decimal-cast
branch, where Spark yields NULL (dropped from the sum) but DuckDB's
HUGEINT cast raises — scrub non-finite values first
(``functions.validity.scrub_nonfinite``, the engine's F3 ingestion gate)
if the source can produce them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# |value| bound under which floor(v·10^s + 0.5) stays inside int64 —
# beyond it Spark's Floor(double)->long SATURATES silently (and DuckDB's
# BIGINT cast raises), so the wide path must branch BEFORE the floor.
def _cents_bound(scale: int) -> float:
    return 9e18 / float(10 ** scale)


def cents(c: Column, scale: int = 2) -> Column:
    """Scale a money/metric double to an exact integer: floor(c·10^s + 0.5).

    The per-row double multiply is IEEE-deterministic, so every engine
    produces the identical integer. Returned as DECIMAL(38,0): magnitudes
    whose scaled value would overflow the int64 floor path take the wide
    branch — there the double's ulp already exceeds 1, the value is an
    exact integer, and floor(+0.5) is the identity, so a plain decimal
    cast is the same number with no saturation.
    """
    p = F.lit(float(10 ** scale))
    narrow = F.floor(c * p + F.lit(0.5)).cast("decimal(38,0)")
    wide = (c * p).cast("decimal(38,0)")
    return F.when(F.abs(c) < F.lit(_cents_bound(scale)), narrow)         .otherwise(wide)


def sum_money(c: Column, scale: int = 2) -> Column:
    """Order-independent sum of a double column, exact to ``scale`` decimals.

    The integer cents accumulate in DECIMAL(38,0), not BIGINT: a 100 TB
    group of 6-dp cents overflows int64 (1e12 rows x 1e6 avg value x 1e6
    scale ~ 1e24), and DuckDB's SUM(BIGINT) is already 128-bit HUGEINT —
    matching widths keeps the cross-engine comparison exact AND the sum
    overflow-proof. Partial aggregation still applies (decimal sums are
    map-side combinable).
    """
    return (F.sum(cents(c, scale)) / F.lit(float(10 ** scale))) \
        .cast("double")


def avg_money(c: Column, scale: int = 2) -> Column:
    """Order-independent mean, exact integer sum divided by exact count."""
    return (
        F.sum(cents(c, scale)).cast("double")
        / F.count(c).cast("double")
        / F.lit(float(10 ** scale))
    ).cast("double")


def round_half_up(c: Column, n: int = 2) -> Column:
    """Engine-portable half-up rounding (see module docstring).

    Same overflow branch as ``cents``: beyond the int64-floor bound the
    double's ulp already exceeds 10^-n, so the value passes through
    unchanged instead of Spark's silent Floor saturation (which would
    return ~9.2e18/10^n for ANY huge input)."""
    p = float(10 ** n)
    rounded = (F.floor(c * F.lit(p) + F.lit(0.5)) / F.lit(p)).cast("double")
    return F.when(F.abs(c) < F.lit(_cents_bound(n)), rounded) \
            .otherwise(c.cast("double"))


def _cents_sql(expr: str, scale: int) -> str:
    """DuckDB twin of ``cents`` — identical per-row branch, HUGEINT typed."""
    p = 10 ** scale
    bound = repr(_cents_bound(scale))
    return (f"(CASE WHEN abs({expr}) < {bound} "
            f"THEN CAST(FLOOR(({expr}) * {p}.0 + 0.5) AS HUGEINT) "
            f"ELSE CAST(({expr}) * {p}.0 AS HUGEINT) END)")


def sum_money_sql(expr: str, scale: int = 2, alias: str | None = None) -> str:
    """The ANSI-SQL rendering of ``sum_money`` for DuckDB oracles."""
    p = 10 ** scale
    s = f"(SUM({_cents_sql(expr, scale)}) / {p}.0)"
    return f"CAST({s} AS DOUBLE)" + (f" AS {alias}" if alias else "")


def avg_money_sql(expr: str, scale: int = 2, alias: str | None = None) -> str:
    p = 10 ** scale
    s = (f"(CAST(SUM({_cents_sql(expr, scale)}) AS DOUBLE)"
         f" / CAST(COUNT({expr}) AS DOUBLE) / {p}.0)")
    return f"CAST({s} AS DOUBLE)" + (f" AS {alias}" if alias else "")
