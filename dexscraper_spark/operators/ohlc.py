"""OHLC bar derivation (SURVEY §2.5 A5) — the engine's flagship aggregation.

Two forms, deliberately both kept (SURVEY §7.4 risk 3):

* ``ohlc_windowed`` — the TRUE form the reference cannot compute: tumbling
  event-time windows with first/max/min/last/sum/count per (symbol, window).
* ``ohlc_snapshot`` — the reference's degenerate per-snapshot projection
  (dexscraper/models.py:253-264): open=close=price, high=1.02·p, low=0.98·p,
  volume=volume_24h, trades=int(volume/1000) when null (models.py:74-77).

Determinism: "first/last price in window" is ill-defined under ties on ts,
so open/close are pinned with ``min_by``/``max_by`` over the composite key
(ts, tiebreak_id) — a total order, identical on any cluster layout. This is
also the scale-correct plan: min_by/max_by/min/max/sum are all partial-
aggregatable, so the map side combines before the shuffle, and the shuffle
carries one row per (symbol, window) per partition — at 100 TB the shuffle
volume is proportional to group count, not row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dexscraper_spark.functions.exact import sum_money

from dexscraper_spark.persist import tracked_persist


def ohlc_windowed(ticks: DataFrame, *, symbol_col: str = "symbol",
                  ts_col: str = "ts", price_col: str = "price",
                  qty_col: str | None = "qty", tiebreak_col: str | None = None,
                  order_col: str | None = None, duration: str = "5 minutes",
                  volume_scale: int = 6) -> DataFrame:
    """True windowed OHLC: groupBy(symbol, window(ts, duration)).

    Returns (symbol, bucket_start timestamp, open, high, low, close,
    volume, trades). ``volume`` uses order-independent fixed-point summing
    (see functions.exact) so results are bit-identical at any parallelism.
    ``order_col`` overrides the open/close ordering key entirely (use a
    monotone event id when the source guarantees id order == time order —
    avoids timestamp-precision ties across engines).
    """
    ts = F.col(ts_col)
    price = F.col(price_col)
    if order_col:
        order_key = F.col(order_col)
    else:
        order_key = F.struct(ts, F.col(tiebreak_col)) if tiebreak_col else ts
    w = F.window(ts, duration)
    # qty_col=None → volume is the NOTIONAL sum of tick prices (each tick
    # counted as one unit) — a documented proxy for quantity-less tick
    # sources, not an accident; pass qty_col for real traded volume
    vol = sum_money(F.col(qty_col), volume_scale) if qty_col else sum_money(price, volume_scale)
    return (
        ticks.groupBy(F.col(symbol_col).alias("symbol"), w.alias("w"))
        .agg(
            F.min_by(price, order_key).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(price, order_key).alias("close"),
            vol.alias("volume"),
            F.count(F.lit(1)).alias("trades"),
        )
        .select("symbol", F.col("w.start").alias("bucket_ts"),
                "open", "high", "low", "close", "volume", "trades")
    )


def ohlc_snapshot(tokens: DataFrame, *, price_col: str = "price",
                  volume_col: str = "volume_24h", ts_col: str = "ts",
                  symbol_col: str = "symbol",
                  carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Degenerate snapshot OHLC (reference-compatibility projection).

    models.py:253-264: o=c=price, h=1.02·p, l=0.98·p; trades estimated as
    int(volume/1000) (models.py:74-77). Pure narrow projection — no shuffle.
    ``carry_cols`` pass through unchanged (e.g. a row id).
    """
    p = F.col(price_col)
    v = F.col(volume_col)
    return tokens.select(
        *[F.col(c) for c in carry_cols],
        F.col(symbol_col).alias("symbol"),
        F.col(ts_col).alias("ts"),
        p.alias("open"),
        (p * 1.02).alias("high"),
        (p * 0.98).alias("low"),
        p.alias("close"),
        v.alias("volume"),
        F.floor(v / 1000.0).cast("long").alias("trades"),
    )


def ohlc_windowed_frames(ticks: DataFrame, *, symbol_col: str = "symbol",
                         ts_col: str = "ts", price_col: str = "price",
                         qty_col: str | None = "qty",
                         order_col: str | None = None,
                         frames: tuple[tuple[str, int], ...] = (
                             ("m5", 300), ("h1", 3600),
                             ("h6", 21600), ("h24", 86400)),
                         volume_scale: int = 6) -> DataFrame:
    """Hierarchical multi-frame OHLC (hypertable-style rollup cascade).

    The raw ticks are aggregated ONCE at the finest frame; every coarser
    frame rolls up from the persisted finest level, which at 100 TB means
    one scan + one tick-volume shuffle total, then shuffles over bar
    counts (orders of magnitude smaller) — instead of one full
    scan/shuffle per frame. Each ``frames`` entry is (name, seconds);
    every coarser width must be a multiple of the finest.

    Bit-exactness of the cascade vs direct aggregation at each width:
    * open/close pin to the min/max ``order_col`` key; the bar holding the
      coarse bucket's min order key contributes its open via
      ``min_by(open, min_ord)`` — identical to the direct ``min_by`` over
      raw ticks (order keys are unique).
    * high/low/trades are max/min/sum — associative.
    * volume carries the INTEGER fixed-point sum (``cents``) between
      levels and divides only at the output boundary, so per-level double
      division never re-rounds.

    Only the finest level is persisted (it feeds its own output plus
    every coarser rollup); coarser levels are each consumed exactly once,
    so they stay pure lineage — one cached bar frame per call, not one
    per frame width.

    Returns frame-tagged bars: (frame, symbol, bucket_ts, open, high,
    low, close, volume, trades).
    """
    from dexscraper_spark.functions.exact import cents

    for _, secs in frames[1:]:
        if secs % frames[0][1] != 0:
            raise ValueError(
                f"frame {secs}s is not a multiple of the finest "
                f"{frames[0][1]}s")

    ts = F.col(ts_col)
    price = F.col(price_col)
    order_key = F.col(order_col) if order_col else ts
    qty = F.col(qty_col) if qty_col else price

    name0, secs0 = frames[0]
    fine = (
        ticks.groupBy(F.col(symbol_col).alias("symbol"),
                      F.window(ts, f"{secs0} seconds").alias("w"))
        .agg(
            F.min_by(price, order_key).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(price, order_key).alias("close"),
            F.sum(cents(qty, volume_scale)).alias("vol_cents"),
            F.count(F.lit(1)).alias("trades"),
            F.min(order_key).alias("min_ord"),
            F.max(order_key).alias("max_ord"),
        )
        .select("symbol", F.col("w.start").alias("bucket_ts"),
                "open", "high", "low", "close", "vol_cents", "trades",
                "min_ord", "max_ord")
    )
    # feeds its own output plus every coarser rollup; tracked so
    # clear_plan_cache() can release it on refresh
    fine = tracked_persist(fine)

    def out(level_df: DataFrame, name: str) -> DataFrame:
        return level_df.select(
            F.lit(name).alias("frame"), "symbol", "bucket_ts",
            "open", "high", "low", "close",
            (F.col("vol_cents") / F.lit(float(10 ** volume_scale)))
            .cast("double").alias("volume"),
            "trades",
        )

    result = out(fine, name0)
    for name, secs in frames[1:]:
        rolled = (
            fine.groupBy("symbol",
                         F.window(F.col("bucket_ts"),
                                  f"{secs} seconds").alias("w"))
            .agg(
                F.min_by(F.col("open"), F.col("min_ord")).alias("open"),
                F.max("high").alias("high"),
                F.min("low").alias("low"),
                F.max_by(F.col("close"), F.col("max_ord")).alias("close"),
                F.sum("vol_cents").alias("vol_cents"),
                F.sum("trades").alias("trades"),
                F.min("min_ord").alias("min_ord"),
                F.max("max_ord").alias("max_ord"),
            )
            .select("symbol", F.col("w.start").alias("bucket_ts"),
                    "open", "high", "low", "close", "vol_cents", "trades",
                    "min_ord", "max_ord")
        )
        result = result.unionByName(out(rolled, name))
    return result
