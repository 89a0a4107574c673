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
from pyspark.sql.types import TimestampNTZType

from dexscraper_spark.functions.exact import sum_money


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


def ohlc_partials(ticks: DataFrame, *, symbol_col: str = "symbol",
                  ts_col: str = "ts", price_col: str = "price",
                  qty_col: str | None = "qty", order_col: str | None = None,
                  tiebreak_col: str | None = None,
                  bucket_seconds: int = 300,
                  volume_scale: int = 6) -> DataFrame:
    """Mergeable per-bucket partial bars — the incremental-rollup STATE.

    Returns (symbol, bucket_ts, open, high, low, close, vol_cents,
    trades, min_ord, max_ord): every column is a fold in a commutative
    monoid (min/max/sum, plus min_by/max_by over the unique order key),
    so partials built from disjoint tick batches merge EXACTLY via
    :func:`ohlc_merge_partials` — merge(partials(A), partials(B)) is
    bit-identical to partials(A ∪ B). ``vol_cents`` carries the
    fixed-point integer volume (decimal, overflow-proof); divide only at
    the output boundary (:func:`ohlc_finalize`) so incremental rounds
    never re-round.

    Exactness PRECONDITION: the order key must be UNIQUE per tick within
    a (symbol, bucket). Pass ``order_col`` (a monotone event id) when the
    source has one; otherwise pass ``tiebreak_col`` to pin ties on the
    bare timestamp (order key becomes ``struct(ts, tiebreak)``, same as
    :func:`ohlc_windowed`). With neither, tied timestamps make
    open/close layout-dependent and void the merge guarantee.

    This is the table a nightly 100 TB rollup stores (date-partitioned
    on ``bucket_ts``): bar-count-sized — symbols × buckets, orders of
    magnitude below tick count — and updated per batch for the cost of
    aggregating the delta ticks plus a bar-sized merge shuffle
    (:func:`ohlc_update`), never a history rescan.
    """
    from dexscraper_spark.functions.exact import cents

    ts = F.col(ts_col)
    price = F.col(price_col)
    if order_col:
        order_key = F.col(order_col)
    else:
        order_key = F.struct(ts, F.col(tiebreak_col)) if tiebreak_col else ts
    qty = F.col(qty_col) if qty_col else price
    return (
        ticks.groupBy(F.col(symbol_col).alias("symbol"),
                      F.window(ts, f"{bucket_seconds} seconds").alias("w"))
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


def ohlc_merge_partials(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two partial-bar tables (same schema as
    :func:`ohlc_partials`) into one: union + one bar-sized re-aggregation.

    Exactness: high/low/trades/vol_cents are max/min/sum (associative,
    commutative); open pins to the partial holding the bucket's global
    min order key via ``min_by(open, min_ord)`` (order keys are unique,
    so the argmin is well-defined), symmetrically close. Merging is
    therefore order- and batching-insensitive — N nightly batches in any
    order produce the same bits as one full build (pinned by
    tests/test_ohlc_delta.py).

    Scale: the shuffle carries bar-count rows from each side. Partial
    aggregation applies (all merge functions are map-side combinable),
    and :func:`ohlc_update`'s ``touched_only`` modes prune the stored
    side to the touched keys or date partitions before it ever reaches
    this merge."""
    return (
        stored.unionByName(delta)
        .groupBy("symbol", "bucket_ts")
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
    )


def ohlc_update(stored: DataFrame, ticks: DataFrame, *,
                symbol_col: str = "symbol", ts_col: str = "ts",
                price_col: str = "price", qty_col: str | None = "qty",
                order_col: str | None = None,
                tiebreak_col: str | None = None,
                bucket_seconds: int = 300,
                volume_scale: int = 6,
                touched_only: bool | str = False) -> DataFrame:
    """Incrementally fold a batch of new ticks into a stored partial-bar
    table: aggregate the delta, merge bar-vs-bar.

    ``touched_only`` selects the output shape for three sink idioms:

    * ``False`` (default) — the complete new state, the frame to write
      as the next store (full overwrite to a new store path).
    * ``True`` / ``"bars"`` — ONLY the rewritten bars (stored side
      pruned left-semi on (symbol, bucket_ts)): the per-KEY upsert
      shape for a MERGE/upsert sink. NOT safe to write with dynamic
      partition overwrite — a partition holding any untouched bar would
      lose it.
    * ``"dates"`` — every bar (touched or not) of every calendar date
      the delta touches, stored side pruned by a broadcast semi-join on
      ``to_date(bucket_ts)``: exactly the content of the date
      partitions that must be rewritten, the safe input for
      ``spark.sql.sources.partitionOverwriteMode=dynamic`` over a
      store partitioned by ``to_date(bucket_ts)``. Untouched date
      partitions are never read or written.

    In both pruned modes the delta partials are persisted via the
    shared tracker (released by ``registry.clear_plan_cache()``): the
    pruning keys and the merge input are the same aggregate, and
    without the pin Spark executes the delta tick scan + aggregation
    twice — the dominant cost this operator exists to bound.

    Cost per batch: one scan + partial agg of the delta ticks, plus a
    bar-sized merge — independent of history depth. Late/out-of-order
    ticks need no special case: a tick landing in an old bucket merges
    into that bar exactly as if it had arrived first (monoid fold).
    """
    from dexscraper_spark.persist import tracked_persist

    delta = ohlc_partials(
        ticks, symbol_col=symbol_col, ts_col=ts_col, price_col=price_col,
        qty_col=qty_col, order_col=order_col, tiebreak_col=tiebreak_col,
        bucket_seconds=bucket_seconds, volume_scale=volume_scale)
    if touched_only:
        delta = tracked_persist(delta)
        if touched_only == "dates":
            dates = delta.select(
                F.to_date("bucket_ts").alias("__d")).distinct()
            stored = stored.join(
                F.broadcast(dates),
                F.to_date(stored["bucket_ts"]) == F.col("__d"),
                "left_semi")
        else:
            keys = delta.select("symbol", "bucket_ts").distinct()
            stored = stored.join(keys, ["symbol", "bucket_ts"],
                                 "left_semi")
    return ohlc_merge_partials(stored, delta)


def ohlc_finalize(partials: DataFrame, *, frame=None,
                  volume_scale: int = 6) -> DataFrame:
    """Project partial bars to the output vocabulary: (symbol, bucket_ts,
    open, high, low, close, volume, trades), dividing the exact integer
    ``vol_cents`` once. ``frame`` (a str tag or a Column) prepends the
    frame column used by the multi-frame cascade."""
    if frame is None:
        cols = []
    elif isinstance(frame, str):
        cols = [F.lit(frame).alias("frame")]
    else:
        cols = [frame.alias("frame")]
    return partials.select(
        *cols, "symbol", "bucket_ts", "open", "high", "low", "close",
        (F.col("vol_cents") / F.lit(float(10 ** volume_scale)))
        .cast("double").alias("volume"),
        "trades",
    )


def ohlc_frames_from_partials(fine: DataFrame, *,
                              bucket_seconds: int,
                              frames: tuple[tuple[str, int], ...],
                              volume_scale: int = 6) -> DataFrame:
    """Roll the multi-frame cascade up from a finest-level partial-bar
    table (freshly built or incrementally maintained — the cascade is a
    pure function of the fine partials). ``frames[0]`` must name the
    fine level's own width; coarser widths must be multiples of it.

    Single-shuffle shape: each fine bar explodes into its |frames|
    (frame, coarse_bucket) assignments (a map-side Generate — coarse
    bucket is epoch-aligned floor arithmetic, identical to ``window``'s
    tumbling alignment), then ONE groupBy(frame, symbol, bucket)
    performs every rollup. Versus one groupBy + union branch per frame,
    that is one shuffle of |frames|·bars rows instead of |frames|−1
    bar-sized shuffles plus a persisted fine level feeding a
    multi-branch union — fewer stages, no persist barrier, and the same
    bit-exact monoid folds (for the finest frame each group holds
    exactly one partial, for which every fold is the identity)."""
    if frames[0][1] != bucket_seconds:
        raise ValueError(
            f"frames[0] width {frames[0][1]}s != fine bucket "
            f"{bucket_seconds}s")
    for _, secs in frames[1:]:
        if secs % bucket_seconds != 0:
            raise ValueError(
                f"frame {secs}s is not a multiple of the finest "
                f"{bucket_seconds}s")
    names = [name for name, _ in frames]
    if len(set(names)) != len(names):
        # duplicate tags would FOLD two widths into one groupBy key —
        # double-counted bars wherever their bucket starts coincide
        raise ValueError(f"duplicate frame names: {names}")
    if isinstance(fine.schema["bucket_ts"].dataType, TimestampNTZType):
        # epoch arithmetic on an NTZ value goes through the session tz
        # and diverges from window()'s wall-clock alignment; the engine's
        # loaders always cast to session-tz TimestampType — hold callers
        # to the same contract instead of silently shifting coarse bars
        raise TypeError(
            "bucket_ts is TIMESTAMP_NTZ: cast it to TimestampType "
            "(see sources.tables.load_events) before rolling up")
    specs = F.array(*[
        F.struct(F.lit(name).alias("frame"),
                 F.lit(secs).cast("long").alias("secs"))
        for name, secs in frames])
    exploded = (
        fine.select("*", F.explode(specs).alias("__fs"))
        .select(
            F.col("__fs.frame").alias("frame"), "symbol",
            # cast-to-long = exact epoch seconds of the instant,
            # session-tz-independent (verified equal to window()'s
            # tumbling alignment under non-UTC sessions)
            F.timestamp_seconds(
                F.floor(F.col("bucket_ts").cast("long")
                        / F.col("__fs.secs")).cast("long")
                * F.col("__fs.secs")).alias("bucket_ts"),
            "open", "high", "low", "close", "vol_cents", "trades",
            "min_ord", "max_ord")
    )
    rolled = (
        exploded.groupBy("frame", "symbol", "bucket_ts")
        .agg(
            F.min_by(F.col("open"), F.col("min_ord")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by(F.col("close"), F.col("max_ord")).alias("close"),
            F.sum("vol_cents").alias("vol_cents"),
            F.sum("trades").alias("trades"),
        )
    )
    return ohlc_finalize(rolled, frame=F.col("frame"),
                         volume_scale=volume_scale)


def ohlc_windowed_frames(ticks: DataFrame, *, symbol_col: str = "symbol",
                         ts_col: str = "ts", price_col: str = "price",
                         qty_col: str | None = "qty",
                         order_col: str | None = None,
                         tiebreak_col: str | None = None,
                         frames: tuple[tuple[str, int], ...] = (
                             ("m5", 300), ("h1", 3600),
                             ("h6", 21600), ("h24", 86400)),
                         volume_scale: int = 6) -> DataFrame:
    """Hierarchical multi-frame OHLC (hypertable-style rollup cascade).

    The raw ticks are aggregated ONCE at the finest frame; every coarser
    frame rolls up from the finest level, which at 100 TB means one scan
    + one tick-volume shuffle total, then one shuffle over bar counts
    (orders of magnitude smaller) — instead of one full scan/shuffle per
    frame. Each ``frames`` entry is (name, seconds); every coarser width
    must be a multiple of the finest.

    Bit-exactness of the cascade vs direct aggregation at each width:
    * open/close pin to the min/max ``order_col`` key; the bar holding the
      coarse bucket's min order key contributes its open via
      ``min_by(open, min_ord)`` — identical to the direct ``min_by`` over
      raw ticks (order keys are unique).
    * high/low/trades are max/min/sum — associative.
    * volume carries the INTEGER fixed-point sum (``cents``) between
      levels and divides only at the output boundary, so per-level double
      division never re-rounds.

    Returns frame-tagged bars: (frame, symbol, bucket_ts, open, high,
    low, close, volume, trades). Composition of the incremental
    primitives: :func:`ohlc_partials` at the finest width →
    :func:`ohlc_frames_from_partials` — so a stored, incrementally
    maintained partial table (:func:`ohlc_update`) yields the identical
    cascade by calling the second half directly.
    """
    fine = ohlc_partials(
        ticks, symbol_col=symbol_col, ts_col=ts_col, price_col=price_col,
        qty_col=qty_col, order_col=order_col, tiebreak_col=tiebreak_col,
        bucket_seconds=frames[0][1], volume_scale=volume_scale)
    return ohlc_frames_from_partials(
        fine, bucket_seconds=frames[0][1], frames=frames,
        volume_scale=volume_scale)
