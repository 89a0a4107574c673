"""Incremental OHLC rollup maintenance — the continuous-aggregate analog
of delta curation: merge(partials(A), partials(B)) must be bit-identical
to partials(A ∪ B), in any batching and any order, so a nightly pipeline
folds each day's ticks into a stored bar table without a history rescan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dexscraper_spark.operators.ohlc import (
    ohlc_frames_from_partials, ohlc_merge_partials, ohlc_partials,
    ohlc_update, ohlc_windowed_frames)

SF = "/root/testdata/sf0.001"
KW = dict(symbol_col="event_type", ts_col="ts", price_col="value",
          qty_col="value", order_col="event_id")


def _events(spark):
    from dexscraper_spark.sources.tables import load_table
    return load_table(spark, SF, "events")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_of_time_split_equals_full_build(spark):
    """The nightly shape: history up to a cutoff, then the new day."""
    ev = _events(spark)
    cut = ev.selectExpr(
        "percentile(unix_timestamp(ts), 0.9) p").first()["p"]
    old = ev.filter(F.unix_timestamp("ts") <= cut)
    new = ev.filter(F.unix_timestamp("ts") > cut)
    assert old.count() > 0 and new.count() > 0

    full = ohlc_partials(ev, bucket_seconds=300, **KW)
    merged = ohlc_merge_partials(ohlc_partials(old, bucket_seconds=300, **KW),
                                 ohlc_partials(new, bucket_seconds=300, **KW))
    assert _rows(merged) == _rows(full)


def test_merge_is_batching_and_order_insensitive(spark):
    """Three interleaved batches (event_id mod 3 — every bucket is
    touched by every batch, maximal overlap), merged in a different
    order than they arrived: same bits as the one-shot build."""
    ev = _events(spark)
    parts = [ohlc_partials(ev.filter(F.col("event_id") % 3 == i),
                           bucket_seconds=300, **KW) for i in range(3)]
    merged = ohlc_merge_partials(ohlc_merge_partials(parts[2], parts[0]),
                                 parts[1])
    assert _rows(merged) == _rows(ohlc_partials(ev, bucket_seconds=300, **KW))


def test_update_touched_only_matches_full_merge(spark):
    """touched_only returns exactly the rewritten bars: replacing those
    keys in the stored table reconstructs the full new state."""
    ev = _events(spark)
    med = ev.selectExpr(
        "percentile(unix_timestamp(ts), 0.5) p").first()["p"]
    old, new = (ev.filter(F.unix_timestamp("ts") <= med),
                ev.filter(F.unix_timestamp("ts") > med))
    stored = ohlc_partials(old, bucket_seconds=3600, **KW)

    full = ohlc_update(stored, new, bucket_seconds=3600, **KW)
    touched = ohlc_update(stored, new, bucket_seconds=3600,
                          touched_only=True, **KW)
    keys = [(r["symbol"], r["bucket_ts"]) for r in
            touched.select("symbol", "bucket_ts").collect()]
    untouched = stored.join(
        touched.select("symbol", "bucket_ts"),
        ["symbol", "bucket_ts"], "left_anti")
    assert len(keys) == len(set(keys))  # one row per touched bar
    assert _rows(untouched.unionByName(touched)) == _rows(full)
    # pruning is real: some history bars were not touched by the delta
    assert untouched.count() > 0


def test_update_touched_dates_is_partition_overwrite_safe(spark):
    """touched_only='dates' must return EVERY bar of every touched
    calendar date — including bars the delta didn't touch — so a
    dynamic-partition overwrite of a to_date(bucket_ts)-partitioned
    store rewrites those dates without losing sibling bars. (The 'bars'
    mode would drop them: it's the upsert shape, pinned above.) Uses a
    late batch that lands on ONE old date — the review's data-loss
    scenario."""
    ev = _events(spark)
    day0 = ev.selectExpr("min(to_date(ts)) d").first()["d"]
    late = ev.filter((F.to_date("ts") == day0) & (F.col("event_id") % 9 == 0))
    ontime = ev.exceptAll(late)
    assert late.count() > 0
    stored = ohlc_partials(ontime, bucket_seconds=300, **KW)

    dated = ohlc_update(stored, late, bucket_seconds=300,
                        touched_only="dates", **KW)
    # only day0 is touched — every returned bar is on that date...
    assert dated.filter(F.to_date("bucket_ts") != F.lit(day0)).count() == 0
    # ...and simulating the dynamic partition overwrite (replace all
    # stored bars of touched dates with `dated`) reconstructs the truth
    untouched_parts = stored.filter(F.to_date("bucket_ts") != F.lit(day0))
    assert _rows(untouched_parts.unionByName(dated)) \
        == _rows(ohlc_partials(ev, bucket_seconds=300, **KW))


def test_tiebreak_col_pins_tied_timestamps(spark):
    """Ties on the bare timestamp void the merge guarantee; with
    tiebreak_col the order key is struct(ts, tiebreak) — unique — and
    split-vs-full equality holds even when every tick in a bucket shares
    one ts."""
    rows = [(i, "AAA", 100.0 + (i % 13), 1.0, 1000 + (i % 4) * 300)
            for i in range(64)]
    ticks = spark.createDataFrame(
        rows, "tick_id long, symbol string, price double, qty double, sec long"
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    kw = dict(symbol_col="symbol", ts_col="ts", price_col="price",
              qty_col="qty", tiebreak_col="tick_id")
    full = ohlc_partials(ticks, bucket_seconds=300, **kw)
    a = ticks.filter(F.col("tick_id") % 2 == 0)
    b = ticks.filter(F.col("tick_id") % 2 == 1)
    merged = ohlc_merge_partials(ohlc_partials(a, bucket_seconds=300, **kw),
                                 ohlc_partials(b, bucket_seconds=300, **kw))
    assert _rows(merged) == _rows(full)
    # the pinned open/close are the min/max tick_id's prices
    r = {(x["symbol"], x["bucket_ts"]): x for x in full.collect()}
    for x in merged.collect():
        assert x["open"] == r[(x["symbol"], x["bucket_ts"])]["open"]


def test_cascade_rejects_duplicate_frame_names_and_ntz(spark):
    import pytest
    ev = _events(spark)
    p = ohlc_partials(ev, bucket_seconds=300, **KW)
    with pytest.raises(ValueError, match="duplicate frame names"):
        ohlc_frames_from_partials(
            p, bucket_seconds=300,
            frames=(("m5", 300), ("m5", 3600)))
    ntz = p.withColumn("bucket_ts",
                       F.col("bucket_ts").cast("timestamp_ntz"))
    with pytest.raises(TypeError, match="TIMESTAMP_NTZ"):
        ohlc_frames_from_partials(
            ntz, bucket_seconds=300, frames=(("m5", 300),))


def test_update_touched_modes_release_their_persist(spark):
    import dexscraper_spark.persist as P
    from dexscraper_spark.plans.registry import clear_plan_cache

    clear_plan_cache()
    ev = _events(spark)
    stored = ohlc_partials(ev, bucket_seconds=300, **KW)
    ohlc_update(stored, ev.limit(50), bucket_seconds=300,
                touched_only=True, **KW).count()
    assert len(P._TRACKED) >= 1  # the delta partials are pinned once...
    clear_plan_cache()           # ...and the one switch releases them
    assert P._TRACKED == []


def test_out_of_order_late_batch_merges_exactly(spark):
    """A late batch landing entirely in OLD buckets (the stream-replay /
    backfill case) folds in as if it had arrived first."""
    ev = _events(spark)
    late = ev.filter(F.col("event_id") % 7 == 0)       # spread over all time
    ontime = ev.filter(F.col("event_id") % 7 != 0)
    stored = ohlc_partials(ontime, bucket_seconds=300, **KW)
    upd = ohlc_update(stored, late, bucket_seconds=300, **KW)
    assert _rows(upd) == _rows(ohlc_partials(ev, bucket_seconds=300, **KW))


def test_empty_delta_is_identity(spark):
    ev = _events(spark)
    stored = ohlc_partials(ev, bucket_seconds=300, **KW)
    empty = ev.filter(F.lit(False))
    assert _rows(ohlc_update(stored, empty, bucket_seconds=300, **KW)) \
        == _rows(stored)


def test_cascade_from_incremental_state_equals_full_cascade(spark):
    """End to end: maintain the fine partial table incrementally, then
    roll the full m5/h1/h6/h24 cascade from it — identical to the
    one-shot ohlc_windowed_frames over all ticks (which the DuckDB
    oracle in turn proves equal to direct per-frame aggregation)."""
    ev = _events(spark)
    cut = ev.selectExpr(
        "percentile(unix_timestamp(ts), 0.8) p").first()["p"]
    old, new = (ev.filter(F.unix_timestamp("ts") <= cut),
                ev.filter(F.unix_timestamp("ts") > cut))
    frames = (("m5", 300), ("h1", 3600), ("h6", 21600), ("h24", 86400))

    state = ohlc_update(ohlc_partials(old, bucket_seconds=300, **KW),
                        new, bucket_seconds=300, **KW)
    inc = ohlc_frames_from_partials(state, bucket_seconds=300,
                                    frames=frames)
    full = ohlc_windowed_frames(ev, frames=frames, **KW)
    assert _rows(inc) == _rows(full)


def test_frames_from_partials_validates_widths(spark):
    import pytest
    ev = _events(spark)
    p = ohlc_partials(ev, bucket_seconds=300, **KW)
    with pytest.raises(ValueError):
        ohlc_frames_from_partials(p, bucket_seconds=300,
                                  frames=(("m5", 600),))
    with pytest.raises(ValueError):
        ohlc_frames_from_partials(
            p, bucket_seconds=300,
            frames=(("m5", 300), ("odd", 450)))
