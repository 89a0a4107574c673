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
