"""Streaming pipeline tests: file-source micro-batches through decode →
OHLC → foreachBatch sink (availableNow trigger = bounded run)."""

from __future__ import annotations

import glob
import os
import time

from dexscraper_spark.schemas import RAW_MESSAGES
from dexscraper_spark.sources.binary import make_frame, sample_pairs


def _write_frame_parquet(spark, path: str, n_frames: int = 3):
    frames = [(i, make_frame(sample_pairs(4, seed=i))) for i in range(n_frames)]
    spark.createDataFrame(frames, schema=RAW_MESSAGES) \
        .write.mode("overwrite").parquet(path)


def test_stream_decode_foreach_batch(spark, tmp_path):
    from dexscraper_spark.streaming.pipeline import decoded_stream, run_foreach_batch

    src = str(tmp_path / "frames")
    _write_frame_parquet(spark, src)

    raw = (spark.readStream.schema(RAW_MESSAGES).parquet(src))
    decoded = decoded_stream(raw)

    seen: list[tuple[int, int]] = []

    def sink(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))

    q = run_foreach_batch(decoded, sink, once=True,
                          checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert sum(n for _, n in seen) == 12  # 3 frames × 4 pairs


def test_streaming_ohlc_complete_mode(spark, tmp_path):
    from dexscraper_spark.config import Timeframe
    from dexscraper_spark.streaming.pipeline import (
        decoded_stream, streaming_ohlc)

    src = str(tmp_path / "frames2")
    _write_frame_parquet(spark, src, n_frames=2)
    raw = spark.readStream.schema(RAW_MESSAGES).parquet(src)
    bars = streaming_ohlc(decoded_stream(raw), timeframe=Timeframe.M5)

    q = (bars.writeStream.format("memory").queryName("bars_mem")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM bars_mem").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["trades"] >= 1
