"""S1 fleet leg: the partitioned ``DataSourceStreamReader`` — one socket
subscription per partition, opened executor-side, with per-shard seq
offsets (reference envelope scraper.py:177-246, sharded N ways). The
global contract under test: across ≥2 shards with mid-stream drops and a
full kill/restart, every frame lands exactly once — no dupes, no gaps —
and the shard reads run in distinct scan partitions."""

from __future__ import annotations

import json
import threading
import time

import pytest

from dexscraper_spark.sources.binary import make_frame, sample_pairs
from dexscraper_spark.sources.socket_source import (
    SHARD_STRIDE,
    FrameSocketServer,
    PartitionedSocketStreamReader,
    SocketShardPartition,
    query_latest_seq,
)


# r13 (VERDICT #6): multi-second delta/maintenance integration lane — the
# full-suite wall time (52 min measured) no longer fits the driver's
# verify budget, and this module is the dominant cost. The default lane
# (`-m "not slow"`, pyproject addopts) keeps every oracle-coverage and
# unit test; run `make test-all` for the complete suite.
pytestmark = pytest.mark.slow


def _payloads(n, pairs=4, seed_base=0):
    return [make_frame(sample_pairs(pairs, seed=(seed_base + i) % 13))
            for i in range(n)]


def _reader(endpoints, **opts):
    base = {"endpoints": ",".join(f"127.0.0.1:{p}" for p in endpoints),
            "frames_per_batch": "3", "connect_retries": "10",
            "backoff_base_s": "0.02", "backoff_cap_s": "0.2"}
    base.update({k: str(v) for k, v in opts.items()})
    return PartitionedSocketStreamReader(base)


def test_query_latest_seq_tracks_live_history():
    srv = FrameSocketServer(_payloads(5)).start()
    try:
        assert query_latest_seq("127.0.0.1", srv.port) == 5
        srv.append(_payloads(1)[0])
        srv.append(_payloads(1)[0])
        assert query_latest_seq("127.0.0.1", srv.port) == 7
    finally:
        srv.kill()


def test_latest_offset_rate_limits_and_never_regresses():
    """Per poll each shard advances at most frames_per_batch; a shard
    whose reported history shrinks (restart with shorter buffer) must
    not rewind the offset log."""
    a = FrameSocketServer(_payloads(10)).start()
    b = FrameSocketServer(_payloads(2)).start()
    try:
        r = _reader([a.port, b.port], frames_per_batch=3)
        # first poll after (re)start: servers' truth, uncapped
        assert r.latestOffset() == {"0": 10, "1": 2}
        b.append(_payloads(1)[0])
        # subsequent polls: advance <= frames_per_batch per shard...
        assert r.latestOffset() == {"0": 10, "1": 3}
        # ...and never move backwards, even if a shard reports less
        b.payloads.clear()
        assert r.latestOffset() == {"0": 10, "1": 3}
    finally:
        a.kill()
        b.kill()


def test_latest_offset_caps_at_max_frames():
    srv = FrameSocketServer(_payloads(9)).start()
    try:
        r = _reader([srv.port], max_frames=4)
        assert r.latestOffset() == {"0": 4}
        assert r.latestOffset() == {"0": 4}  # drained: stays put
    finally:
        srv.kill()


def test_partitions_one_per_advancing_shard():
    r = _reader([7001, 7002, 7003])
    parts = r.partitions({"0": 2, "1": 5, "2": 0},
                         {"0": 4, "1": 5, "2": 1})
    assert [(p.shard, p.port, p.start_seq, p.end_seq) for p in parts] == [
        (0, 7001, 2, 4), (2, 7003, 0, 1)]  # shard 1 empty -> no split
    assert all(isinstance(p, SocketShardPartition) for p in parts)
    # empty range (start == end) plans zero partitions
    assert r.partitions({"0": 3, "1": 1, "2": 0},
                        {"0": 3, "1": 1, "2": 0}) == []


def test_read_replay_of_uncovered_range_fails_loudly():
    srv = FrameSocketServer(_payloads(3)).start()
    try:
        r = _reader([srv.port])
        part = SocketShardPartition(0, "127.0.0.1", srv.port, 1, 9)
        with pytest.raises(ConnectionError, match="history no longer covers"):
            list(r.read(part))
    finally:
        srv.kill()


def test_spark_fleet_two_shards_exactly_once_with_drops(spark, tmp_path):
    """End to end through the dexframes format: two shard servers, BOTH
    flaky (every connection drops after 2 frames, no END marker), with
    subscription-time filter pushdown. The drained sink must hold each
    surviving record exactly once, attributed to its shard via the
    msg_id stride, and the two shards must be read in distinct scan
    partitions (spark_partition_id) — the executor-side-parallelism
    claim, not just the result."""
    from pyspark.sql import functions as F

    from dexscraper_spark.sources.frame_source import register_frame_source

    register_frame_source(spark)
    a = FrameSocketServer(_payloads(6, seed_base=0),
                          fail_after_frames=2).start()
    b = FrameSocketServer(_payloads(4, seed_base=5),
                          fail_after_frames=2).start()
    try:
        q = (spark.readStream.format("dexframes")
             .option("endpoints", f"127.0.0.1:{a.port},127.0.0.1:{b.port}")
             .option("frames_per_batch", "3")
             .option("max_frames", "6")  # per shard; shard b drains at 4
             .option("backoff_base_s", "0.02")
             .option("filters_json", json.dumps({"chain_ids": ["solana"]}))
             .load()
             .withColumn("pid", F.spark_partition_id())
             .writeStream.format("memory").queryName("fleet_mem")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(180)
        got = (spark.table("fleet_mem")
               .groupBy("msg_id", "record_position")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.max("chain").alias("chain"),
                    F.count_distinct("pid").alias("npid")).collect())
        seqs = {0: set(), 1: set()}
        for row in got:
            seqs[row["msg_id"] // SHARD_STRIDE].add(
                row["msg_id"] % SHARD_STRIDE)
            assert row["n"] == 1            # exactly once globally
            assert row["npid"] == 1
            assert row["chain"] == "solana"  # pushdown applied in-scan
        assert seqs[0] == set(range(6))      # no gaps on either shard
        assert seqs[1] == set(range(4))
        # shard reads happened in >1 scan partition (executor-side split)
        pid_by_shard = (spark.table("fleet_mem")
                        .groupBy((F.col("msg_id") / SHARD_STRIDE).cast("long")
                                 .alias("shard"))
                        .agg(F.collect_set("pid").alias("pids")).collect())
        all_pids = {p for r in pid_by_shard for p in r["pids"]}
        assert len(all_pids) >= 2
    finally:
        a.kill()
        b.kill()


def test_spark_fleet_shard_killed_and_restarted_mid_query(spark, tmp_path):
    """The VERDICT r6 ask-#1 scenario at fleet scope: while the query
    drains, one shard's server is KILLED mid-stream and restarted on the
    same port. The executor-side fetch loop backs off, reconnects and
    resumes from the next unconsumed seq; the other shard is unaffected;
    the global result stays exactly-once."""
    from pyspark.sql import functions as F

    from dexscraper_spark.sources.frame_source import register_frame_source

    register_frame_source(spark)
    steady = FrameSocketServer(_payloads(5)).start()
    victim_payloads = _payloads(5, seed_base=7)
    victim = FrameSocketServer(victim_payloads, fail_after_frames=2).start()
    vport = victim.port
    restarted = {}

    def kill_then_restart():
        time.sleep(0.1)  # let the first connections land
        victim.kill()
        time.sleep(0.3)  # readers sit in their backoff loop meanwhile
        for _ in range(100):  # rebinding races lingering conns briefly
            try:
                restarted["srv"] = FrameSocketServer(
                    victim_payloads, port=vport).start()
                return
            except OSError:
                time.sleep(0.05)

    t = threading.Thread(target=kill_then_restart)
    t.start()
    try:
        q = (spark.readStream.format("dexframes")
             .option("endpoints",
                     f"127.0.0.1:{steady.port},127.0.0.1:{vport}")
             .option("frames_per_batch", "5")
             .option("max_frames", "5")
             .option("connect_retries", "20")
             .option("backoff_base_s", "0.02")
             .load()
             .writeStream.format("memory").queryName("fleet_kill_mem")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(180)
        got = (spark.table("fleet_kill_mem")
               .groupBy("msg_id", "record_position")
               .agg(F.count(F.lit(1)).alias("n")).collect())
        seqs = {0: set(), 1: set()}
        for row in got:
            seqs[row["msg_id"] // SHARD_STRIDE].add(
                row["msg_id"] % SHARD_STRIDE)
            assert row["n"] == 1
        assert seqs[0] == set(range(5))
        assert seqs[1] == set(range(5))
    finally:
        t.join()
        if "srv" in restarted:
            restarted["srv"].kill()
        steady.kill()


def test_fleet_live_tail_across_micro_batches(spark, tmp_path):
    """Frames appended between micro-batches are picked up by later
    offsets: run availableNow to drain history, append, run a second
    availableNow from the same checkpoint — only the new frames arrive
    (offset log carries across restarts, per-shard). File sink: the
    memory sink does not support checkpoint recovery."""
    from dexscraper_spark.sources.frame_source import register_frame_source

    register_frame_source(spark)
    srv = FrameSocketServer(_payloads(3)).start()
    out = str(tmp_path / "out")
    try:
        def drain():
            q = (spark.readStream.format("dexframes")
                 .option("endpoints", f"127.0.0.1:{srv.port}")
                 .option("frames_per_batch", "2")
                 .option("backoff_base_s", "0.02")
                 .load()
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", str(tmp_path / "ckpt"))
                 .trigger(availableNow=True).start())
            assert q.awaitTermination(120)
            return {r["msg_id"] % SHARD_STRIDE for r in spark.read
                    .parquet(out).select("msg_id").distinct().collect()}

        assert drain() == {0, 1, 2}
        for p in _payloads(2, seed_base=3):
            srv.append(p)
        # the file sink accumulates; exactly-once means the second drain
        # ADDS only seqs 3 and 4, each frame still appearing once
        assert drain() == {0, 1, 2, 3, 4}
        from pyspark.sql import functions as F
        per_frame = (spark.read.parquet(out)
                     .groupBy("msg_id", "record_position")
                     .agg(F.count(F.lit(1)).alias("n")).collect())
        assert all(r["n"] == 1 for r in per_frame)
    finally:
        srv.kill()


def test_spark_fleet_eight_shards(spark, tmp_path):
    """Width check: 8 shard servers with different history lengths drain
    exactly-once in one availableNow pass — the per-shard offset map and
    partition planning hold beyond the 2-shard fixtures."""
    from pyspark.sql import functions as F

    from dexscraper_spark.sources.frame_source import register_frame_source

    register_frame_source(spark)
    sizes = [3, 5, 2, 4, 6, 1, 3, 2]
    servers = [FrameSocketServer(_payloads(n, seed_base=i)).start()
               for i, n in enumerate(sizes)]
    try:
        eps = ",".join(f"127.0.0.1:{s.port}" for s in servers)
        q = (spark.readStream.format("dexframes")
             .option("endpoints", eps)
             .option("frames_per_batch", "6")
             .option("max_frames", "6")
             .option("backoff_base_s", "0.02")
             .load()
             .writeStream.format("memory").queryName("fleet8_mem")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(240)
        got = (spark.table("fleet8_mem")
               .groupBy("msg_id", "record_position")
               .agg(F.count(F.lit(1)).alias("n")).collect())
        seqs = {i: set() for i in range(8)}
        for r in got:
            assert r["n"] == 1
            seqs[r["msg_id"] // SHARD_STRIDE].add(r["msg_id"] % SHARD_STRIDE)
        for i, n in enumerate(sizes):
            assert seqs[i] == set(range(n)), f"shard {i}"
    finally:
        for s in servers:
            s.kill()


def test_fleet_continuous_microbatches_with_live_appends(spark, tmp_path):
    """Continuous mode (processingTime trigger): the fleet reader must
    advance per-shard offsets across MULTIPLE micro-batches, pick up
    frames appended mid-query, respect the frames_per_batch rate limit,
    and stay exactly-once. Deterministic: we poll the sink for target
    counts instead of sleeping fixed amounts."""
    from pyspark.sql import functions as F

    from dexscraper_spark.sources.frame_source import register_frame_source

    register_frame_source(spark)
    a = FrameSocketServer(_payloads(4)).start()
    b = FrameSocketServer(_payloads(2, seed_base=9)).start()
    q = None
    try:
        q = (spark.readStream.format("dexframes")
             .option("endpoints", f"127.0.0.1:{a.port},127.0.0.1:{b.port}")
             .option("frames_per_batch", "2")
             .option("backoff_base_s", "0.02")
             .load()
             .writeStream.format("memory").queryName("fleet_cont_mem")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(processingTime="300 milliseconds").start())

        def frames_seen():
            rows = (spark.table("fleet_cont_mem")
                    .select("msg_id").distinct().collect())
            out = {0: set(), 1: set()}
            for r in rows:
                out[r["msg_id"] // SHARD_STRIDE].add(
                    r["msg_id"] % SHARD_STRIDE)
            return out

        def await_counts(want_a, want_b, timeout_s=60):
            t0 = time.time()
            while time.time() - t0 < timeout_s:
                got = frames_seen()
                if len(got[0]) >= want_a and len(got[1]) >= want_b:
                    return got
                time.sleep(0.2)
            raise AssertionError(f"timed out waiting for {want_a}/{want_b}; "
                                 f"got {frames_seen()}")

        got = await_counts(4, 2)        # initial histories drained
        # live tail: append on BOTH shards mid-query
        for p in _payloads(3, seed_base=20):
            a.append(p)
        b.append(_payloads(1, seed_base=30)[0])
        got = await_counts(7, 3)
        assert got[0] == set(range(7)) and got[1] == set(range(3))
        q.stop()
        q.awaitTermination(60)
        # exactly-once across every micro-batch
        dup = (spark.table("fleet_cont_mem")
               .groupBy("msg_id", "record_position")
               .agg(F.count(F.lit(1)).alias("n"))
               .filter(F.col("n") > 1).count())
        assert dup == 0
    finally:
        if q is not None and q.isActive:
            q.stop()
        a.kill()
        b.kill()
