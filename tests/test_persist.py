"""The tracked-persist registry: every internal operator persist must be
releasable through registry.clear_plan_cache() — the r6 ADVICE leak was
operators persisting intermediates (simhash fingerprints, OHLC fine
bars) behind handles nothing could unpersist, so refresh/cold-build
cycles accumulated block-manager storage.

Assertions go through the tracked handles' storage levels, not
getPersistentRDDs counts: dedup_components' localCheckpoint blocks are
lineage-anchored and reclaimed by the ContextCleaner on GC, so a raw
RDD count is timing-dependent."""

from __future__ import annotations

from pyspark.sql import functions as F

from dexscraper_spark import persist as P


def _stored(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_operator_internal_persists_release_on_clear(spark):
    from dexscraper_spark.operators.dedup import simhash_near_pairs
    from dexscraper_spark.operators.ohlc import ohlc_windowed_frames
    from dexscraper_spark.plans.registry import clear_plan_cache

    clear_plan_cache()
    assert P._TRACKED == []

    docs = spark.createDataFrame(
        [(i, f"some document text number {i % 3} with words")
         for i in range(20)],
        "doc_id long, text string")
    simhash_near_pairs(docs, id_col="doc_id", text_col="text").count()

    ticks = spark.createDataFrame(
        [(i, "AAA", 1.0 + i * 0.01, 2.0) for i in range(50)],
        "event_id long, symbol string, price double, qty double"
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id") * 60))
    ohlc_windowed_frames(ticks, frames=(("m5", 300), ("h1", 3600))).count()

    # the simhash fingerprint table and the fine bar frame are tracked...
    handles = list(P._TRACKED)
    assert len(handles) >= 2
    assert all(_stored(df) for df in handles)

    # ...and ONE switch releases them all
    clear_plan_cache()
    assert P._TRACKED == []
    assert all(not _stored(df) for df in handles)


def test_curation_cache_clear_delegates_to_shared_tracker(spark):
    """clear_curation_cache() must release persists taken INSIDE the
    operators the pipeline calls (simhash fingerprints), not only its
    own dedup frame — the r6 ADVICE leak."""
    from dexscraper_spark.plans.curation import (
        clear_curation_cache, curate_corpus)

    P.release_tracked()
    docs = spark.createDataFrame(
        [(i, "a perfectly reasonable english document with enough words "
             f"to pass the gates number {i}") for i in range(30)],
        "doc_id long, text string")
    curate_corpus(docs).count()
    handles = list(P._TRACKED)
    assert len(handles) >= 2          # dedup frame + fingerprint table
    assert all(_stored(df) for df in handles)
    clear_curation_cache()
    assert P._TRACKED == []
    assert all(not _stored(df) for df in handles)


def test_materialized_artifacts_release_deterministically(spark):
    """materialize_artifact dirs are deleted by release_tracked (the
    deterministic half the localCheckpoint approach could not give);
    a stale frame read after release fails LOUDLY, matching the plan
    cache's staleness contract."""
    import os

    import pytest

    from dexscraper_spark.persist import materialize_artifact

    P.release_tracked()
    df = spark.range(10).withColumnRenamed("id", "v")
    art = materialize_artifact(df, "testart")
    assert art.count() == 10
    [path] = P._ARTIFACT_DIRS
    assert os.path.isdir(path)
    P.release_tracked()
    assert not os.path.exists(path) and P._ARTIFACT_DIRS == []
    with pytest.raises(Exception):
        art.count()  # loud, never silently stale
