"""The reference's end-to-end extraction pipeline, composed Spark-first.

Reference flow (SURVEY §3.1, scraper.py:248-450):
    frames → decode (S3-S5) → metadata pattern scan (S12) → proximity
    enrichment (J1-J3) → confidence scoring (A7) → completeness stats (A1)
    → top-k (T1) → export (K1-K11)

Here each stage is one of the engine's operators over DataFrames; the whole
pipeline is a single lazy plan — Catalyst fuses the scalar stages, the
enrichment join is the band join, and nothing materializes until a sink
action. This module is the parity demonstration that the pieces compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dexscraper_spark.functions.scoring import field_count, record_confidence
from dexscraper_spark.operators.proximity import assign_roles, band_range_join
from dexscraper_spark.operators.topk import top_tokens
from dexscraper_spark.sources.decode import decode_messages

ENRICH_RADIUS = 1000  # |Δposition| <= 1000 (scraper.py:357)


def synthetic_metadata(spark: SparkSession, n_frames: int) -> DataFrame:
    """Deterministic positioned-entity rows (addresses/urls) mimicking the
    S12 metadata pattern scan output for the synthetic frames."""
    rows = []
    for msg in range(n_frames):
        for rec in range(4):
            pos = rec * 512
            rows.append((msg, "address", f"MINTADDR{msg:02d}{rec:02d}" + "m" * 24,
                         pos + 40, "potential_contract"))
            rows.append((msg, "address", f"PAIRADDR{msg:02d}{rec:02d}" + "p" * 24,
                         pos + 120, "potential_contract"))
            rows.append((msg, "address",
                         "So11111111111111111111111111111111111111112",
                         pos + 200, "SOL_token"))
            if rec % 2 == 0:
                rows.append((msg, "url", f"https://example{msg}.com/t{rec}",
                             pos + 260, "website"))
    return spark.createDataFrame(
        rows, "msg_id long, kind string, value string, position long, mtype string")


def extract_tokens(raw_frames: DataFrame, metadata: DataFrame, *,
                   persist_decoded: bool = True) -> DataFrame:
    """decode → enrich (J1 band join + J3 role pivot) → score (A7/A9).

    ``persist_decoded`` (default on) materializes the decoded token
    projection once: the band-join lane and the enrichment-join lane
    below both consume ``tokens``, and Catalyst shares no subtrees, so
    without the persist the whole MapInPandas frame decode runs once per
    lane — two decodes of every frame at scale. The persisted frame is
    the narrow scalar projection (no payloads), i.e. the decoded-tokens
    table a corpus-scale run would write to storage anyway (guide §8
    step 1: decode once, move the decision columns); tracked_persist
    registers the handle so registry.clear_plan_cache() releases it."""
    from dexscraper_spark.persist import tracked_persist

    decoded = decode_messages(raw_frames)

    addr = metadata.filter(F.col("kind") == "address").select(
        "msg_id", F.col("value").alias("addr"),
        F.col("position").alias("mpos"), F.col("mtype"))
    tokens = decoded.select(
        "msg_id", "base_token_symbol", "base_token_name", "chain", "protocol",
        "price_usd", "volume_h24", "liquidity_usd", "fdv", "created_at",
        F.col("record_position").alias("tpos"),
    ).withColumn("token_key", F.concat_ws("#", "msg_id", "tpos"))
    if persist_decoded:
        tokens = tracked_persist(tokens)

    # co-locate on msg_id INSIDE the band join (hash key = (msg, bin)) —
    # post-filtering frames after a global position join would shuffle
    # cross-frame false candidates at scale.
    joined = band_range_join(
        tokens.select("token_key", "msg_id", "tpos"),
        addr, left_pos="tpos", right_pos="mpos",
        radius=ENRICH_RADIUS, keys=["msg_id"],
    )

    roles = assign_roles(joined, left_key="token_key", left_pos="tpos",
                         right_pos="mpos", value_col="addr", type_col="mtype")

    enriched = tokens.join(roles, "token_key", "left")
    fc = field_count(
        F.col("price_usd"), F.col("volume_h24"), F.col("liquidity_usd"),
        F.col("fdv"), F.col("created_at"), F.col("token_address"),
        F.col("pair_address"), F.col("quote_address"), F.col("base_token_name"),
    )
    return (
        enriched.withColumn("field_count", fc)
        .withColumn("confidence_score", record_confidence(F.col("field_count")))
        .withColumnRenamed("base_token_symbol", "symbol")
    )


def synthetic_raw_frames(spark: SparkSession, n_frames: int,
                         *, pairs_per_frame: int = 4) -> DataFrame:
    """The demo wire source: (msg_id, payload) frames from the synthetic
    encoder — ONE definition shared by this pipeline and the CLI so the
    frame layout can never drift between them."""
    import pandas as pd
    from dexscraper_spark.sources.binary import make_frame, sample_pairs
    pdf = pd.DataFrame({
        "msg_id": range(n_frames),
        "payload": [make_frame(sample_pairs(pairs_per_frame, seed=i))
                    for i in range(n_frames)],
    })
    return spark.createDataFrame(pdf).coalesce(1)


def trending_top_tokens(spark: SparkSession, *, n_frames: int = 16,
                        limit: int = 10,
                        tiebreak: str | None = None) -> DataFrame:
    """Full pipeline on synthetic frames → top-N trending tokens."""
    raw = synthetic_raw_frames(spark, n_frames)
    tokens = extract_tokens(raw, synthetic_metadata(spark, n_frames))
    return top_tokens(tokens, limit, tiebreak=tiebreak).select(
        "symbol", "chain", "protocol", "price_usd", "volume_h24",
        "liquidity_usd", "token_address", "pair_address", "quote_address",
        "confidence_score", "field_count",
    )
