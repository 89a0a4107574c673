"""End-to-end training-corpus curation — the pipeline a 100 TB
training-data deployment runs nightly, composed from the engine's
north-star operators:

    documents
      → per-doc text metrics (quality score, language ID, token count)
      → quality / language / length gates          (codegen'd scan stage)
      → exact dedup (content hash, min-id survivor) (one groupBy)
      → near-dup pairs (SimHash bands, xxhash64)    (linear-shuffle LSH)
      → connected components (min-label)            (pair-scale joins)
      → canonical representative per cluster        (anti-join of losers)
      → deterministic train/valid/test split        (portable hash)

Every stage is a DataFrame transformation: the pipeline is ONE lazy plan
(metrics/gates fuse into the scan; dedup stages shuffle doc-ids and
16-byte fingerprints, never full text, until the final semi-join).

Scale shape: the only corpus-sized shuffles are the exact-dedup groupBy
and the simhash fingerprint aggregation — both partial-aggregatable.
Everything after operates on the pair set, which LSH keeps ~answer-sized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dexscraper_spark.functions import textstats as tx
from dexscraper_spark.operators.dedup import (
    dedup_components, simhash_near_pairs, split_assignment)
from dexscraper_spark.persist import release_tracked, tracked_persist


def clear_curation_cache() -> None:
    """Unpersist every intermediate frame the curation pipeline pinned —
    invoked by registry.clear_plan_cache() so artifact refresh cycles
    don't leak block-manager storage. Delegates to the shared tracked-
    persist registry, which also covers persists taken INSIDE operators
    this pipeline calls (simhash fingerprints, OHLC fine bars, ...)."""
    release_tracked()


@dataclass(frozen=True)
class CurationConfig:
    min_quality: float = 0.5
    languages: tuple = ("en", "es", "fr", "de")   # drop 'und'
    min_tokens: int = 5
    simhash_max_hamming: int = 3
    simhash_bands: int = 4
    train_pct: int = 80
    valid_pct: int = 10


def curate_corpus(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  config: CurationConfig = CurationConfig(),
                  simhash_hash_fn=None) -> DataFrame:
    """Returns the curated corpus: one row per surviving document with
    (id, text, lang, quality, n_tokens, split). Deterministic — the
    survivor of every duplicate cluster is its minimum id, and the split
    is a portable content hash of the id, so reruns (and different
    cluster layouts) produce the identical corpus.

    ``simhash_hash_fn`` overrides the near-dup shingle hash (default
    xxhash64, the production hash); pass ``dedup.md5_le64`` for the
    cross-engine-portable fingerprint the oracle-checked registry row
    uses.
    """
    cfg = config
    text = F.col(text_col)

    # 1) metrics + gates — all scan-stage expressions
    scored = docs.select(
        F.col(id_col), text,
        tx.lang_id(text).alias("lang"),
        tx.quality_score(text).alias("quality"),
        tx.token_count(text).alias("n_tokens"),
    ).filter(
        (F.col("quality") >= cfg.min_quality)
        & F.col("lang").isin(*cfg.languages)
        & (F.col("n_tokens") >= cfg.min_tokens)
    )

    # 2) exact dedup: identical text keeps the minimum id. Hash groupBy on
    # the content hash; min() is partial-aggregatable. (64-bit content
    # hash: a cross-text collision wrongly drops one doc with p ≈ n²/2⁶⁵
    # — at a billion docs that is ~3%, so switch the key to
    # md5(text) [128-bit] there; xxhash64 keeps the hot path cheap here.)
    exact_keep = (
        scored.groupBy(F.xxhash64(text).alias("__h"))
        .agg(F.min(F.col(id_col)).alias(id_col))
        .select(id_col)
    )
    deduped = scored.join(exact_keep, id_col, "left_semi")

    # 3) near-dup clusters: SimHash banding (production xxhash64 hash) →
    # pairs → connected components → every cluster keeps min id.
    # Persist: the near-dup detector and the survivor anti-join both read
    # it. The handle is tracked in _PERSISTED so clear_curation_cache()
    # (invoked by registry.clear_plan_cache()) releases it — refresh
    # cycles must not accumulate orphaned block-manager storage.
    deduped = tracked_persist(deduped)
    pairs = simhash_near_pairs(
        deduped, id_col=id_col, text_col=text_col,
        num_bands=cfg.simhash_bands, max_hamming=cfg.simhash_max_hamming,
        hash_fn=simhash_hash_fn)
    comps = dedup_components(pairs, id_a="id_a", id_b="id_b")
    # "component" is the declared output column of dedup_components —
    # filtering on the pre-alias "label" only resolved through lineage
    # attribute resolution and breaks on any lineage-free frame
    losers = comps.filter(F.col("node") != F.col("component")) \
                  .select(F.col("node").alias(id_col))
    # left_anti with no broadcast hint: the loser set is answer-sized on
    # ordinary corpora (AQE broadcasts it), but a dup-heavy crawl can make
    # it a large fraction of the corpus — let the optimizer decide.
    survivors = deduped.join(losers, id_col, "left_anti")

    # 4) deterministic split on the surviving ids
    return survivors.withColumn(
        "split", split_assignment(F.col(id_col), train_pct=cfg.train_pct,
                                  valid_pct=cfg.valid_pct))


def write_curated(curated: DataFrame, path: str, *,
                  format: str = "parquet") -> None:
    """Materialize the curated corpus as training shards:
    ``path/split=train|valid|test/lang=…/part-*.parquet``. Partitioning by
    (split, lang) means a trainer reads exactly its shard's bytes
    (partition pruning on both keys) and per-language sampling never
    scans other languages. Low-cardinality keys (3 × ~4) keep the file
    count bounded; at corpus scale add a bucket/shard column if
    per-partition files grow past HDFS-friendly sizes.
    """
    (curated.write.mode("overwrite")
     .partitionBy("split", "lang").format(format).save(path))


def curation_stats(curated: DataFrame) -> DataFrame:
    """Per-(split, lang) corpus accounting: doc count, token sum, mean
    quality — the numbers a data curator reports after every run."""
    return (
        curated.groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             F.avg("quality").alias("mean_quality"))
        .orderBy("split", "lang")
    )
