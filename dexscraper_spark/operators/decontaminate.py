"""Eval-set decontamination — remove training documents that leak
benchmark text.

Public technique: n-gram overlap decontamination as described in the
GPT-3 paper (Brown et al. 2020, Appendix C: 13-gram overlap) and its
descendants — a standard step every serious training-data pipeline runs
before training. The reference engine has nothing comparable (it is a
market scraper); this belongs to the training-data extension family.

Scale shape: the eval set is SMALL by definition (benchmarks are
thousands of docs, the train corpus is the 100 TB side), so eval n-gram
hashes broadcast and the train side is one linear scan: explode each
train doc's word n-grams (map-side, no shuffle), broadcast-hash-semi-
join against the eval grams, and aggregate hits per doc (partial-agg'd
groupBy over only the MATCHING grams — overlap rows, not corpus rows).
Grams are compared as xxhash64 of the normalized joined words: 8 bytes
per gram, collision odds ~2^-64 per pair.

Normalization (both sides, identically): lowercase + split on the same
ASCII whitespace class the BPE/tokenizer stack uses — eval text with
different casing/spacing still matches, which is the point of gram-level
(not byte-level) decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dexscraper_spark.operators.bpe import norm_words


def ngram_hashes(df: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 13) -> DataFrame:
    """(id, gram) — xxhash64 of every word n-gram. Docs shorter than n
    words produce no grams (they cannot contain a full n-gram). The
    slide is a map-side HOF (sequence → slice → hash) — no shuffle."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # word array as a COLUMN, not an inline HOF expression: slicing the
    # norm_words expression inside the transform re-evaluates the filter
    # chain per position — O(len²) per doc (see operators/lm.py)
    src = df.select(F.col(id_col), norm_words(text_col).alias("__w"))
    words = F.col("__w")
    # guard the short-doc case explicitly: sequence(1, 0) DESCENDS in
    # Spark (yielding slice(start=0) errors), it does not return empty
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.xxhash64(F.array_join(F.slice(words, i, n), " "))
        )).otherwise(F.array().cast("array<bigint>"))
    return (src.select(F.col(id_col), F.explode(grams).alias("gram")))


def contamination_report(train: DataFrame, eval_docs: DataFrame, *,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 13) -> DataFrame:
    """(doc_id, hits): train docs sharing >= 1 word n-gram with the
    eval set, with the count of distinct leaked grams. The eval side is
    broadcast (distinct gram hashes of a benchmark-sized corpus); the
    train side is scanned once."""
    eval_grams = ngram_hashes(eval_docs, id_col=id_col,
                              text_col=text_col, n=n) \
        .select("gram").distinct()
    train_grams = ngram_hashes(train, id_col=id_col,
                               text_col=text_col, n=n)
    return (train_grams
            .join(broadcast(eval_grams), "gram")
            .groupBy(id_col)
            .agg(F.count_distinct("gram").alias("hits")))


def decontaminate(train: DataFrame, eval_docs: DataFrame, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13, min_hits: int = 1) -> tuple:
    """(clean, removed_report): drop train docs with >= min_hits
    distinct leaked n-grams. ``removed_report`` is the audit trail —
    a pipeline should persist it next to the corpus (what was removed
    and why is part of the dataset's provenance)."""
    report = contamination_report(train, eval_docs, id_col=id_col,
                                  text_col=text_col, n=n) \
        .filter(F.col("hits") >= min_hits)
    clean = train.join(broadcast(report.select(id_col)),
                       id_col, "left_anti")
    return clean, report
