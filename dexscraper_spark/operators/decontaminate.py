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
    from dexscraper_spark.operators.bpe import word_ngrams

    src = df.select(F.col(id_col), norm_words(text_col).alias("__w"))
    grams = F.transform(word_ngrams(F.col("__w"), n),
                        lambda g: F.xxhash64(g))
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
    # NO broadcast hint here: the report is bounded by the TRAIN corpus
    # (one boilerplate eval gram can match millions of docs) — only the
    # eval-gram side is small by contract. AQE picks the strategy.
    clean = train.join(report.select(id_col), id_col, "left_anti")
    return clean, report


# ---------------------------------------------------------------------------
# Self-duplication diagnostics — the within-corpus twin of eval
# decontamination (Lee et al., "Deduplicating Training Data Makes
# Language Models Better", 2021: repeated ~50-token spans are what the
# model memorizes). Exact-substring dedup via suffix arrays doesn't
# distribute; the standard scalable proxy is span-gram counting, which
# is two partial-agg'd groupBys here.
# ---------------------------------------------------------------------------


def duplicate_spans(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text", n: int = 50,
                    min_count: int = 2) -> DataFrame:
    """(gram, n_occurrences, n_docs, min_doc, max_doc): word n-gram
    spans appearing ≥ min_count times across the corpus. Example doc
    ids are min/max — NOT collect_set, which a boilerplate span
    repeated in millions of docs would blow up; counts stay bounded
    per gram no matter how viral the span."""
    grams = ngram_hashes(docs, id_col=id_col, text_col=text_col, n=n)
    return (grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.count_distinct(id_col).alias("n_docs"),
                 F.min(id_col).alias("min_doc"),
                 F.max(id_col).alias("max_doc"))
            .filter(F.col("n_occurrences") >= min_count))


def span_duplication_stats(docs: DataFrame, *, id_col: str = "doc_id",
                           text_col: str = "text", n: int = 50,
                           min_count: int = 2) -> DataFrame:
    """(doc_id, n_spans, n_dup_spans, dup_ratio): how much of each
    document consists of corpus-duplicated spans — the filter column
    for dropping boilerplate-dominated docs. The gram explode (the
    dominant cost) runs ONCE, persisted for its three consumers; docs
    too short for a single n-gram (or with NULL text) report 0.0, not
    a missing row — a pipeline filtering on dup_ratio must not
    silently drop them."""
    from dexscraper_spark.persist import tracked_persist

    # tracked persist, NOT an eager checkpoint: the three consumers
    # below share the cached explode lazily; clear_plan_cache releases
    # the blocks (the engine-wide internal-persist discipline)
    grams = tracked_persist(
        ngram_hashes(docs, id_col=id_col, text_col=text_col, n=n))
    dups = (grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") >= min_count)
            .select("gram"))
    per_doc = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"))
    dup_per_doc = (grams.join(dups, "gram")
                   .groupBy(id_col)
                   .agg(F.count(F.lit(1)).alias("n_dup_spans")))
    return (docs.select(id_col).distinct()
            .join(per_doc, id_col, "left")
            .join(dup_per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("n_spans"), F.lit(0))
                    .alias("n_spans"),
                    F.coalesce(F.col("n_dup_spans"), F.lit(0))
                    .alias("n_dup_spans"))
            .withColumn("dup_ratio",
                        F.when(F.col("n_spans") > 0,
                               F.col("n_dup_spans") / F.col("n_spans"))
                        .otherwise(F.lit(0.0))))
