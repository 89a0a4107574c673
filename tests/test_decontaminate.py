"""Decontamination: planted-overlap detection, near-miss rejection,
normalization, short-doc semantics, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dexscraper_spark.operators.decontaminate import (
    contamination_report, decontaminate, ngram_hashes,
)

EVAL = [
    (0, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (1, "colorless green ideas sleep furiously in the bright morning light of dawn itself"),
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def eval_docs(spark):
    return _mk(spark, EVAL)


def test_planted_contamination_detected(spark, eval_docs):
    """A train doc embedding 13 consecutive eval words is flagged; one
    sharing only 12 consecutive words (near miss) is not."""
    leak13 = " ".join(EVAL[0][1].split()[:13])
    leak12 = " ".join(EVAL[1][1].split()[:12])
    train = _mk(spark, [
        (100, f"some unrelated prefix {leak13} and an unrelated suffix"),
        (101, f"prefix {leak12} suffix words here"),
        (102, "a fully unrelated document about spark shuffle sizing and "
              "partition pruning strategies for large tables"),
    ])
    report = {r.doc_id: r.hits
              for r in contamination_report(train, eval_docs).collect()}
    assert 100 in report and report[100] >= 1
    assert 101 not in report and 102 not in report

    clean, removed = decontaminate(train, eval_docs)
    assert sorted(r.doc_id for r in clean.collect()) == [101, 102]
    assert [r.doc_id for r in removed.collect()] == [100]


def test_normalization_case_and_whitespace(spark, eval_docs):
    leak = " ".join(EVAL[0][1].split()[:13]).upper().replace(" ", "\t")
    train = _mk(spark, [(200, f"XX {leak} YY")])
    report = contamination_report(train, eval_docs).collect()
    assert [r.doc_id for r in report] == [200]


def test_short_docs_produce_no_grams(spark, eval_docs):
    train = _mk(spark, [(300, "only five words right here")])
    assert ngram_hashes(train, n=13).count() == 0
    clean, removed = decontaminate(train, eval_docs)
    assert clean.count() == 1 and removed.count() == 0


def test_hits_counts_distinct_grams(spark, eval_docs):
    """A doc containing 14 consecutive eval words shares TWO distinct
    13-grams."""
    leak14 = " ".join(EVAL[0][1].split()[:14])
    train = _mk(spark, [(400, leak14)])
    [r] = contamination_report(train, eval_docs).collect()
    assert r.hits == 2
    # min_hits=3 then keeps it
    clean, _ = decontaminate(train, eval_docs, min_hits=3)
    assert clean.count() == 1


def test_plan_is_broadcast_join_no_train_shuffle(spark, eval_docs):
    """The train grams must reach the join without a shuffle: broadcast
    hash join on the gram hash, train side scan-exploded in place."""
    train = _mk(spark, [(500, "words " * 30)])
    plan = contamination_report(train, eval_docs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # train grams must not shuffle INTO the join (the only shuffles are
    # the post-join per-doc aggregation's)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_ngram_validation(spark, eval_docs):
    with pytest.raises(ValueError, match=">= 1"):
        ngram_hashes(eval_docs, n=0)


def test_duplicate_spans_and_stats(spark):
    from dexscraper_spark.operators.decontaminate import (
        duplicate_spans, span_duplication_stats)

    boiler = "all rights reserved contact the legal department for terms " \
             "of use and privacy policy details here"  # 17 words
    uniq = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec")
    docs = spark.createDataFrame(
        [(0, f"{uniq} {boiler}"),
         (1, f"{boiler} something quite different trails afterward here "
             "with more words to extend the document"),
         (2, "sierra tango uniform victor whiskey xray yankee zulu "
             "one two three four five six seven eight nine")],
        "doc_id long, text string")
    dups = duplicate_spans(docs, n=10).collect()
    assert dups  # the shared boilerplate yields duplicated 10-grams
    assert all(r.n_docs >= 2 and r.min_doc == 0 and r.max_doc == 1
               for r in dups)

    stats = {r.doc_id: r for r in
             span_duplication_stats(docs, n=10).collect()}
    assert stats[0].n_dup_spans > 0 and stats[1].n_dup_spans > 0
    assert stats[2].n_dup_spans == 0 and stats[2].dup_ratio == 0.0
    assert 0 < stats[0].dup_ratio < 1
