"""N-gram LM: stupid-backoff parity with a driver reference, quality
ordering, partition independence, empty docs, validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dexscraper_spark.operators.lm import lm_score, lm_train

TRAIN = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the rug"),
    (2, "a cat and a dog sat together on the mat"),
    (3, "the cat and the dog"),
]


def _ref_scores(train_texts, score_texts, n=3, alpha=0.4):
    """Independent driver implementation of stupid backoff."""
    counts: dict = {}
    total = 0
    for t in train_texts:
        w = t.lower().split()
        total += len(w)
        for o in range(1, n + 1):
            for i in range(len(w) - o + 1):
                g = (o, " ".join(w[i:i + o]))
                counts[g] = counts.get(g, 0) + 1

    def s(words, i, o):
        if o == 1:
            c = counts.get((1, words[i]), 0)
            return c / total if c > 0 else alpha / total
        if i + 1 >= o:
            g = counts.get((o, " ".join(words[i - o + 1:i + 1])), 0)
            ctx = counts.get((o - 1, " ".join(words[i - o + 1:i])), 0)
            if g > 0 and ctx > 0:
                return g / ctx
        return alpha * s(words, i, o - 1)

    out = []
    for t in score_texts:
        w = t.lower().split()
        if not w:
            out.append(None)
            continue
        lps = [math.log10(s(w, i, min(i + 1, n))) for i in range(len(w))]
        out.append(sum(lps) / len(lps))
    return out


@pytest.fixture(scope="module")
def train_docs(spark):
    return spark.createDataFrame(TRAIN, "doc_id long, text string")


@pytest.fixture(scope="module")
def lm(train_docs):
    return lm_train(train_docs, n=3)


def test_lm_score_matches_reference(spark, train_docs, lm):
    tests = [
        (10, "the cat sat on the rug"),        # in-domain
        (11, "dog the on mat sat"),            # scrambled
        (12, "the cat"),                       # shorter than n
        (13, "zebra quantum flux"),            # all OOV
    ]
    docs = spark.createDataFrame(tests, "doc_id long, text string")
    got = {r.doc_id: r.logp_per_token
           for r in lm_score(docs, lm, n=3).collect()}
    want = _ref_scores([t for _, t in TRAIN], [t for _, t in tests])
    for (i, _), w in zip(tests, want):
        assert got[i] == pytest.approx(w, abs=1e-9), i


def test_lm_quality_ordering(spark, train_docs, lm):
    """The CCNet property: in-domain text outscores scrambled text,
    which outscores OOV gibberish."""
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"),
         (1, "mat the on sat cat the"),
         (2, "zorp blix quang fromple dar")],
        "doc_id long, text string")
    s = {r.doc_id: r.logp_per_token
         for r in lm_score(docs, lm, n=3).collect()}
    assert s[0] > s[1] > s[2]


def test_lm_partition_independence(spark, train_docs):
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * (1 + i % 3)) for i in range(20)],
        "doc_id long, text string")
    lm1 = lm_train(train_docs.repartition(5), n=2)
    a = sorted((r.doc_id, r.n_tokens, round(r.logp_per_token, 9))
               for r in lm_score(docs.repartition(3), lm1, n=2).collect())
    b = sorted((r.doc_id, r.n_tokens, round(r.logp_per_token, 9))
               for r in lm_score(docs.repartition(11), lm1, n=2).collect())
    assert a == b


def test_lm_empty_doc_null_score(spark, train_docs, lm):
    docs = spark.createDataFrame([(0, ""), (1, "the cat")],
                                 "doc_id long, text string")
    rows = {r.doc_id: r for r in lm_score(docs, lm, n=3).collect()}
    assert rows[0].n_tokens == 0 and rows[0].logp_per_token is None
    assert rows[1].n_tokens == 2 and rows[1].logp_per_token is not None


def test_lm_validation(spark, train_docs):
    with pytest.raises(ValueError, match=">= 1"):
        lm_train(train_docs, n=0)
    with pytest.raises(ValueError, match=">= 1"):
        lm_score(train_docs, lm_train(train_docs, n=1), n=0)


def test_lm_null_text_scores_null_not_vanishes(spark, train_docs, lm):
    docs = spark.createDataFrame([(0, None), (1, "the cat")],
                                 "doc_id long, text string")
    rows = {r.doc_id: r for r in lm_score(docs, lm, n=3).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].logp_per_token is None
