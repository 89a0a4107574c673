"""Quality classifier (hashed-ngram logistic regression): separation,
JVM/driver scoring parity, determinism, the Pareto keep rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dexscraper_spark.operators.classifier import (qc_filter, qc_score,
                                                   qc_train)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")


def _junk(spark, n=400, offset=10_000_000):
    from tests.conftest import junk_docs
    return junk_docs(spark, n=n, offset=offset)


@pytest.fixture(scope="module")
def model(spark):
    docs = _docs(spark)
    return qc_train(docs.filter(F.col("doc_id") < 400),
                    _junk(spark), bits=16, sample_n=400, iters=200)


def test_qc_separates_held_out(spark, model):
    """Held-out real docs must score high, held-out junk low —
    accuracy > 0.9 at the 0.5 cut on data the trainer never saw."""
    pos = qc_score(_docs(spark).filter(
        (F.col("doc_id") >= 400) & (F.col("doc_id") < 800)), model)
    neg = qc_score(_junk(spark, n=200, offset=20_000_000), model)
    pos_acc = pos.filter(F.col("prob") > 0.5).count() / pos.count()
    neg_acc = neg.filter(F.col("prob") < 0.5).count() / neg.count()
    assert pos_acc > 0.9 and neg_acc > 0.9


def test_qc_score_matches_driver_math(spark, model):
    """The JVM scoring plan must reproduce the training-side math:
    logit = (counts · w)/||counts|| + bias, checked in numpy from the
    same Spark-computed feature buckets."""
    import numpy as np

    from dexscraper_spark.operators.classifier import _buckets

    docs = _docs(spark).filter(F.col("doc_id") < 20)
    got = {r["doc_id"]: r["logit"] for r in
           qc_score(docs, model).collect()}
    w = {r["bucket"]: r["weight"] for r in model.weights.collect()}
    rows = docs.select("doc_id",
                       _buckets("text", model.bits).alias("b")).collect()
    for r in rows:
        cnt: dict = {}
        for b in (r["b"] or []):
            cnt[b] = cnt.get(b, 0) + 1
        nrm = float(np.sqrt(sum(c * c for c in cnt.values())))
        dot = sum(c * w.get(b, 0.0) for b, c in cnt.items())
        want = (dot / nrm if nrm > 0 else 0.0) + model.bias
        assert abs(got[r["doc_id"]] - want) < 1e-9, r["doc_id"]


def test_qc_train_layout_independent(spark):
    docs = _docs(spark).filter(F.col("doc_id") < 300)
    junk = _junk(spark, n=150)
    m1 = qc_train(docs, junk, bits=14, sample_n=150, iters=50)
    m2 = qc_train(docs.repartition(7), junk.repartition(5),
                  bits=14, sample_n=150, iters=50)
    w1 = {(r["bucket"], r["weight"]) for r in m1.weights.collect()}
    w2 = {(r["bucket"], r["weight"]) for r in m2.weights.collect()}
    assert w1 == w2 and m1.bias == m2.bias


def test_qc_score_empty_and_null_text_score_bias(spark, model):
    import math

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string")
    got = {r["doc_id"]: (r["logit"], r["prob"]) for r in
           qc_score(docs, model).collect()}
    want_p = 1.0 / (1.0 + math.exp(-model.bias))
    for i in (1, 2, 3):
        assert abs(got[i][0] - model.bias) < 1e-12
        assert abs(got[i][1] - want_p) < 1e-12


def test_qc_filter_pareto_rule(spark, model):
    """qc_filter must implement the GPT-3 rule EXACTLY: keep iff
    prob > 1 − x, x = u^(−1/α) − 1 with u from xxhash64(id, seed) —
    decisions recomputed independently in Python from the same hashes
    must match row-for-row. Note the rule is deliberately aggressive:
    P(keep | p) = (2−p)^−α, ≈0.75 even at p=0.97 (α=9) — the published
    behavior, not a bug. Also: junk dies at ~(2−0.04)^−9 ≈ 0.2%, and
    the result is layout-independent."""
    pos = _docs(spark).filter(F.col("doc_id") < 400)
    junk = _junk(spark, n=400, offset=30_000_000)
    mixed = pos.unionByName(junk)
    kept_ids = {r["doc_id"] for r in
                qc_filter(mixed, model, alpha=9.0)
                .select("doc_id").collect()}

    probs = {r["doc_id"]: r["prob"] for r in
             qc_score(mixed, model).collect()}
    hashes = {r["doc_id"]: r["h"] for r in mixed.select(
        "doc_id", F.shiftrightunsigned(
            F.xxhash64(F.col("doc_id"), F.lit(42)), 11).alias("h"))
        .collect()}
    want = set()
    for i, p in probs.items():
        u = (hashes[i] + 1.0) / float((1 << 53) + 2)
        x = u ** (-1.0 / 9.0) - 1.0
        if p > 1.0 - x:
            want.add(i)
    assert kept_ids == want
    n_pos_kept = sum(1 for i in kept_ids if i < 400)
    n_junk_kept = len(kept_ids) - n_pos_kept
    assert n_pos_kept > 0.6 * 400          # ≈(2−0.97)^−9 of quality
    assert n_junk_kept < 0.02 * 400        # junk essentially dies
    kept2 = {r["doc_id"] for r in
             qc_filter(mixed.repartition(11), model, alpha=9.0)
             .select("doc_id").collect()}
    assert kept_ids == kept2


def test_qc_train_validation(spark):
    docs = _docs(spark).filter(F.col("doc_id") < 10)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty class"):
        qc_train(docs, empty, sample_n=10, iters=5)
    with pytest.raises(ValueError, match="alpha"):
        qc_filter(docs, qc_train(docs, _junk(spark, n=10),
                                 sample_n=10, iters=5, bits=12),
                  alpha=0.0)


def test_qc_save_load_roundtrip_and_validation(spark, model, tmp_path):
    import pytest

    from dexscraper_spark.operators.classifier import qc_load, qc_save

    p = str(tmp_path / "qc")
    qc_save(spark, model, p)
    back = qc_load(spark, p)
    assert back.bias == model.bias and back.bits == model.bits
    w0 = {(r["bucket"], r["weight"]) for r in model.weights.collect()}
    w1 = {(r["bucket"], r["weight"]) for r in back.weights.collect()}
    assert w0 == w1
    # scoring through the roundtripped model is identical
    docs = _docs(spark).filter(F.col("doc_id") < 10)
    a = {r["doc_id"]: r["logit"] for r in qc_score(docs, model).collect()}
    b = {r["doc_id"]: r["logit"] for r in qc_score(docs, back).collect()}
    assert a == b
    # mixed-generation store fails loudly
    model.weights.withColumn("bias", F.lit(99.0)) \
        .withColumn("bits", F.lit(model.bits)) \
        .write.mode("append").parquet(p)
    with pytest.raises(ValueError, match="distinct"):
        qc_load(spark, p)


def test_qc_save_load_empty_weights_model(spark, tmp_path):
    """A valid-but-degenerate all-zero-weights model must roundtrip
    (bias/bits ride the meta row, not the weight rows)."""
    from dexscraper_spark.operators.classifier import (QcModel, qc_load,
                                                       qc_save, qc_score)

    empty_w = spark.createDataFrame([], "bucket int, weight double")
    m = QcModel(weights=empty_w, bias=-1.25, bits=14)
    p = str(tmp_path / "degenerate")
    qc_save(spark, m, p)
    back = qc_load(spark, p)
    assert back.bias == -1.25 and back.bits == 14
    assert back.weights.count() == 0
    docs = spark.createDataFrame([(1, "anything at all")],
                                 "doc_id long, text string")
    got = qc_score(docs, back).first()
    assert abs(got["logit"] - (-1.25)) < 1e-12


def test_qc_load_rejects_negative_bucket_corruption(spark, model,
                                                    tmp_path):
    from dexscraper_spark.operators.classifier import qc_load, qc_save

    p = str(tmp_path / "qc2")
    qc_save(spark, model, p)
    spark.createDataFrame([(-7, 0.5, model.bias, model.bits)],
                          "bucket int, weight double, bias double, "
                          "bits int").write.mode("append").parquet(p)
    with pytest.raises(ValueError, match="corrupt"):
        qc_load(spark, p)
