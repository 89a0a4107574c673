"""End-to-end text-corpus pipeline: the full pretraining-data chain
(quality gates → LM filter → decontaminate → PII redact → BPE →
packing) composed from the individually-tested operators — pins that
the stages agree on tokenization and ids well enough to chain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dexscraper_spark.functions.cleaning import redact_pii
from dexscraper_spark.functions.textstats import repetition_ratio
from dexscraper_spark.operators.bpe import bpe_encode, bpe_train
from dexscraper_spark.operators.decontaminate import decontaminate
from dexscraper_spark.operators.lm import lm_score, lm_train
from dexscraper_spark.operators.packing import chunk_token_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    """Synthetic documents plus three planted bad docs: a repetition
    bomb, an OOV gibberish doc, and an eval-contaminated doc."""
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").limit(200)
    [probe] = docs.orderBy("doc_id").limit(1).collect()
    leak = " ".join(probe.text.split()[:13])
    planted = spark.createDataFrame(
        [(900001, "buy now " * 40),
         (900002, "zorp blix quang fromple dar glap snee vorp " * 6),
         (900003, f"mail me at bob@example.com about {leak} thanks")],
        "doc_id long, text string")
    return docs.filter(F.col("doc_id") != probe.doc_id) \
        .unionByName(planted), probe


@pytest.mark.slow  # r13 fast-lane split (>10 s)
def test_full_text_pipeline(spark, corpus, tmp_path):
    docs, probe = corpus
    eval_docs = spark.createDataFrame([(0, probe.text)],
                                      "doc_id long, text string")

    # 1. quality gates: repetition + LM in-domain score
    lm = lm_train(docs.filter(F.col("doc_id") < 900000), n=2)
    scored = (docs
              .withColumn("rep", repetition_ratio(F.col("text")))
              .join(lm_score(docs, lm, n=2), "doc_id"))
    gated = scored.filter((F.col("rep") < 0.5)
                          & (F.col("logp_per_token") > -4.0))
    kept_ids = {r.doc_id for r in gated.select("doc_id").collect()}
    assert 900001 not in kept_ids        # repetition bomb gated
    assert 900002 not in kept_ids        # OOV gibberish gated
    assert 900003 in kept_ids            # survives quality, dies next

    # 2. decontamination vs the eval slice. The synthetic corpus holds
    # deliberate near-duplicates (it exists for dedup testing), so
    # other docs may LEGITIMATELY share a 13-gram with the probe —
    # verify every removal is a true overlap, and the plant is caught.
    clean, removed = decontaminate(gated.select("doc_id", "text"),
                                   eval_docs)
    removed_ids = {r.doc_id for r in removed.collect()}
    assert 900003 in removed_ids
    probe_grams = {" ".join(probe.text.lower().split()[i:i + 13])
                   for i in range(len(probe.text.split()) - 12)}
    texts = {r.doc_id: r.text for r in gated.select(
        "doc_id", "text").collect()}
    for did in removed_ids:
        w = texts[did].lower().split()
        doc_grams = {" ".join(w[i:i + 13]) for i in range(len(w) - 12)}
        assert doc_grams & probe_grams, did  # every removal is real

    # 3. PII redaction is a pure projection
    redacted = clean.select("doc_id",
                            redact_pii(F.col("text")).alias("text"))
    assert redacted.filter(F.col("text").contains("@")).count() == 0

    # 4. tokenize + pack into fixed-size training rows
    model = bpe_train(redacted, vocab_size=200)
    pieces = bpe_encode(redacted, model).select(
        "doc_id", F.size("pieces").alias("n_tokens"))
    chunks = chunk_token_stream(pieces, max_tokens=512)
    total_tokens = pieces.agg(F.sum("n_tokens")).collect()[0][0]
    spans = chunks.select(
        "chunk_id", (F.col("tok_end") - F.col("tok_start")).alias("m"))
    assert spans.agg(F.sum("m")).collect()[0][0] == total_tokens
    per_chunk = {r.chunk_id: r.s for r in
                 spans.groupBy("chunk_id")
                 .agg(F.sum("m").alias("s")).collect()}
    last = max(per_chunk)
    assert all(s == 512 for c, s in per_chunk.items() if c != last)
    assert per_chunk[last] <= 512

    # 5. deterministic: the whole chain reruns identically
    clean2, _ = decontaminate(gated.select("doc_id", "text"), eval_docs)
    assert sorted(r.doc_id for r in clean2.select("doc_id").collect()) \
        == sorted(r.doc_id for r in clean.select("doc_id").collect())
