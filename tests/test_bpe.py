"""BPE trainer/encoder: reference parity, determinism, losslessness,
unknown-input fallback, persistence."""

from __future__ import annotations

import pytest

from dexscraper_spark.operators.bpe import (
    _EOW, BpeModel, bpe_encode, bpe_load, bpe_save, bpe_train,
    word_frequencies,
)

CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer wide lowest",
]


def _naive_bpe(texts, n_merges):
    """Independent reference: occurrence-list BPE (no word-freq dict) —
    same math, different structure."""
    words = [list(w) + [_EOW] for t in texts for w in t.split()]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        pair = max(counts, key=lambda p: (counts[p], p))
        merges.append(pair)
        joined = pair[0] + pair[1]
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    syms[i:i + 2] = [joined]
                else:
                    i += 1
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def test_bpe_train_matches_reference(spark, docs):
    alphabet = sorted(set("".join(CORPUS).replace(" ", "")) | {_EOW})
    n_merges = 12
    model = bpe_train(docs, vocab_size=len(alphabet) + n_merges)
    assert model.alphabet == alphabet
    assert model.merges == _naive_bpe(CORPUS, n_merges)


def test_bpe_train_partition_independent(spark, docs):
    m1 = bpe_train(docs.repartition(7), vocab_size=40)
    m2 = bpe_train(docs.repartition(2), vocab_size=40)
    assert m1.merges == m2.merges and m1.alphabet == m2.alphabet


def test_bpe_encode_lossless_and_matches_driver(spark, docs):
    model = bpe_train(docs, vocab_size=45)
    out = {r.doc_id: r.pieces
           for r in bpe_encode(docs, model).collect()}
    from dexscraper_spark.operators.bpe import _encode_word
    for i, text in enumerate(CORPUS):
        expect = [p for w in text.split()
                  for p in _encode_word(w, model.ranks)]
        assert out[i] == expect
        # lossless: concatenation restores the text (EOW = word break)
        assert "".join(out[i]).replace(_EOW, " ").strip() == text


def test_bpe_encode_seen_words_reach_trained_segmentation(spark, docs):
    """Greedy rank-order application reproduces the training-time
    segmentation for in-vocabulary words (the classic BPE property):
    frequent whole words collapse to few pieces."""
    model = bpe_train(docs, vocab_size=50)
    from dexscraper_spark.operators.bpe import _encode_word
    assert len(_encode_word("low", model.ranks)) <= 2
    assert len(_encode_word("newer", model.ranks)) <= 3


def test_bpe_encode_unknown_chars_fallback(spark, docs):
    model = bpe_train(docs, vocab_size=40)
    odd = spark.createDataFrame([(0, "löw ¡new")], "doc_id long, text string")
    [row] = bpe_encode(odd, model).collect()
    assert "".join(row.pieces).replace(_EOW, " ").strip() == "löw ¡new"


def test_bpe_save_load_roundtrip(spark, docs, tmp_path):
    model = bpe_train(docs, vocab_size=40)
    path = str(tmp_path / "bpe")
    bpe_save(spark, model, path)
    loaded = bpe_load(spark, path)
    assert loaded.merges == model.merges
    assert loaded.alphabet == model.alphabet
    assert loaded.vocab_size == model.vocab_size


def test_bpe_validation(spark, docs):
    with pytest.raises(ValueError, match="alphabet"):
        bpe_train(docs, vocab_size=3)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bpe_train(empty, vocab_size=100)


def test_word_frequencies_exact(spark, docs):
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    assert wf["low"] == 4 and wf["newer"] == 3 and wf["widest"] == 1


def test_bpe_on_documents_table(spark):
    """End-to-end on the synthetic corpus: train, encode, verify
    losslessness on every doc."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    model = bpe_train(docs, vocab_size=200)
    assert len(model.merges) > 50
    enc = bpe_encode(docs, model).select("doc_id", "text", "pieces")
    for r in enc.limit(50).collect():
        joined = "".join(r.pieces).replace(_EOW, " ").strip()
        assert joined == " ".join(r.text.split())


def test_bpe_unicode_whitespace_train_encode_parity(spark):
    """NBSP is NOT a word separator in Java's \\s — encode must agree,
    or real-world text segments differently at train vs encode time and
    losslessness silently breaks."""
    text = "price usd price usd plain words"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    wf = {r.word for r in word_frequencies(docs).collect()}
    assert "price usd" in wf          # trained as ONE word
    model = bpe_train(docs, vocab_size=30)
    [row] = bpe_encode(docs, model).collect()
    assert "".join(row.pieces).replace(_EOW, " ").strip() == text
