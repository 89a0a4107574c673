"""Sequence packing: concat-and-chunk (distributed prefix sum) and
first-fit-sequential bin packing, pinned against single-threaded Python
references and partitioning-independence checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from dexscraper_spark.operators.packing import (
    chunk_token_stream, pack_greedy)

SF = "/root/testdata/sf0.001"
CAP = 64


def _docs(spark):
    from dexscraper_spark.functions.textstats import token_count
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", token_count(F.col("text"))
                    .cast("long").alias("n_tokens")))


def test_chunk_token_stream_matches_reference(spark):
    """Row-for-row equal to the obvious sequential chunker, and the
    core invariants: all interior chunks hold exactly CAP tokens, every
    document's tokens covered once in order."""
    docs = _docs(spark)
    rows = sorted((r["doc_id"], r["n_tokens"])
                  for r in docs.filter(F.col("n_tokens") > 0).collect())
    # sequential reference
    want, end = [], 0
    for did, n in rows:
        start, end = end, end + n
        for c in range(start // CAP, (end - 1) // CAP + 1):
            want.append((c, did, max(0, c * CAP - start),
                         min(n, (c + 1) * CAP - start)))
    got = sorted(tuple(r) for r in
                 chunk_token_stream(docs, max_tokens=CAP,
                                    num_partitions=7).collect())
    assert got == sorted(want)

    # invariants straight off the result
    per_chunk = {}
    for c, did, ts, te in got:
        per_chunk[c] = per_chunk.get(c, 0) + (te - ts)
    last = max(per_chunk)
    assert all(v == CAP for c, v in per_chunk.items() if c != last)
    assert 0 < per_chunk[last] <= CAP
    covered = {}
    for c, did, ts, te in got:
        covered.setdefault(did, []).append((c, ts, te))
    sizes = dict(rows)
    for did, spans in covered.items():
        spans.sort()
        assert spans[0][1] == 0 and spans[-1][2] == sizes[did]
        for (c1, _, e1), (c2, s2, _) in zip(spans, spans[1:]):
            assert c2 == c1 + 1 and s2 == e1  # contiguous, in order


def test_chunk_token_stream_partitioning_independent(spark):
    """The distributed prefix sum must not depend on the physical
    layout: a shuffled, differently-partitioned input chunks
    identically."""
    docs = _docs(spark)
    a = sorted(tuple(r) for r in
               chunk_token_stream(docs, max_tokens=CAP,
                                  num_partitions=3).collect())
    b = sorted(tuple(r) for r in
               chunk_token_stream(docs.repartition(13), max_tokens=CAP,
                                  num_partitions=11).collect())
    assert a == b


def test_pack_greedy_matches_reference_and_caps(spark):
    docs = _docs(spark)
    out = pack_greedy(docs, max_tokens=CAP, num_shards=8).collect()
    # per-shard python reference (same order, same greedy rule)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    import collections
    fills = collections.Counter()
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        local, fill, want_bins = -1, 0, []
        for r in rs:
            n = r["n_tokens"]
            if n > CAP:
                local += 1
                want_bins.append((local, True))
                fill = CAP + 1
                continue
            if local < 0 or fill + n > CAP:
                local += 1
                fill = 0
            want_bins.append((local, False))
            fill += n
        for r, (lb, ov) in zip(rs, want_bins):
            assert r["bin_id"] == shard * (1 << 40) + lb
            assert r["oversize"] == ov
            fills[r["bin_id"]] += r["n_tokens"]
    for r in out:
        if not r["oversize"]:
            assert fills[r["bin_id"]] <= CAP
    # every doc packed exactly once
    assert len(out) == docs.count()
    assert len({r["doc_id"] for r in out}) == len(out)


def test_pack_greedy_partitioning_independent(spark):
    docs = _docs(spark)
    a = sorted(tuple(r) for r in
               pack_greedy(docs, max_tokens=CAP, num_shards=8).collect())
    b = sorted(tuple(r) for r in
               pack_greedy(docs.repartition(17), max_tokens=CAP,
                           num_shards=8).collect())
    assert a == b


def test_pack_greedy_zero_size_after_oversize_and_string_ids(spark):
    """Regression (r7 review): a zero-token doc right after an oversize
    doc must open a fresh bin, not join the flagged bin (which would
    put a non-oversize row in an over-capacity bin); and string doc ids
    (content hashes — the common case) must pass through with their
    type intact."""
    rows = [("aaa", 100), ("aab", 0), ("aac", 10), ("aad", 10)]
    docs = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    out = pack_greedy(docs, id_col="doc_id", size_col="n_tokens",
                      max_tokens=CAP, num_shards=1)
    assert dict(out.dtypes)["doc_id"] == "string"
    r = {x["doc_id"]: x for x in out.collect()}
    assert r["aaa"]["oversize"] is True
    assert r["aab"]["oversize"] is False
    assert r["aab"]["bin_id"] != r["aaa"]["bin_id"]
    assert r["aab"]["bin_id"] == r["aac"]["bin_id"] == r["aad"]["bin_id"]


def test_packing_validates_arguments(spark):
    import pytest
    docs = _docs(spark)
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_token_stream(docs, max_tokens=0)
    with pytest.raises(ValueError, match="max_tokens"):
        pack_greedy(docs, max_tokens=-5)
    neg = spark.createDataFrame([(1, -3)], "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="negative"):
        pack_greedy(neg, max_tokens=CAP, num_shards=1).collect()


# ---------------------------------------------------------------------------
# Sliding-window document splitting


def test_split_documents_matches_reference(spark):
    """Window starts/contents row-for-row vs a sequential Python
    reference over real docs, across disjoint and overlapping
    strides."""
    from dexscraper_spark.operators.packing import split_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").filter(F.col("doc_id") < 120)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    for m, s in ((32, 32), (32, 16), (10, 3)):
        got = {(r["doc_id"], r["window_id"]):
               (r["window_start"], r["n_window_tokens"], r["window_text"])
               for r in split_documents(docs, max_tokens=m,
                                        stride=s).collect()}
        want = {}
        for did, text in texts.items():
            toks = text.split()
            if not toks:
                continue
            k = 0
            start = 0
            while True:
                w = toks[start:start + m]
                if not w:
                    break
                if len(w) >= 1 and (len(w) >= 1 or start == 0):
                    want[(did, k)] = (start, len(w), " ".join(w))
                k += 1
                if start + m >= len(toks):
                    break
                start += s
            # min_tail=1 default: every non-empty window kept
        assert got == want, (m, s)


def test_split_documents_coverage_and_overlap(spark):
    """Every token position is covered by some window; consecutive
    windows overlap by exactly max_tokens − stride (except the tail)."""
    from dexscraper_spark.operators.packing import split_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100)))],
        "doc_id long, text string")
    rows = sorted(split_documents(docs, max_tokens=16, stride=10)
                  .collect(), key=lambda r: r["window_id"])
    covered = set()
    for r in rows:
        covered.update(range(r["window_start"],
                             r["window_start"] + r["n_window_tokens"]))
    assert covered == set(range(100))
    for a, b in zip(rows, rows[1:]):
        assert b["window_start"] - a["window_start"] == 10


def test_split_documents_short_null_and_tail(spark):
    from dexscraper_spark.operators.packing import split_documents

    docs = spark.createDataFrame(
        [(1, "only three tokens"),     # short doc passes whole
         (2, None),                    # NULL -> no rows
         (3, ""),                      # empty -> no rows
         (4, " ".join(f"w{i}" for i in range(21)))],  # 21 toks
        "doc_id long, text string")
    # min_tail=5: doc 4 at m=10,s=10 gives windows of 10,10,1 — the
    # 1-token tail is dropped
    rows = split_documents(docs, max_tokens=10, stride=10,
                           min_tail=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_window_tokens"] == 3
    assert 2 not in by_doc and 3 not in by_doc
    assert [r["n_window_tokens"] for r in
            sorted(by_doc[4], key=lambda r: r["window_id"])] == [10, 10]


def test_split_documents_validation_and_plan(spark):
    import pytest

    from dexscraper_spark.operators.packing import split_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_tokens"):
        split_documents(docs, max_tokens=0)
    with pytest.raises(ValueError, match="stride"):
        split_documents(docs, max_tokens=8, stride=9)
    plan = split_documents(docs, max_tokens=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan    # pure map-side: no shuffle


def test_split_documents_preserves_case_and_validates_min_tail(spark):
    import pytest

    from dexscraper_spark.operators.packing import split_documents

    docs = spark.createDataFrame(
        [(1, "The CEO of IBM said No")], "doc_id long, text string")
    rows = split_documents(docs, max_tokens=4, stride=4).collect()
    texts = [r["window_text"] for r in
             sorted(rows, key=lambda r: r["window_id"])]
    assert texts == ["The CEO of IBM", "said No"]   # verbatim case
    with pytest.raises(ValueError, match="min_tail"):
        split_documents(docs, max_tokens=4, min_tail=5)
