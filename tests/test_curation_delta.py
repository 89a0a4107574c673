"""Incremental (delta) curation: the r7 headline contract —

    curate_corpus(old ∪ new) ≡ (curate_corpus(old) − retracted)
                                ∪ curated_new

row-for-row under append-only (monotone-id) ingest, plus the state
maintenance (apply_state_updates) that keeps the contract true across
SUCCESSIVE deltas."""

from __future__ import annotations

from pyspark.sql import functions as F

from dexscraper_spark.plans.curation import (

    CurationConfig,
    DeltaResult,
    apply_state_updates,
    curate_corpus,
    curate_corpus_with_state,
    curate_delta,
    read_curation_state,
    write_curation_state,
)
import pytest


# r13 (VERDICT #6): multi-second delta/maintenance integration lane — the
# full-suite wall time (52 min measured) no longer fits the driver's
# verify budget, and this module is the dominant cost. The default lane
# (`-m "not slow"`, pyproject addopts) keeps every oracle-coverage and
# unit test; run `make test-all` for the complete suite.
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"
CFG = CurationConfig(min_quality=0.3, min_tokens=3,
                     simhash_max_hamming=3, simhash_bands=4)
CURATED_COLS = ["doc_id", "text", "lang", "quality", "n_tokens", "split"]
STATE_COLS = ["doc_id", "exact_h", "simhash", "component"]


def _assert_frames_equal(a, b, cols):
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _check_delta_equivalence(spark, old_docs, new_docs, cfg=CFG):
    """The full contract: corpus equivalence AND state equivalence (the
    applied state must be exactly what a full recompute would store —
    any stale label would surface here even without a third-cluster
    bridge in the fixture)."""
    state_cols = ["doc_id", "exact_h", *cfg.fp_cols, "component"]
    full_cur, full_state = curate_corpus_with_state(
        old_docs.unionByName(new_docs), config=cfg)
    old_cur, old_state = curate_corpus_with_state(old_docs, config=cfg)
    res = curate_delta(new_docs, old_state, config=cfg)

    merged = (old_cur.join(res.retracted, "doc_id", "left_anti")
              .unionByName(res.curated_new.select(*CURATED_COLS)))
    _assert_frames_equal(full_cur, merged, CURATED_COLS)

    next_state = apply_state_updates(old_state, res)
    _assert_frames_equal(full_state, next_state, state_cols)
    return res, next_state


def _real_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d0 = docs.filter(F.col("doc_id") == 0).select("text").first()["text"]
    d1 = docs.filter(F.col("doc_id") == 1).select("text").first()["text"]
    extra = spark.createDataFrame(
        [(100001, d0),                # exact dup of an OLD doc
         (100002, d0 + "."),          # near dup of an OLD doc (hamming 2)
         (100003, d1 + "."),          # near dup of an OLD doc (other batch)
         (100004, "!!! ???"),         # junk — gates drop it
         (100005, "a fresh unique sentence about entirely novel matters"),
         (100006, "a fresh unique sentence about entirely novel matters"),
         ],                           # 100005/100006: exact dup WITHIN delta
        "doc_id long, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("syn").alias("source"), F.length("text").alias("n_chars"))
    return docs, extra


def test_delta_equivalence_on_real_corpus(spark):
    docs, extra = _real_docs(spark)
    hi, lo = docs.select(F.max("doc_id"), F.min("doc_id")).first()
    mid = (hi + lo) // 2
    old = docs.filter(F.col("doc_id") <= mid)
    new = docs.filter(F.col("doc_id") > mid).unionByName(extra)
    res, _ = _check_delta_equivalence(spark, old, new)
    # fixture exercised the interesting paths:
    new_ids = {r["doc_id"] for r in res.curated_new.select("doc_id").collect()}
    assert 100001 not in new_ids        # exact dup vs store dropped
    assert 100002 not in new_ids        # near dup vs store dropped
    assert 100004 not in new_ids        # gated junk dropped
    assert (100005 in new_ids) != (100006 in new_ids) or \
        100006 not in new_ids           # within-batch exact dedup kept min
    assert 100005 in new_ids


def test_delta_successive_rounds_match_full_recompute(spark):
    """Three-way split folded as two successive deltas; each round must
    match the full recompute of everything seen so far, including the
    stored state (label maintenance across rounds)."""
    docs, extra = _real_docs(spark)
    hi = docs.select(F.max("doc_id")).first()[0]
    b0 = docs.filter(F.col("doc_id") <= hi // 3)
    b1 = docs.filter((F.col("doc_id") > hi // 3)
                     & (F.col("doc_id") <= 2 * hi // 3))
    b2 = docs.filter(F.col("doc_id") > 2 * hi // 3).unionByName(extra)

    _, state0 = curate_corpus_with_state(b0, config=CFG)
    res1 = curate_delta(b1, state0, config=CFG)
    state1 = apply_state_updates(state0, res1)
    # round-2 equivalence against the full recompute of b0 ∪ b1 ∪ b2
    full_cur, full_state = curate_corpus_with_state(
        b0.unionByName(b1).unionByName(b2), config=CFG)
    res2 = curate_delta(b2, state1, config=CFG)
    state2 = apply_state_updates(state1, res2)
    _assert_frames_equal(full_state, state2, STATE_COLS)

    cur01 = curate_corpus(b0.unionByName(b1), config=CFG)
    merged = (cur01.join(res2.retracted, "doc_id", "left_anti")
              .unionByName(res2.curated_new.select(*CURATED_COLS)))
    _assert_frames_equal(full_cur, merged, CURATED_COLS)


def _fp_of(spark, text):
    from dexscraper_spark.operators.dedup import simhash
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return simhash(df, id_col="doc_id", text_col="text").first()["simhash"]


def test_delta_bridge_doc_merges_two_old_clusters_and_retracts(spark):
    """The retraction case, crafted: a delta doc near-dups members of
    TWO old clusters that are not near each other → the merged cluster
    keeps the global min; the other old survivor is retracted and the
    bridge doc itself loses."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    fp = _fp_of(spark, text)
    # two stored fingerprints, each hamming-2 from fp, hamming-4 apart
    # (bits {0,1} vs {40,41} → different 16-bit bands), so the crafted
    # state is consistent: a full run would NOT have clustered them
    fp_a = fp ^ 0b11            # cluster label 10
    fp_b = fp ^ (0b11 << 40)    # cluster label 20
    state = spark.createDataFrame(
        [(10, 111, fp_a, 10), (20, 222, fp_b, 20)],
        "doc_id long, exact_h long, simhash long, component long")
    new = spark.createDataFrame([(100, text)], "doc_id long, text string")

    res = curate_delta(new, state, config=CFG)
    assert res.curated_new.count() == 0                       # bridge loses
    assert [r["doc_id"] for r in res.retracted.collect()] == [20]
    assert [(r["old_label"], r["new_label"])
            for r in res.relabeled.collect()] == [(20, 10)]
    st = res.state_new.collect()
    assert len(st) == 1 and st[0]["component"] == 10          # joined cluster


def test_delta_joins_merged_cluster_through_rewritten_label(spark):
    """Membership in a previously-MERGED cluster must resolve through
    the rewritten label: a delta doc bridging a merged-cluster member
    (component already rewritten to 10) and cluster 15 retracts 15."""
    text = "a completely different sentence about shipping delta batches"
    fp = _fp_of(spark, text)
    state = spark.createDataFrame(
        # doc 21 was in cluster 20, which round 1 merged under 10:
        # after apply_state_updates its component reads 10
        [(21, 333, fp ^ (0b11 << 40), 10),
         (15, 444, fp ^ 0b11, 15)],
        "doc_id long, exact_h long, simhash long, component long")
    new = spark.createDataFrame([(200, text)], "doc_id long, text string")
    res = curate_delta(new, state, config=CFG)
    assert [r["doc_id"] for r in res.retracted.collect()] == [15]
    assert res.curated_new.count() == 0


def test_apply_state_updates_rewrites_merged_labels(spark):
    """The label rewrite is not optional (stale labels silently corrupt
    later retraction decisions): every old row under a merged label must
    carry the new label afterwards."""
    state = spark.createDataFrame(
        [(10, 1, 5, 10), (20, 2, 6, 20), (21, 3, 7, 20), (30, 4, 8, 30)],
        "doc_id long, exact_h long, simhash long, component long")
    empty_cur = state.sparkSession.createDataFrame(
        [], "doc_id long, text string, lang string, quality double, "
            "n_tokens int, split string")
    res = DeltaResult(
        curated_new=empty_cur,
        retracted=state.sparkSession.createDataFrame([(20,)], "doc_id long"),
        state_new=state.sparkSession.createDataFrame(
            [(100, 9, 5, 10)], "doc_id long, exact_h long, simhash long, "
                               "component long"),
        relabeled=state.sparkSession.createDataFrame(
            [(20, 10)], "old_label long, new_label long"))
    out = apply_state_updates(state, res)
    got = {r["doc_id"]: r["component"] for r in out.collect()}
    assert got == {10: 10, 20: 10, 21: 10, 30: 30, 100: 10}


def test_state_roundtrip_through_parquet(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(F.col("doc_id") < 40)
    _, state = curate_corpus_with_state(docs, config=CFG)
    p = str(tmp_path / "state")
    write_curation_state(state, p)
    back = read_curation_state(spark, p)
    _assert_frames_equal(state, back, STATE_COLS)


def test_delta_against_empty_state_equals_full_curation(spark):
    """Day-0 degenerate case: a delta against an empty store must be
    exactly curate_corpus of the batch (and retract nothing)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(F.col("doc_id") < 60)
    empty_state = spark.createDataFrame(
        [], "doc_id long, exact_h long, simhash long, component long")
    res = curate_delta(docs, empty_state, config=CFG)
    full = curate_corpus(docs, config=CFG)
    _assert_frames_equal(full, res.curated_new, CURATED_COLS)
    assert res.retracted.count() == 0 and res.relabeled.count() == 0


def test_delta_rejects_non_monotone_ids(spark):
    """The exactness contract silently breaks if delta ids are not all
    greater than stored ids — the default check must fail loudly, and
    check_ids=False must skip it (for ingest paths that guarantee
    monotonicity)."""
    import pytest

    state = spark.createDataFrame(
        [(50, 1, 2, 50)], "doc_id long, exact_h long, simhash long, "
                          "component long")
    new = spark.createDataFrame(
        [(40, "a perfectly reasonable english document with words")],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="append-only"):
        curate_delta(new, state, config=CFG)
    res = curate_delta(new, state, config=CFG, check_ids=False)
    assert res.curated_new.count() >= 0  # runs; caller owns the contract


# ---------------------------------------------------------------------------
# 128-bit (wide) fingerprint tier — the nightly-100TB configuration where
# 16-bit bands saturate with chance candidates (SCALE.md)

WIDE_CFG = CurationConfig(min_quality=0.3, min_tokens=3,
                          simhash_max_hamming=3, fingerprint_bits=128)


def test_delta_equivalence_wide_tier_on_real_corpus(spark):
    """delta ≡ full recuration at fingerprint_bits=128 — same contract,
    wide fingerprints and 4×32-bit banding end to end (state schema
    carries simhash_lo/simhash_hi)."""
    docs, extra = _real_docs(spark)
    hi, lo = docs.select(F.max("doc_id"), F.min("doc_id")).first()
    mid = (hi + lo) // 2
    old = docs.filter(F.col("doc_id") <= mid)
    new = docs.filter(F.col("doc_id") > mid).unionByName(extra)
    res, next_state = _check_delta_equivalence(spark, old, new,
                                               cfg=WIDE_CFG)
    assert {"simhash_lo", "simhash_hi"} <= set(next_state.columns)
    new_ids = {r["doc_id"]
               for r in res.curated_new.select("doc_id").collect()}
    assert 100001 not in new_ids        # exact dup vs store dropped
    assert 100004 not in new_ids        # gated junk dropped
    assert 100005 in new_ids and 100006 not in new_ids


def test_delta_wide_successive_rounds_match_full_recompute(spark):
    docs, extra = _real_docs(spark)
    hi = docs.select(F.max("doc_id")).first()[0]
    b0 = docs.filter(F.col("doc_id") <= hi // 3)
    b1 = docs.filter((F.col("doc_id") > hi // 3)
                     & (F.col("doc_id") <= 2 * hi // 3))
    b2 = docs.filter(F.col("doc_id") > 2 * hi // 3).unionByName(extra)
    wide_cols = ["doc_id", "exact_h", "simhash_lo", "simhash_hi",
                 "component"]

    _, state0 = curate_corpus_with_state(b0, config=WIDE_CFG)
    res1 = curate_delta(b1, state0, config=WIDE_CFG)
    state1 = apply_state_updates(state0, res1)
    full_cur, full_state = curate_corpus_with_state(
        b0.unionByName(b1).unionByName(b2), config=WIDE_CFG)
    res2 = curate_delta(b2, state1, config=WIDE_CFG)
    state2 = apply_state_updates(state1, res2)
    _assert_frames_equal(full_state, state2, wide_cols)

    cur01 = curate_corpus(b0.unionByName(b1), config=WIDE_CFG)
    merged = (cur01.join(res2.retracted, "doc_id", "left_anti")
              .unionByName(res2.curated_new.select(*CURATED_COLS)))
    _assert_frames_equal(full_cur, merged, CURATED_COLS)


def test_delta_rejects_tier_mismatched_state(spark):
    """A 64-bit store fed to a 128-bit-config delta must fail loudly —
    silently banding the wrong columns would corrupt the corpus."""
    import pytest

    state64 = spark.createDataFrame(
        [(50, 1, 2, 50)], "doc_id long, exact_h long, simhash long, "
                          "component long")
    new = spark.createDataFrame(
        [(60, "a perfectly reasonable english document with words")],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="fingerprint_bits"):
        curate_delta(new, state64, config=WIDE_CFG)


def test_wide_tier_rejects_hash_fn_override(spark):
    import pytest

    docs = spark.createDataFrame(
        [(1, "some words that pass the quality and length gates fine")],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="64-bit"):
        curate_corpus(docs, config=WIDE_CFG,
                      simhash_hash_fn=F.xxhash64)


def test_migrate_state_64_to_128_then_delta_matches_full(spark):
    """VERDICT r8 §next-6: an existing 64-bit store can be RETIERED
    in place of a raw rebuild. Contract: migrate_state(docs, state64)
    ≡ curate_corpus_with_state(docs, WIDE_CFG) row-for-row (corpus AND
    state), and a subsequent curate_delta against the migrated store
    reproduces the full 128-bit recuration of old ∪ new."""
    from dexscraper_spark.plans.curation import migrate_state

    wide_state_cols = ["doc_id", "exact_h", "simhash_lo", "simhash_hi",
                       "component"]
    docs, extra = _real_docs(spark)
    hi, lo = docs.select(F.max("doc_id"), F.min("doc_id")).first()
    mid = (hi + lo) // 2
    old = docs.filter(F.col("doc_id") <= mid)
    new = docs.filter(F.col("doc_id") > mid).unionByName(extra)

    # day 0 ran at the 64-bit tier
    _, state64 = curate_corpus_with_state(old, config=CFG)

    # retier: must equal a from-scratch 128-bit run on the same corpus
    cur_m, state_m = migrate_state(old, state64, config=WIDE_CFG)
    full_cur, full_state = curate_corpus_with_state(old, config=WIDE_CFG)
    _assert_frames_equal(full_cur, cur_m, CURATED_COLS)
    _assert_frames_equal(full_state, state_m, wide_state_cols)

    # nightly continues at the new tier against the MIGRATED store
    res = curate_delta(new, state_m, config=WIDE_CFG)
    merged = (cur_m.join(res.retracted, "doc_id", "left_anti")
              .unionByName(res.curated_new.select(*CURATED_COLS)))
    all_cur, all_state = curate_corpus_with_state(
        old.unionByName(new), config=WIDE_CFG)
    _assert_frames_equal(all_cur, merged, CURATED_COLS)
    _assert_frames_equal(all_state, apply_state_updates(state_m, res),
                         wide_state_cols)


def test_migrate_state_noop_same_tier(spark):
    """Migrating to the tier the store already has reproduces the store
    (pure recompute — a sanity pin that the reuse logic is lossless)."""
    from dexscraper_spark.plans.curation import migrate_state

    docs, _ = _real_docs(spark)
    old = docs.limit(300)
    cur0, state0 = curate_corpus_with_state(old, config=CFG)
    cur_m, state_m = migrate_state(old, state0, config=CFG)
    _assert_frames_equal(cur0, cur_m, CURATED_COLS)
    _assert_frames_equal(state0, state_m, STATE_COLS)


def test_config_rejects_bad_fingerprint_bits():
    import pytest

    with pytest.raises(ValueError, match="64 or 128"):
        CurationConfig(fingerprint_bits=96)


def test_wide_tier_rejects_wide_hamming_radius():
    """The 4 x 32-bit banding is pigeonhole-complete only for
    max_hamming < 4: a caller combining fingerprint_bits=128 with a
    larger radius would SILENTLY miss pairs — the config must refuse
    (ADVICE r8). The same radius is fine at the 64-bit tier, whose band
    count is configurable."""
    import pytest

    with pytest.raises(ValueError, match="simhash_max_hamming"):
        CurationConfig(fingerprint_bits=128, simhash_max_hamming=4)
    CurationConfig(fingerprint_bits=128, simhash_max_hamming=3)  # ok
    CurationConfig(fingerprint_bits=64, simhash_max_hamming=4,
                   simhash_bands=8)  # 64-bit tier: radius is free
