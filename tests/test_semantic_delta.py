"""semantic_dedup_delta — exact incremental fold of new vectors into a
stored semantic-dedup state (VERDICT r9 §next-1, the semantic leg of
`pipeline --delta`).

Geometry discipline: every blob is tight (within-blob cosine >
threshold) and blobs are near-orthogonal, so the coarse k-means
co-blocks every true pair under BOTH the bootstrap and the rebuild
clustering — the delta's exactness contract holds and results compare
row-for-row against a from-scratch semantic_dedup of the merged corpus.
"""

from __future__ import annotations

import math

import pytest


# r13 (VERDICT #6): multi-second delta/maintenance integration lane — the
# full-suite wall time (52 min measured) no longer fits the driver's
# verify budget, and this module is the dominant cost. The default lane
# (`-m "not slow"`, pyproject addopts) keeps every oracle-coverage and
# unit test; run `make test-all` for the complete suite.
pytestmark = pytest.mark.slow

THRESHOLD = 0.95
DIM = 8


def _vec(axis: int, jitter: float = 0.0, other: int | None = None):
    """Unit vector on ``axis`` with a small rotation toward ``other`` —
    cos(v0, v_jitter) = cos(jitter) ≈ 1 for small jitter."""
    v = [0.0] * DIM
    v[axis] = math.cos(jitter)
    v[(other if other is not None else (axis + 1) % DIM)] = \
        math.sin(jitter)
    return v


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")


def _full(emb, **kw):
    from dexscraper_spark.operators.dedup import semantic_dedup_with_state
    return semantic_dedup_with_state(emb, nlist=4, threshold=THRESHOLD,
                                     seed=11, **kw)


def _delta(new_emb, state, **kw):
    from dexscraper_spark.operators.dedup import semantic_dedup_delta
    return semantic_dedup_delta(new_emb, state, nlist=4,
                                threshold=THRESHOLD, seed=11, **kw)


def _ids(df, col="vec_id"):
    return sorted(r[col] for r in df.select(col).collect())


def _winners(state_df):
    return sorted(r.vec_id for r in state_df.collect()
                  if r.vec_id == r.component)


BASE = [
    # blob A on axis 0: 1 wins, 2 is a semantic loser
    (1, _vec(0)), (2, _vec(0, 0.05)),
    # blob B on axis 1: singleton
    (10, _vec(1)),
    # blob C on axis 2: 20 wins over 21
    (20, _vec(2)), (21, _vec(2, 0.04)),
    # lone far-away doc on axis 3
    (30, _vec(3)),
]


def test_delta_append_only_matches_full_rebuild(spark):
    """New vectors: one dups an old blob (drops), one lands in a fresh
    blob pair (min-new-id wins), one is novel (kept). State after the
    fold ≡ the full rebuild's state row-for-row."""
    from dexscraper_spark.persist import release_tracked

    base = _emb(spark, BASE)
    _, state0 = _full(base)
    state0 = state0.toPandas()
    state0_df = spark.createDataFrame(state0)

    new = [(100, _vec(1, 0.03)),            # dups blob B → drop (10 wins)
           (101, _vec(4)), (102, _vec(4, 0.05)),  # new blob: 101 wins
           (103, _vec(5))]                  # novel singleton
    new_emb = _emb(spark, new)
    res = _delta(new_emb, state0_df)
    try:
        assert _ids(res.kept_new) == [101, 103]
        assert _ids(res.dropped_new) == [100, 102]
        assert _ids(res.resurrected) == []
        assert _ids(res.demoted) == []

        merged = _emb(spark, BASE + new)
        surv_full, state_full = _full(merged)
        state_delta = sorted(map(tuple, res.state.collect()))
        assert state_delta == sorted(map(tuple, state_full.collect()))
        # published set identity: old winners − demoted + kept_new
        assert sorted(set(_winners(state0_df)) | {101, 103}) == \
            _ids(surv_full)
    finally:
        release_tracked()


def test_delta_bridge_demotes_old_winner(spark):
    """A new vector within threshold of BOTH blob A and blob C (placed
    on the A–C bisector with both cosines > threshold is impossible for
    orthogonal blobs, so the bridge blob is crafted adjacent): old
    winner of the larger-id group must be demoted, exactly like the
    full rebuild."""
    from dexscraper_spark.persist import release_tracked

    # two tight blobs ~11° apart: within-blob cos ≈ 1, across ≈ 0.98
    rows = [(1, _vec(0)), (2, _vec(0, 0.02)),
            (50, _vec(0, 0.19)), (51, _vec(0, 0.21))]
    base = _emb(spark, rows)
    # threshold 0.995: within-blob pairs (cos ≥ 0.9998) yes; across-blob
    # (cos(0.17) ≈ 0.9856) no → two components, winners 1 and 50
    from dexscraper_spark.operators.dedup import (semantic_dedup_delta,
                                                  semantic_dedup_with_state)
    _, state0 = semantic_dedup_with_state(base, nlist=1, threshold=0.995,
                                          seed=11)
    state0_df = spark.createDataFrame(state0.toPandas())
    assert _winners(state0_df) == [1, 50]

    # bridge at 0.10 rad: cos to blob1 ≈ cos(0.10)=0.995, to blob2 ≈
    # cos(0.09)=0.996 → connects both
    new_emb = _emb(spark, [(100, _vec(0, 0.10))])
    res = semantic_dedup_delta(new_emb, state0_df, nlist=1,
                               threshold=0.995, seed=11)
    try:
        assert _ids(res.dropped_new) == [100]
        assert _ids(res.demoted) == [50]   # merged under label 1
        assert _ids(res.resurrected) == []
        merged = base.unionByName(new_emb)
        _, state_full = semantic_dedup_with_state(merged, nlist=1,
                                                  threshold=0.995, seed=11)
        assert sorted(map(tuple, res.state.collect())) == \
            sorted(map(tuple, state_full.collect()))
    finally:
        release_tracked()


def test_delta_retraction_resurrects_loser(spark):
    """Upstream curation retracts blob C's winner (20): survivor 21 must
    be RESURRECTED (a full rebuild without doc 20 publishes it), and the
    state re-labels the group under 21."""
    from dexscraper_spark.persist import release_tracked

    base = _emb(spark, BASE)
    _, state0 = _full(base)
    state0_df = spark.createDataFrame(state0.toPandas())

    removed = spark.createDataFrame([(20,)], "vec_id long")
    new_emb = _emb(spark, [(100, _vec(6))])  # unrelated novel doc
    res = _delta(new_emb, state0_df, removed_ids=removed)
    try:
        assert _ids(res.kept_new) == [100]
        assert _ids(res.resurrected) == [21]
        assert _ids(res.demoted) == []
        # full rebuild on the day-N universe (base minus 20, plus new)
        merged = _emb(spark, [r for r in BASE if r[0] != 20]
                      + [(100, _vec(6))])
        surv_full, state_full = _full(merged)
        assert sorted(map(tuple, res.state.collect())) == \
            sorted(map(tuple, state_full.collect()))
        assert 21 in _ids(surv_full)
    finally:
        release_tracked()


def test_delta_retraction_of_loser_is_noop_for_publication(spark):
    """Retracting a semantic LOSER (2) must not change published
    winners — the group re-resolves to the same winner (1)."""
    from dexscraper_spark.persist import release_tracked

    base = _emb(spark, BASE)
    _, state0 = _full(base)
    state0_df = spark.createDataFrame(state0.toPandas())
    removed = spark.createDataFrame([(2,)], "vec_id long")
    res = _delta(_emb(spark, [(100, _vec(6))]), state0_df,
                 removed_ids=removed)
    try:
        assert _ids(res.resurrected) == []
        assert _ids(res.demoted) == []
        # state no longer holds the removed id
        assert 2 not in _ids(res.state)
    finally:
        release_tracked()


def test_delta_monotone_id_check(spark):
    base = _emb(spark, BASE)
    _, state0 = _full(base)
    state0_df = spark.createDataFrame(state0.toPandas())
    with pytest.raises(ValueError, match="append-only"):
        _delta(_emb(spark, [(5, _vec(7))]), state0_df)


def test_two_deltas_compose(spark):
    """bootstrap + delta1 + delta2 ≡ one full rebuild — the N-day fold
    the nightly pipeline runs."""
    from dexscraper_spark.persist import release_tracked

    base = _emb(spark, BASE)
    _, state0 = _full(base)
    s = spark.createDataFrame(state0.toPandas())

    # blob-mates are bit-identical vectors here: identical points share
    # the argmin list under ANY k-means layout (ties break to the lowest
    # list id for both), so co-blocking — the delta's stated
    # precondition — holds regardless of where init centers land
    d1 = [(100, _vec(4)), (101, _vec(4))]
    r1 = _delta(_emb(spark, d1), s)
    s = spark.createDataFrame(r1.state.toPandas())

    d2 = [(200, _vec(4)), (201, _vec(0))]
    r2 = _delta(_emb(spark, d2), s)
    try:
        assert _ids(r1.kept_new) == [100]
        assert _ids(r2.kept_new) == []     # 200 dups 100, 201 dups blob A
        merged = _emb(spark, BASE + d1 + d2)
        _, state_full = _full(merged)
        assert sorted(map(tuple, r2.state.collect())) == \
            sorted(map(tuple, state_full.collect()))
    finally:
        release_tracked()


def test_delta_assign_n2_boundary_pair_and_rebuild_equivalence(spark):
    """VERDICT r10 §next-6 (assign_n=2 delta support): the pinned
    boundary-pair corpus — a near-dup pair straddling a k-means
    boundary, MISSED at assign_n=1 and CAUGHT at assign_n=2
    (test_lake_and_pairs pins the rebuild) — keeps that behavior when
    the second endpoint arrives via a DELTA fold, and the folded state
    equals the assign_n=2 full rebuild's row-for-row. The fold's
    coarse index is built over universe ∪ delta = exactly the merged
    corpus, so its multi-assignment co-blocking matches the rebuild's
    deterministically."""
    import numpy as np

    from dexscraper_spark.operators.dedup import (
        semantic_dedup_delta, semantic_dedup_with_state)
    from dexscraper_spark.persist import release_tracked

    rng = np.random.default_rng(17)
    dim = 8
    anchors = np.zeros((4, dim))
    anchors[0, 0], anchors[1, 0] = 1.0, -1.0
    anchors[2, 2], anchors[3, 2] = 1.0, -1.0
    blob = np.repeat(anchors, 60, axis=0) \
        + 0.03 * rng.normal(size=(240, dim))
    u = np.zeros(dim); u[1], u[2], u[0] = 1.0, 0.1, -0.15
    v = np.zeros(dim); v[1], v[2], v[0] = 1.0, 0.1, 0.15
    rows_old = [(i, [float(x) for x in w]) for i, w in enumerate(blob)]
    rows_old.append((1000, [float(x) for x in u]))
    old = spark.createDataFrame(rows_old,
                                "vec_id long, embedding array<float>")
    new = spark.createDataFrame(
        [(1001, [float(x) for x in v])],
        "vec_id long, embedding array<float>")
    kw = dict(nlist=4, threshold=0.9, seed=5)

    try:
        for n, caught in ((1, False), (2, True)):
            _, state = semantic_dedup_with_state(old, assign_n=n, **kw)
            state_df = spark.createDataFrame(state.toPandas())
            res = semantic_dedup_delta(new, state_df, assign_n=n, **kw)
            if caught:
                assert _ids(res.dropped_new) == [1001]
                assert _ids(res.kept_new) == []
            else:
                assert _ids(res.kept_new) == [1001]
                assert _ids(res.dropped_new) == []
            # folded state ≡ the rebuild's at the same assign_n
            merged = old.unionByName(new)
            _, state_full = semantic_dedup_with_state(
                merged, assign_n=n, **kw)
            assert sorted(map(tuple, res.state.collect())) == \
                sorted(map(tuple, state_full.collect()))
    finally:
        release_tracked()
