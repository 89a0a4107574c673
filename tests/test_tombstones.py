"""ANN tombstones (VERDICT r10 §missing-3).

The nightly delta fold appends new vectors cheaply
(ivf_pq_extend_saved) but retracted/demoted docs' codes stay in the
saved artifact's list files until the next recall-gated republish.
Until then a querier must not be served deleted documents' neighbors:
ivf_pq_tombstone persists the deleted-id set under the LIVE artifact
directory, ivf_pq_query_saved folds it into exclude_ids, and a
republish clears it by construction (fresh version/swap directory, and
the rebuild is corpus-only so the deleted codes are gone too).
"""

from __future__ import annotations

import numpy as np
import pytest

from dexscraper_spark.operators.quantize import (
    ivf_pq_extend_saved, ivf_pq_query_saved, ivf_pq_republish,
    ivf_pq_tombstone, ivf_pq_tombstones)


# r13 (VERDICT #6): multi-second delta/maintenance integration lane — the
# full-suite wall time (52 min measured) no longer fits the driver's
# verify budget, and this module is the dominant cost. The default lane
# (`-m "not slow"`, pyproject addopts) keeps every oracle-coverage and
# unit test; run `make test-all` for the complete suite.
pytestmark = pytest.mark.slow

PARAMS = dict(nlist=8, m=4, ksub=16, seed=11, k=5, n_queries=16,
              nprobe=8, expand=4)


def _vdf(spark, mat, offset=0):
    rows = [(int(i + offset), [float(x) for x in v])
            for i, v in enumerate(mat)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def _ids(df):
    return {r["vec_id"] for r in df.collect()}


@pytest.mark.parametrize("layout", ["swap", "pointer"])
def test_tombstone_excludes_until_republish(spark, tmp_path, layout):
    rng = np.random.default_rng(5)
    anchors = rng.normal(size=(4, 16))
    pts = (anchors[rng.integers(0, 4, 150)]
           + 0.05 * rng.normal(size=(150, 16)))
    corpus = _vdf(spark, pts)
    path = str(tmp_path / "ann")
    assert ivf_pq_republish(spark, corpus, path, layout=layout,
                            **PARAMS)["published"]

    # nprobe == nlist: every list probed, so the exact-reranked top-1
    # is the true nearest — a stable victim to delete
    q = corpus.filter("vec_id = 0")
    hits = ivf_pq_query_saved(spark, path, q, corpus=corpus, k=5,
                              nprobe=8, expand=4)
    ranked = [r["neighbor_id"] for r in hits.orderBy("rank").collect()]
    assert len(ranked) == 5
    victim = ranked[0]

    one = spark.createDataFrame([(int(victim),)], "vec_id long")
    assert ivf_pq_tombstone(spark, path, one) \
        == {"tombstoned": 1, "cleared": 0, "sticky": 0, "total": 1}
    # append-idempotent
    assert ivf_pq_tombstone(spark, path, one) \
        == {"tombstoned": 0, "cleared": 0, "sticky": 0, "total": 1}

    hits2 = ivf_pq_query_saved(spark, path, q, corpus=corpus, k=5,
                               nprobe=8, expand=4)
    got = {r["neighbor_id"] for r in hits2.collect()}
    assert victim not in got
    assert len(got) == 5          # the next-best neighbor filled in

    # the extend fold is unaffected and the marks survive it
    extra = _vdf(spark, anchors[rng.integers(0, 4, 10)]
                 + 0.05 * rng.normal(size=(10, 16)), offset=150)
    assert ivf_pq_extend_saved(spark, path, extra)["appended"] == 10
    assert _ids(ivf_pq_tombstones(spark, path)) == {victim}
    full = corpus.unionByName(extra)
    hits3 = ivf_pq_query_saved(spark, path, q, corpus=full, k=5,
                               nprobe=8, expand=4)
    assert victim not in {r["neighbor_id"] for r in hits3.collect()}

    # republish WITH the victim still in the corpus: the tombstone
    # table is cleared (fresh directory) and the victim is served again
    # — proof the exclusion came from the tombstone set, not the codes
    assert ivf_pq_republish(spark, full, path, **PARAMS)["published"]
    assert ivf_pq_tombstones(spark, path) is None
    # k×expand covers the whole corpus → the rerank is exact, immune
    # to ADC noise from the retrained codebooks; k=15 absorbs the 10
    # extended vectors that may now outrank the old exact top-1
    hits4 = ivf_pq_query_saved(spark, path, q, corpus=full, k=15,
                               nprobe=8, expand=16)
    assert victim in {r["neighbor_id"] for r in hits4.collect()}

    # the real deletion flow: republish on corpus MINUS the deleted id
    # — gone from the rebuilt index itself, no tombstone needed
    no_victim = full.filter(f"vec_id != {victim}")
    assert ivf_pq_republish(spark, no_victim, path,
                            **PARAMS)["published"]
    assert ivf_pq_tombstones(spark, path) is None
    hits5 = ivf_pq_query_saved(spark, path, q, corpus=no_victim, k=15,
                               nprobe=8, expand=16)
    assert victim not in {r["neighbor_id"] for r in hits5.collect()}


def test_query_saved_merges_caller_exclusions(spark, tmp_path):
    """exclude_ids passed by the caller UNION the tombstone set — one
    must not shadow the other."""
    rng = np.random.default_rng(9)
    pts = rng.normal(size=(60, 8))
    corpus = _vdf(spark, pts)
    path = str(tmp_path / "ann")
    assert ivf_pq_republish(spark, corpus, path, nlist=4, m=4, ksub=8,
                            seed=3, k=4, n_queries=8, nprobe=4,
                            expand=4)["published"]
    q = corpus.filter("vec_id = 7")
    base = [r["neighbor_id"] for r in
            ivf_pq_query_saved(spark, path, q, corpus=corpus, k=4,
                               nprobe=4, expand=4)
            .orderBy("rank").collect()]
    ivf_pq_tombstone(spark, path, spark.createDataFrame(
        [(int(base[0]),)], "vec_id long"))
    caller = spark.createDataFrame([(int(base[1]),)], "vec_id long")
    got = {r["neighbor_id"] for r in
           ivf_pq_query_saved(spark, path, q, corpus=corpus, k=4,
                              nprobe=4, expand=4,
                              exclude_ids=caller).collect()}
    assert base[0] not in got and base[1] not in got
    assert len(got) == 4


def test_tombstone_clear_and_retombstone(spark, tmp_path):
    """ADVICE r11: resurrected ids must be clearable from the
    tombstone table (same leased op), an id added and cleared in one
    call errs toward live (clear wins), an all-cleared table is
    deleted (absent == none), and a cleared id can be re-tombstoned
    later (demoted → resurrected → demoted again)."""
    rng = np.random.default_rng(9)
    corpus = _vdf(spark, rng.normal(size=(80, 16)))
    path = str(tmp_path / "ann")
    assert ivf_pq_republish(spark, corpus, path, **PARAMS)["published"]

    def _ids_df(vals):
        return spark.createDataFrame([(int(v),) for v in vals],
                                     "vec_id long")

    empty = spark.createDataFrame([], "vec_id long")
    assert ivf_pq_tombstone(spark, path, _ids_df([1, 2])) \
        == {"tombstoned": 2, "cleared": 0, "sticky": 0, "total": 2}
    # add 3, resurrect 1 — one leased op
    assert ivf_pq_tombstone(spark, path, _ids_df([3]),
                            clear_ids=_ids_df([1])) \
        == {"tombstoned": 1, "cleared": 1, "sticky": 0, "total": 2}
    assert _ids(ivf_pq_tombstones(spark, path)) == {2, 3}
    # same id added AND cleared: clear wins (errs toward serving);
    # clearing an absent id is a no-op
    assert ivf_pq_tombstone(spark, path, _ids_df([4]),
                            clear_ids=_ids_df([4])) \
        == {"tombstoned": 0, "cleared": 0, "sticky": 0, "total": 2}
    # all-cleared table is deleted, not left empty
    assert ivf_pq_tombstone(spark, path, empty,
                            clear_ids=_ids_df([2, 3])) \
        == {"tombstoned": 0, "cleared": 2, "sticky": 0, "total": 0}
    assert ivf_pq_tombstones(spark, path) is None
    # re-tombstone after a clear (demoted again after resurrection)
    assert ivf_pq_tombstone(spark, path, _ids_df([2])) \
        == {"tombstoned": 1, "cleared": 0, "sticky": 0, "total": 1}
    assert _ids(ivf_pq_tombstones(spark, path)) == {2}


def test_tombstone_pressure_signal(spark, tmp_path, capsys):
    """VERDICT r11 §next-6: the tombstone set grows until a republish;
    ivf_pq_tombstone_pressure reports the dead-weight fraction, and
    `ann --mode query` surfaces it on stderr with a republish
    recommendation once it crosses TOMBSTONE_REPUBLISH_FRACTION."""
    from dexscraper_spark.cli import run
    from dexscraper_spark.operators.quantize import (
        ivf_pq_tombstone_pressure)

    rng = np.random.default_rng(13)
    corpus = _vdf(spark, rng.normal(size=(150, 16)))
    path = str(tmp_path / "ann")
    assert ivf_pq_republish(spark, corpus, path, **PARAMS)["published"]
    assert ivf_pq_tombstone_pressure(spark, path) \
        == {"tombstones": 0, "indexed": 150, "fraction": 0.0}

    qp = str(tmp_path / "q")
    corpus.limit(2).write.parquet(qp)

    def _ids_df(vals):
        return spark.createDataFrame([(int(v),) for v in vals],
                                     "vec_id long")

    # 10/150 = 6.7%: fraction reported, no recommendation yet
    ivf_pq_tombstone(spark, path, _ids_df(range(10)))
    assert run(["ann", "--mode", "query", "--index", path,
                "--queries", qp, "--k", "3", "--nprobe", "8"],
               spark=spark) == 0
    err = capsys.readouterr().err
    assert "tombstone_fraction=0.0667" in err
    assert "WARNING" not in err

    # 40/150 = 26.7% ≥ 20%: loud republish recommendation
    ivf_pq_tombstone(spark, path, _ids_df(range(40)))
    assert ivf_pq_tombstone_pressure(spark, path)["fraction"] == 0.2667
    assert run(["ann", "--mode", "query", "--index", path,
                "--queries", qp, "--k", "3", "--nprobe", "8"],
               spark=spark) == 0
    err = capsys.readouterr().err
    assert "tombstone_fraction=0.2667" in err
    assert "WARNING" in err and "republish" in err

    # a republish on the live corpus resets the signal
    live = corpus.filter("vec_id >= 40")
    assert ivf_pq_republish(spark, live, path, **PARAMS)["published"]
    assert ivf_pq_tombstone_pressure(spark, path) \
        == {"tombstones": 0, "indexed": 110, "fraction": 0.0}


def test_sticky_tombstone_survives_clear(spark, tmp_path):
    """Round 12 upsert contract: a changed doc's indexed code encodes
    SUPERSEDED text, so its tombstone is STICKY — a later resurrection
    clear (which correctly re-exposes a demoted doc's still-valid
    code) must NOT re-expose the stale one. Only a republish's
    corpus-only rebuild removes it. Also pins the sticky upgrade of an
    existing plain mark and clear-vs-sticky precedence in one call."""
    rng = np.random.default_rng(21)
    corpus = _vdf(spark, rng.normal(size=(80, 16)))
    path = str(tmp_path / "ann")
    assert ivf_pq_republish(spark, corpus, path, **PARAMS)["published"]

    def _ids_df(vals):
        return spark.createDataFrame([(int(v),) for v in vals],
                                     "vec_id long")

    empty = spark.createDataFrame([], "vec_id long")
    # plain demotion mark + sticky upsert mark in one leased op
    assert ivf_pq_tombstone(spark, path, _ids_df([1]),
                            sticky_ids=_ids_df([2])) \
        == {"tombstoned": 2, "cleared": 0, "sticky": 1, "total": 2}
    # resurrection clears BOTH: the plain mark goes, the sticky stays
    assert ivf_pq_tombstone(spark, path, empty,
                            clear_ids=_ids_df([1, 2])) \
        == {"tombstoned": 0, "cleared": 1, "sticky": 1, "total": 1}
    assert _ids(ivf_pq_tombstones(spark, path)) == {2}
    # clearing it again alone is still a no-op (idempotent immunity)
    assert ivf_pq_tombstone(spark, path, empty,
                            clear_ids=_ids_df([2]))["total"] == 1
    # an id in both sticky_ids and clear_ids in ONE call: sticky wins
    # (stale-content mark outranks the resurrection)
    assert ivf_pq_tombstone(spark, path, empty,
                            sticky_ids=_ids_df([3]),
                            clear_ids=_ids_df([3])) \
        == {"tombstoned": 1, "cleared": 0, "sticky": 2, "total": 2}
    # upgrading an existing plain mark to sticky: a later clear no
    # longer removes it
    assert ivf_pq_tombstone(spark, path, _ids_df([4]))["total"] == 3
    assert ivf_pq_tombstone(spark, path, empty,
                            sticky_ids=_ids_df([4]))["sticky"] == 3
    assert ivf_pq_tombstone(spark, path, empty,
                            clear_ids=_ids_df([4]))["total"] == 3
    assert _ids(ivf_pq_tombstones(spark, path)) == {2, 3, 4}
    # the query path excludes sticky ids like any tombstone
    q = corpus.filter("vec_id = 2")
    hits = ivf_pq_query_saved(spark, path, q, corpus=corpus, k=5,
                              nprobe=8, expand=4)
    assert 2 not in {r["neighbor_id"] for r in hits.collect()}
    # republish drops the whole set, sticky included
    assert ivf_pq_republish(spark, corpus, path, **PARAMS)["published"]
    assert ivf_pq_tombstones(spark, path) is None


def test_sticky_tombstone_upgrades_presticky_table(spark, tmp_path):
    """A tombstone table written by the r11 (single-column) format is
    upgraded in place on the first write that needs stickiness: the
    one-column dir is rewritten two-column via the sibling swap (an
    APPEND of two-column files would leave readers schema-dependent on
    file order), existing marks stay plain, and both formats read back
    through ivf_pq_tombstones identically."""
    rng = np.random.default_rng(22)
    corpus = _vdf(spark, rng.normal(size=(40, 16)))
    path = str(tmp_path / "ann")
    assert ivf_pq_republish(spark, corpus, path, **PARAMS)["published"]

    from dexscraper_spark import fsio
    resolved = fsio.pointer_resolve(spark, path)
    dst = fsio.join(resolved, "tombstones")
    # hand-write the r11 format: (vec_id) only
    spark.createDataFrame([(5,), (6,)], "vec_id long") \
        .coalesce(1).write.parquet(dst)
    assert _ids(ivf_pq_tombstones(spark, path)) == {5, 6}

    def _ids_df(vals):
        return spark.createDataFrame([(int(v),) for v in vals],
                                     "vec_id long")

    # plain append onto the old format forces the schema upgrade too
    assert ivf_pq_tombstone(spark, path, _ids_df([7])) \
        == {"tombstoned": 1, "cleared": 0, "sticky": 0, "total": 3}
    tdf = spark.read.parquet(dst)
    assert set(tdf.columns) == {"vec_id", "sticky"}
    assert {r["vec_id"] for r in tdf.filter("sticky").collect()} \
        == set()
    # old marks stayed plain: a clear removes them
    empty = spark.createDataFrame([], "vec_id long")
    assert ivf_pq_tombstone(spark, path, empty,
                            clear_ids=_ids_df([5]))["total"] == 2
    # sticky add now appends in the new format without a rewrite
    assert ivf_pq_tombstone(spark, path, empty,
                            sticky_ids=_ids_df([8]))["sticky"] == 1
    assert _ids(ivf_pq_tombstones(spark, path)) == {6, 7, 8}
