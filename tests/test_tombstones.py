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
        == {"tombstoned": 1, "total": 1}
    # append-idempotent
    assert ivf_pq_tombstone(spark, path, one) \
        == {"tombstoned": 0, "total": 1}

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
