"""Product quantization: reconstruction quality, encode determinism,
ADC recall vs brute force, refined recall, codebook persistence."""

from __future__ import annotations

import numpy as np
import pytest

from dexscraper_spark.operators.quantize import (
    pq_encode, pq_load, pq_save, pq_topk, pq_topk_refined, pq_train,
)
from dexscraper_spark.operators.similarity import cosine_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("vec_id", "embedding")


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, dim=64, m=16, ksub=64, seed=7)


def _unit(mat):
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def test_pq_reconstruction_beats_zero_baseline(emb, books):
    """Decoding each vector from its codebook centroids must recover
    most of the (normalized) signal: quantization MSE well under the
    unit-vector energy 1.0 that the all-zeros 'codebook' would score."""
    codes = {r.vec_id: r.code for r in pq_encode(emb, books).collect()}
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    assert all(len(c) == books.m for c in codes.values())
    errs = []
    for vid, v in vecs.items():
        u = _unit(v[None, :])[0]
        rec = np.concatenate([books.centers[j, codes[vid][j]]
                              for j in range(books.m)])
        errs.append(((u - rec) ** 2).sum())
    assert np.mean(errs) < 0.25  # vs 1.0 for the zero baseline


def test_pq_encode_partition_independent(emb, books):
    a = {r.vec_id: r.code
         for r in pq_encode(emb.repartition(3), books).collect()}
    b = {r.vec_id: r.code
         for r in pq_encode(emb.repartition(11), books).collect()}
    assert a == b


def test_pq_train_deterministic(emb):
    b1 = pq_train(emb, dim=64, m=16, ksub=64, seed=7)
    b2 = pq_train(emb, dim=64, m=16, ksub=64, seed=7)
    assert np.array_equal(b1.centers, b2.centers)


def test_pq_adc_recall_vs_brute_force(spark, emb, books):
    """ADC alone (no refine) must place most true neighbors in its
    expanded candidate set."""
    queries = emb.orderBy("vec_id").limit(8)
    exact = cosine_topk(emb, queries, k=5)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

    codes = pq_encode(emb, books)
    approx = pq_topk(codes.repartition(4), queries, books, k=20)
    approx_sets = {}
    for r in approx.collect():
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

    recalls = [len(approx_sets.get(q, set()) & s) / len(s)
               for q, s in exact_sets.items()]
    assert sum(recalls) / len(recalls) >= 0.5


def test_pq_refined_topk_matches_exact_on_candidates(spark, emb, books):
    """Refined output must (a) rank by exact cosine, (b) beat raw ADC
    recall@5, (c) carry the ivf_query-compatible schema."""
    queries = emb.orderBy("vec_id").limit(8)
    exact = cosine_topk(emb, queries, k=5)
    exact_top = {}
    for r in exact.collect():
        exact_top.setdefault(r.query_id, set()).add(r.neighbor_id)

    codes = pq_encode(emb, books)
    ref = pq_topk_refined(emb, codes, queries, books, k=5, expand=8)
    assert ref.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    got = {}
    cosines = {}
    for r in ref.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
        cosines[(r.query_id, r.neighbor_id)] = r.cosine
    recalls = [len(got.get(q, set()) & s) / len(s)
               for q, s in exact_top.items()]
    assert sum(recalls) / len(recalls) >= 0.7
    # re-ranked cosines are the EXACT ones (same fold + rounding as
    # cosine_topk): any overlap pair must agree bit-for-bit
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine
                 for r in exact.collect()}
    shared = set(cosines) & set(exact_cos)
    assert shared
    assert all(cosines[p] == exact_cos[p] for p in shared)


def test_pq_save_load_roundtrip(spark, emb, books, tmp_path):
    path = str(tmp_path / "pq_books")
    pq_save(spark, books, path)
    loaded = pq_load(spark, path)
    assert np.array_equal(loaded.centers, books.centers)
    assert (loaded.dim, loaded.m, loaded.ksub, loaded.normalize) == \
        (books.dim, books.m, books.ksub, books.normalize)
    # codes from the loaded books are identical
    a = {r.vec_id: r.code for r in pq_encode(emb, books).collect()}
    b = {r.vec_id: r.code for r in pq_encode(emb, loaded).collect()}
    assert a == b


def test_pq_encode_rejects_wrong_dim(spark, books):
    bad = spark.createDataFrame([(1, [0.1] * 32)],
                                "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="64-dim"):
        pq_encode(bad, books).collect()


def test_pq_encode_skip_bad_nulls_and_search_ignores(spark, emb, books):
    """skip_bad=True NULLs malformed rows instead of killing the job;
    pq_topk drops NULL codes and still searches the good rows."""
    mixed = spark.createDataFrame(
        [(90001, [0.1] * 32), (90002, None)],
        "vec_id long, embedding array<double>")
    src = emb.select("vec_id",
                     emb.embedding.cast("array<double>").alias("embedding")) \
        .unionByName(mixed)
    codes = pq_encode(src, books, skip_bad=True)
    rows = {r.vec_id: r.code for r in codes.collect()}
    assert rows[90001] is None and rows[90002] is None
    assert sum(c is not None for c in rows.values()) == len(rows) - 2
    queries = emb.orderBy("vec_id").limit(2)
    out = pq_topk(codes, queries, books, k=3).collect()
    assert out and all(r.neighbor_id not in (90001, 90002) for r in out)


def test_pq_topk_partition_independent(spark, emb, books):
    """Exact ADC ties (duplicate vectors → identical codes) must not
    make results depend on partitioning."""
    dup = emb.limit(40)  # duplicate a block of vectors with new ids
    shifted = dup.select((dup.vec_id + 50_000).alias("vec_id"),
                         "embedding")
    corpus = emb.unionByName(shifted)
    codes = pq_encode(corpus, books)
    queries = emb.orderBy("vec_id").limit(4)
    a = sorted(map(tuple, pq_topk(codes.repartition(2), queries, books,
                                  k=10).collect()))
    b = sorted(map(tuple, pq_topk(codes.repartition(17), queries, books,
                                  k=10).collect()))
    assert a == b


def test_pq_load_rejects_incomplete_codebook(spark, books, tmp_path):
    path = str(tmp_path / "pq_bad")
    pq_save(spark, books, path)
    kept = spark.read.parquet(path)
    kept.filter("NOT (subspace = 3 AND centroid_id = 5)") \
        .write.mode("overwrite").parquet(str(tmp_path / "pq_bad2"))
    with pytest.raises(ValueError, match="incomplete"):
        pq_load(spark, str(tmp_path / "pq_bad2"))


# ------------------------------ IVF-PQ --------------------------------------

from dexscraper_spark.operators.quantize import (  # noqa: E402
    ivf_pq_encode, ivf_pq_topk,
)
from dexscraper_spark.operators.similarity import ivf_build  # noqa: E402


def test_ivf_pq_recall_and_schema(spark, emb, books):
    """IVF-PQ must return the ivf_query-compatible schema with recall
    bounded below by the probe coverage (nprobe/nlist), and full-probe
    IVF-PQ with generous expand must recover most exact neighbors."""
    index = ivf_build(emb, nlist=8, cache=False)
    try:
        codes = ivf_pq_encode(index, books)
        assert set(codes.columns) == {"vec_id", "__list", "code"}
        queries = emb.orderBy("vec_id").limit(8)
        exact = cosine_topk(emb, queries, k=5)
        exact_sets = {}
        for r in exact.collect():
            exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

        # full probe (nprobe = nlist) + expand: PQ is the only loss
        full = ivf_pq_topk(emb, index, codes, queries, books,
                           k=5, nprobe=8, expand=8)
        assert full.columns == ["query_id", "neighbor_id", "cosine", "rank"]
        got = {}
        for r in full.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        recalls = [len(got.get(q, set()) & s) / len(s)
                   for q, s in exact_sets.items()]
        assert sum(recalls) / len(recalls) >= 0.7

        # partial probe still returns valid ranked rows
        part = ivf_pq_topk(emb, index, codes, queries, books,
                           k=5, nprobe=2, expand=4).collect()
        assert part and all(r.rank <= 5 for r in part)
        by_q = {}
        for r in part:
            by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
        for rows in by_q.values():
            rows.sort()
            cos = [c for _, c in rows]
            assert cos == sorted(cos, reverse=True)  # ranked by cosine
    finally:
        index.unpersist()


def test_ivf_pq_full_probe_generous_expand_equals_pq_refined(spark, emb,
                                                             books):
    """With nprobe=nlist the list pruning is a no-op, so IVF-PQ must
    equal the flat refined PQ search run at the same expand — pinning
    that the composition adds pruning, not different math."""
    index = ivf_build(emb, nlist=4, cache=False)
    try:
        codes = ivf_pq_encode(index, books)
        queries = emb.orderBy("vec_id").limit(6)
        a = sorted(map(tuple,
                       ivf_pq_topk(emb, index, codes, queries, books,
                                   k=5, nprobe=4, expand=6).collect()))
        flat = pq_encode(emb, books)
        b = sorted(map(tuple,
                       pq_topk_refined(emb, flat, queries, books,
                                       k=5, expand=6).collect()))
        assert a == b
    finally:
        index.unpersist()


def test_ivf_pq_extend_saved_self_repairs(spark, emb, books, tmp_path):
    """A crash between the assigned append and the codes append leaves
    orphaned ids; the next extend run must backfill their codes instead
    of skipping the batch (idempotence keyed on one table would lose
    them forever)."""
    from dexscraper_spark.operators.quantize import (
        ivf_pq_extend_saved, ivf_pq_save)
    from dexscraper_spark.operators.similarity import (
        _ivf_assign, ivf_build, ivf_load)

    base = emb.filter("vec_id < 400")
    extra = emb.filter("vec_id >= 400")
    path = str(tmp_path / "idx")
    index = ivf_build(base, nlist=4, cache=False)
    codes = ivf_pq_encode(index, books)
    ivf_pq_save(spark, index, books, codes, path)

    # simulate the crash: append extra's ASSIGNMENTS but not its codes
    idx2 = ivf_load(spark, path)
    _ivf_assign(idx2, extra).write.mode("append") \
        .partitionBy("__list").parquet(f"{path}/assigned")
    assert spark.read.parquet(f"{path}/codes").count() == 400  # orphans

    stats = ivf_pq_extend_saved(spark, path, extra)
    assert stats["appended"] == 0          # ids already assigned
    assert stats["indexed"] == 500         # ...but codes backfilled
    # and a clean rerun is a no-op
    stats = ivf_pq_extend_saved(spark, path, extra)
    assert stats == {"appended": 0, "indexed": 500}


# --------------------------- residual IVF-PQ --------------------------------

from dexscraper_spark.operators.quantize import (  # noqa: E402
    ivf_pq_residual_build, ivf_pq_residual_topk, unit_vectors,
)


def _clustered_vectors(spark, n=480, n_clusters=8, dim=64):
    """Deterministic clustered unit-ish vectors: 8 hash-derived centers
    plus small per-point hash noise — the regime residual encoding
    exists for (real embedding spaces cluster; the uniform-sphere
    synthetic table barely does, residual gain there is ~6%)."""
    import numpy as np
    rows = []
    centers = np.array([[((c * 2654435761 + d * 97) % 1000) / 500.0 - 1.0
                         for d in range(dim)] for c in range(n_clusters)])
    for i in range(n):
        c = i % n_clusters
        noise = np.array([(((i * 40503 + d * 13 + 7) % 1000) / 1000.0
                           - 0.5) * 0.1 for d in range(dim)])
        rows.append((i, [float(x) for x in centers[c] + noise]))
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")


def test_residual_books_quantize_finer(spark):
    """The point of residual encoding: at identical (m, ksub) the
    residual codebooks reconstruct with materially lower error than
    raw-vector codebooks — on clustered data, where residuals
    concentrate near zero."""
    import numpy as np

    emb = _clustered_vectors(spark)
    books = pq_train(emb, dim=64, m=16, ksub=64, seed=7)
    index, rbooks, rcodes = ivf_pq_residual_build(
        emb, nlist=8, m=16, ksub=64, seed=7)
    try:
        cents = {r.list_id: np.array(r.centroid)
                 for r in index.centroids.collect()}
        unit = {r.vec_id: np.array(r.embedding)
                for r in unit_vectors(emb).collect()}
        assign = {r.vec_id: r["__list"]
                  for r in index.assigned.select("vec_id", "__list")
                  .collect()}
        codes = {r.vec_id: r.code for r in rcodes.collect()}
        errs = []
        for vid, u in unit.items():
            resid_rec = np.concatenate(
                [rbooks.centers[j, codes[vid][j]]
                 for j in range(rbooks.m)])
            rec = cents[assign[vid]] + resid_rec
            errs.append(((u - rec) ** 2).sum())
        resid_mse = float(np.mean(errs))
    finally:
        index.unpersist()

    # raw-vector books at the same parameters (module fixture), on the
    # same unit vectors
    raw_codes = {r.vec_id: r.code for r in pq_encode(emb, books).collect()}
    raw_errs = []
    for vid, u in unit.items():
        rec = np.concatenate([books.centers[j, raw_codes[vid][j]]
                              for j in range(books.m)])
        raw_errs.append(((u - rec) ** 2).sum())
    raw_mse = float(np.mean(raw_errs))
    assert resid_mse < raw_mse * 0.5   # clustered data: big win


def test_residual_ivf_pq_recall(spark, emb):
    """Full probe + refine recovers the exact neighbors at least as
    well as raw IVF-PQ at the same parameters."""
    queries = emb.orderBy("vec_id").limit(8)
    exact = cosine_topk(emb, queries, k=5)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

    index, rbooks, rcodes = ivf_pq_residual_build(
        emb, nlist=8, m=16, ksub=64, seed=7)
    try:
        res = ivf_pq_residual_topk(emb, index, rcodes, queries, rbooks,
                                   k=5, nprobe=8, expand=8)
        assert res.columns == ["query_id", "neighbor_id", "cosine",
                               "rank"]
        got = {}
        for r in res.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        recalls = [len(got.get(q, set()) & s) / len(s)
                   for q, s in exact_sets.items()]
        assert sum(recalls) / len(recalls) >= 0.7
        # partial probe still returns validly ranked rows
        part = ivf_pq_residual_topk(emb, index, rcodes, queries,
                                    rbooks, k=5, nprobe=2,
                                    expand=4).collect()
        assert part and all(r.rank <= 5 for r in part)
    finally:
        index.unpersist()
