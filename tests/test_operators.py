"""Operator library tests: proximity joins, sessionization/clustering,
top-k tie-breaking, dedup, similarity — on small deterministic frames."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_band_range_join_matches_naive(spark):
    """Band-join must produce exactly the naive |Δ|<=r join result."""
    from dexscraper_spark.operators.proximity import band_range_join
    left = spark.createDataFrame(
        [(i, float(i * 37 % 500)) for i in range(40)], "lid int, lpos double")
    right = spark.createDataFrame(
        [(j, float(j * 53 % 500)) for j in range(40)], "rid int, rpos double")
    banded = band_range_join(left, right, left_pos="lpos", right_pos="rpos",
                             radius=25.0)
    naive = left.crossJoin(right).filter(
        F.abs(F.col("lpos") - F.col("rpos")) <= 25.0)
    got = sorted((r["lid"], r["rid"]) for r in banded.collect())
    want = sorted((r["lid"], r["rid"]) for r in naive.collect())
    assert got == want and len(got) > 0


def test_nearest_join_distance_gates(spark):
    """J2 semantics: nearest within radius; rows with no candidate drop."""
    from dexscraper_spark.operators.proximity import nearest_join
    tokens = spark.createDataFrame(
        [(1, 100.0), (2, 5000.0)], "tok int, tpos double")
    meta = spark.createDataFrame(
        [(10, 150.0), (11, 90.0), (12, 120.0)], "mid int, mpos double")
    out = nearest_join(tokens, meta, left_key="tok", left_pos="tpos",
                       right_pos="mpos", radius=1000.0, tiebreak="mid")
    rows = {r["tok"]: (r["mid"], r["distance"]) for r in out.collect()}
    assert rows == {1: (11, 10.0)}  # nearest of {150(d50), 90(d10), 120(d20)}


def test_assign_roles_order(spark):
    """J3: token/pair/creator by distance; SOL-type → quote_address."""
    from dexscraper_spark.operators.proximity import assign_roles
    joined = spark.createDataFrame(
        [
            (1, 100.0, 130.0, "AAA", "potential_contract"),
            (1, 100.0, 110.0, "BBB", "potential_contract"),
            (1, 100.0, 170.0, "CCC", "unknown"),
            (1, 100.0, 105.0, "So11111111111111111111111111111111111111112", "SOL_token"),
            (1, 100.0, 190.0, "BBB", "potential_contract"),  # dup value, farther
        ],
        "tok int, tpos double, mpos double, addr string, atype string")
    out = assign_roles(joined, left_key="tok", left_pos="tpos",
                       right_pos="mpos", value_col="addr", type_col="atype")
    r = out.collect()[0]
    assert r["token_address"] == "BBB"      # nearest (d=10)
    assert r["pair_address"] == "AAA"       # d=30
    assert r["creator_address"] == "CCC"    # d=70
    assert r["quote_address"].startswith("So1")


def test_cluster_values_reference_fixture(spark):
    """FIXTURES.md §7: [18,18,18,29,357] @ tol .001 → one 3-element cluster."""
    from dexscraper_spark.operators.sessionize import cluster_values
    df = spark.createDataFrame(
        [(v,) for v in [18.0, 18.0, 18.0, 29.0, 357.0]], "v double")
    out = cluster_values(df, value_col="v", tolerance=0.001, min_size=2).collect()
    assert len(out) == 1
    assert out[0]["cluster_size"] == 3
    assert out[0]["cluster_min"] == 18.0 and out[0]["cluster_max"] == 18.0


def test_top_tokens_tiebreak(spark, sample_token):
    """T1: (confidence desc, field_count desc) exactly (models.py:379-381)."""
    from dexscraper_spark.operators.topk import top_tokens
    rows = [
        ("A", 0.9, 3), ("B", 0.9, 7), ("C", 0.5, 9), ("D", None, 9),
    ]
    df = spark.createDataFrame(
        rows, "symbol string, confidence_score double, field_count int")
    out = [r["symbol"] for r in top_tokens(df, 3).collect()]
    assert out == ["B", "A", "C"]  # nulls last


def test_dedup_exact_deterministic_survivor(spark):
    from dexscraper_spark.operators.dedup import dedup_exact
    df = spark.createDataFrame(
        [(1, "x"), (5, "x"), (3, "x"), (2, "y")], "id int, k string")
    out = {r["k"]: r["id"] for r in
           dedup_exact(df, ["k"], keep_by="id").collect()}
    assert out == {"x": 1, "y": 2}


def test_minhash_lsh_finds_near_duplicates(spark):
    """Near-identical texts must collide in LSH buckets and verify by
    Jaccard; an unrelated text must not pair with them."""
    from dexscraper_spark.operators.dedup import (
        jaccard_pairs, minhash_lsh_candidates, minhash_signatures)
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, "completely different words here entirely")],
        "doc_id long, text string")
    sigs = minhash_signatures(docs, id_col="doc_id", text_col="text",
                              num_hashes=32, shingle_n=3)
    cands = minhash_lsh_candidates(sigs, id_col="doc_id", num_bands=8)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs
    verified = jaccard_pairs(docs, cands, id_col="doc_id", text_col="text",
                             shingle_n=3, threshold=0.5)
    vp = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert (1, 2) in vp and vp[(1, 2)] > 0.8
    assert all(3 not in p for p in vp)


def test_simhash_similar_texts_close(spark):
    from dexscraper_spark.operators.dedup import simhash
    docs = spark.createDataFrame(
        [(1, "spark window aggregation over event streams"),
         (2, "spark window aggregation over event streams!"),
         (3, "zzz completely unrelated qqq material www")],
        "doc_id long, text string")
    fps = {r["doc_id"]: r["simhash"] for r in
           simhash(docs, id_col="doc_id", text_col="text").collect()}
    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert hamming(fps[1], fps[2]) < hamming(fps[1], fps[3])


def test_simhash_near_pairs_precision_and_pigeonhole_recall(spark):
    """simhash_near_pairs must equal brute-force verification on the pairs
    it returns (exact precision: every returned pair re-checks under the
    same fingerprints), and the banding guarantees recall for pairs with
    Hamming < num_bands (pigeonhole: <4 differing bits over 4 bands means
    some 16-bit band is identical)."""
    from dexscraper_spark.operators.dedup import simhash, simhash_near_pairs
    texts = [
        "spark window aggregation over event streams",
        "spark window aggregation over event streams!",
        "spark window aggregation over event streams!!",
        "zzz completely unrelated qqq material www",
        "another disjoint vocabulary entirely different",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_pairs(docs, id_col="doc_id", text_col="text",
                                       num_bands=4, max_hamming=8).collect()}
    fps = {r["doc_id"]: r["simhash"] for r in
           simhash(docs, id_col="doc_id", text_col="text").collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for (a, b), h in got.items():
        assert h == hamming(fps[a], fps[b]) and h <= 8  # exact precision
    for a in fps:
        for b in fps:
            if a < b and hamming(fps[a], fps[b]) < 4:  # pigeonhole recall
                assert (a, b) in got


def test_lsh_banded_recall_vs_brute_force(spark):
    """Banded hyperplane LSH must recover most brute-force top-5 neighbors
    (single-bucket LSH measured 0.0 recall here — banding is load-bearing),
    dedup pairs colliding in several bands, and stay deterministic."""
    from dexscraper_spark.operators.similarity import (
        cosine_topk, lsh_bucketed_topk)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, queries, k=5).collect()}
    ann_df = lsh_bucketed_topk(emb, queries, k=5, num_planes=24,
                               num_bands=8, dim=64)
    ann_rows = ann_df.collect()
    ann = {(r["query_id"], r["neighbor_id"]) for r in ann_rows}
    assert len(ann_rows) == len(ann)  # band dedup: no repeated pairs
    assert len(exact & ann) / len(exact) >= 0.7  # measured 0.84
    # deterministic across runs (plane cache + pure per-row signature)
    again = {(r["query_id"], r["neighbor_id"]) for r in ann_df.collect()}
    assert again == ann


def test_cosine_topk_self_consistency(spark):
    """Neighbor list must be ordered by cosine desc and exclude self."""
    from dexscraper_spark.operators.similarity import cosine_topk
    import math
    vecs = [(i, [math.sin(i * 0.7 + j * 0.3) for j in range(8)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=5, round_to=None,
                      dim=8)
    rows = out.orderBy("rank").collect()
    assert len(rows) == 5
    assert all(r["neighbor_id"] != 0 for r in rows)
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_sessionize_gap_boundaries(spark):
    from dexscraper_spark.operators.sessionize import sessionize
    df = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 101), (1, 300), (2, 0)], "u int, t long")
    out = sessionize(df, partition_cols=["u"], order_col="t", gap=100.0)
    sess = {(r["u"], r["t"]): r["session_id"] for r in out.collect()}
    # gap=100: delta 100 is NOT > gap → same session; delta 199 > gap → new
    assert sess[(1, 0)] == 1 and sess[(1, 100)] == 1 and sess[(1, 101)] == 1
    assert sess[(1, 300)] == 2
    assert sess[(2, 0)] == 1


def test_salted_agg_equals_plain_agg(spark):
    """Salted two-phase aggregation must be value-identical to the plain
    one (using exact fixed-point sums so the comparison is bit-level)."""
    from dexscraper_spark.functions.exact import cents
    from dexscraper_spark.operators.skew import salted_agg
    rows = [("hot", i, float(i % 97) + 0.25) for i in range(5000)]
    rows += [(f"k{i % 7}", i, float(i) / 3.0) for i in range(300)]
    df = spark.createDataFrame(rows, "key string, id long, v double")
    plain = {r["key"]: (r["s"], r["n"]) for r in
             df.groupBy("key").agg(
                 F.sum(cents(F.col("v"))).alias("s"),
                 F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["key"]: (r["s"], r["n"]) for r in salted_agg(
        df, keys=["key"], n_salts=8, salt_source="id",
        partial_aggs=[F.sum(cents(F.col("v"))).alias("ps"),
                      F.count(F.lit(1)).alias("pn")],
        final_aggs=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
    ).collect()}
    assert plain == salted


def test_salted_broadcast_join_equals_plain(spark):
    from dexscraper_spark.operators.skew import salted_broadcast_left
    fact = spark.createDataFrame(
        [("hot", i) for i in range(2000)] + [("cold", i) for i in range(50)],
        "key string, id long")
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C")], "key string, tag string")
    plain = sorted((r["id"], r["tag"]) for r in fact.join(dim, "key").collect())
    salted = sorted((r["id"], r["tag"]) for r in salted_broadcast_left(
        fact, dim, key="key", n_salts=8, salt_source="id").collect())
    assert plain == salted


def test_ohlc_windowed_invariants_and_partition_independence(spark):
    """low <= open/close <= high, trades = row count, and the result is
    IDENTICAL at different parallelism (total-order open/close + exact
    volume sums)."""
    from dexscraper_spark.operators.ohlc import ohlc_windowed
    from dexscraper_spark.sources.tables import load_events
    ev = load_events(spark, "/root/testdata/sf0.001")
    def run(df):
        bars = ohlc_windowed(df, symbol_col="event_type", ts_col="ts",
                             price_col="value", qty_col="value",
                             order_col="event_id", duration="6 hours")
        return sorted(tuple(r) for r in bars.withColumn(
            "bucket_ts", F.col("bucket_ts").cast("long")).collect())
    one = run(ev.repartition(1))
    many = run(ev.repartition(16))
    assert one == many
    for (_sym, _ts, o, h, l, c, _v, n) in one:
        assert l <= o <= h and l <= c <= h and n >= 1


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF must return valid ranked neighbors with reasonable recall of
    the brute-force top-5 (bounded by nprobe/nlist by design)."""
    from dexscraper_spark.operators.similarity import cosine_topk, ivf_topk
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, nlist=8, nprobe=4)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx.collect():
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(approx_sets) == set(exact_sets)
    recalls = [len(approx_sets[q] & exact_sets[q]) / 5 for q in exact_sets]
    assert sum(recalls) / len(recalls) >= 0.4  # nprobe=4 of nlist=8 lists
    # ranked ordering is deterministic and self-free
    rows = approx.filter(F.col("query_id") == 0).orderBy("rank").collect()
    assert all(r["neighbor_id"] != 0 for r in rows)
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)


def test_ivf_build_query_split_and_disk_index(spark, tmp_path):
    """The index is built once and queried many times; a disk-persisted
    index (partitioned by list id) answers identically to the in-memory
    one, and its probe plan prunes to the probed list partitions."""
    from dexscraper_spark.operators.similarity import (
        ivf_build, ivf_load, ivf_query, ivf_save)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    index = ivf_build(emb, nlist=8, seed=42, cache=True)
    mem = sorted(tuple(r) for r in
                 ivf_query(index, queries, k=5, nprobe=4).collect())
    path = str(tmp_path / "ivf_index")
    ivf_save(index, path)
    loaded = ivf_load(spark, path)
    assert loaded.nlist == 8
    disk = sorted(tuple(r) for r in
                  ivf_query(loaded, queries, k=5, nprobe=4).collect())
    assert mem == disk
    # second query against the same index: no refit (same result, and the
    # assignment is a cached/disk scan, not a KMeans stage)
    again = sorted(tuple(r) for r in
                   ivf_query(index, queries, k=5, nprobe=4).collect())
    assert again == mem
    index.unpersist()


def test_ivf_add_matches_build_assignment(spark):
    """Incremental index maintenance: drop 10% of a built index's
    assignment, ivf_add the same vectors back — the assignments must
    reproduce the build's own lists bit-for-bit (our nearest-centroid
    rule == KMeans transform's), so queries against the extended index
    equal queries against the original."""
    from dexscraper_spark.operators.similarity import (
        ivf_add, ivf_build, ivf_query, IvfIndex)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    full = ivf_build(emb, nlist=8, seed=42, cache=False)
    delta_ids = F.col("vec_id") % 10 == 3
    pruned = IvfIndex(full.assigned.filter(~delta_ids), full.centroids,
                      id_col="vec_id", vec_col="embedding", nlist=8)
    ext = ivf_add(pruned, emb.filter(delta_ids))
    a = sorted(tuple(r) for r in full.assigned.collect())
    b = sorted(tuple(r) for r in ext.assigned.collect())
    assert a == b
    queries = emb.filter(F.col("vec_id") < 5)
    qa = sorted(tuple(r) for r in
                ivf_query(full, queries, k=5, nprobe=4).collect())
    qb = sorted(tuple(r) for r in
                ivf_query(ext, queries, k=5, nprobe=4).collect())
    assert qa == qb


def test_ivf_extend_saved_appends_without_rewriting(spark, tmp_path):
    """On-disk nightly append: extending a saved index writes only new
    files into the touched list partitions — every pre-existing parquet
    file survives byte-identical (never read back or rewritten) — and
    the reloaded index answers like the in-memory extended one."""
    import glob
    import os

    from dexscraper_spark.operators.similarity import (
        ivf_add, ivf_build, ivf_extend_saved, ivf_query, ivf_save, IvfIndex)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 10 != 3)
    new = emb.filter(F.col("vec_id") % 10 == 3)
    base = ivf_build(old, nlist=8, seed=7, cache=False)
    path = str(tmp_path / "idx")
    ivf_save(base, path)
    before = {p: os.path.getmtime(p) for p in
              glob.glob(f"{path}/assigned/**/*.parquet", recursive=True)}
    ext_disk = ivf_extend_saved(spark, path, new)
    after = set(glob.glob(f"{path}/assigned/**/*.parquet", recursive=True))
    assert set(before) <= after and len(after) > len(before)
    for p, mt in before.items():
        assert os.path.getmtime(p) == mt  # untouched, not rewritten
    queries = emb.filter(F.col("vec_id") < 5)
    mem = sorted(tuple(r) for r in
                 ivf_query(ivf_add(base, new), queries, k=5,
                           nprobe=4).collect())
    disk = sorted(tuple(r) for r in
                  ivf_query(ext_disk, queries, k=5, nprobe=4).collect())
    assert mem == disk


def test_ohlc_frames_cascade_equals_direct(spark):
    """The hierarchical rollup cascade (m5 -> h1 -> h6) must be
    bit-identical to aggregating the raw ticks directly at each width —
    open/close pinning, fixed-point volume and counts all survive the
    re-aggregation."""
    from dexscraper_spark.operators.ohlc import (
        ohlc_windowed, ohlc_windowed_frames)
    from dexscraper_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    kw = dict(symbol_col="event_type", ts_col="ts", price_col="value",
              qty_col="value", order_col="event_id")
    cascade = ohlc_windowed_frames(
        ev, frames=(("m5", 300), ("h1", 3600), ("h6", 21600)), **kw)
    for frame, duration in (("m5", "5 minutes"), ("h1", "1 hour"),
                            ("h6", "6 hours")):
        direct = ohlc_windowed(ev, duration=duration, **kw)
        a = sorted(tuple(r) for r in cascade.filter(f"frame = '{frame}'")
                   .drop("frame").collect())
        b = sorted(tuple(r) for r in direct.collect())
        assert a == b, f"cascade != direct at {frame}"


def test_dedup_components_chain_converges_to_min(spark):
    """A chain a-b-c-d (diameter 3) must collapse to one component labeled
    by the minimum id, exercising multi-round propagation."""
    from dexscraper_spark.operators.dedup import dedup_components
    pairs = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 5), (10, 11)], ["id_a", "id_b"])
    got = {r.node: r.component for r in dedup_components(pairs).collect()}
    assert got == {2: 2, 3: 2, 4: 2, 5: 2, 10: 10, 11: 10}


def test_dedup_components_matches_union_find_on_simhash_pairs(spark):
    """Components over real near-dup pairs (simhash at sf0.001) must equal
    a driver-side union-find over the same pair list."""
    from dexscraper_spark.operators.dedup import (
        dedup_components, md5_le64, simhash_near_pairs)
    from dexscraper_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = simhash_near_pairs(docs, id_col="doc_id", text_col="text",
                               max_hamming=3, hash_fn=md5_le64)
    pair_list = [(r.id_a, r.id_b) for r in pairs.collect()]
    assert pair_list, "need at least one near-dup pair for a real test"

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    got = {r.node: r.component
           for r in dedup_components(pairs).collect()}
    assert got == expected
    # the driver fast path and the distributed fixpoint agree bit-for-bit
    dist = {r.node: r.component
            for r in dedup_components(pairs, driver_max_pairs=0).collect()}
    assert dist == expected


def test_batch_ops_perf_gate(spark):
    """Reference parity (test_edge_cases.py:312-338): top-k + snapshot-OHLC
    conversion + CSV line export of 100 tokens must finish in bounded
    time. The reference gates <1 s single-thread CPython; here the bound
    is 5 s on a warm session — generous for Spark's scheduling overhead
    but still catches a plan regression (e.g. an accidental cartesian or
    a Python-row-UDF sneaking into the export path)."""
    import time

    from pyspark.sql import functions as F
    from dexscraper_spark.operators.ohlc import ohlc_snapshot
    from dexscraper_spark.operators.topk import top_k
    from dexscraper_spark.sinks.exporters import mt5_line

    tokens = spark.range(100).select(
        F.concat(F.lit("TK"), F.col("id")).alias("symbol"),
        (0.000123 * (F.col("id") + 1)).alias("price"),
        (1_000_000.5 + F.col("id")).alias("volume_24h"),
        (F.lit(1756793176) + F.col("id")).alias("ts"),
    )
    ranked = top_k(tokens, 10, F.col("volume_24h").desc(),
                   F.col("symbol").asc())
    bars = ohlc_snapshot(ranked, price_col="price", volume_col="volume_24h",
                         ts_col="ts", symbol_col="symbol")
    out = bars.select("symbol", mt5_line().alias("line"))
    # deterministic guard: the regressions this gate exists for show up
    # in the plan (a cartesian or a Python row UDF), not the stopwatch
    jqe = out._jdf.queryExecution()
    plan = out.sparkSession._jvm.PythonSQLUtils.explainString(jqe, "formatted")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    t0 = time.time()
    lines = out.collect()
    elapsed = time.time() - t0
    assert len(lines) == 10 and all("," in r.line for r in lines)
    # generous tripwire only — load spikes must not flake the suite
    assert elapsed < 30.0, f"batch ops took {elapsed:.2f}s"


def test_exact_cosine_pairs_blocked_equals_naive_join(spark):
    """BLAS-filter + exact-verify ≡ the naive all-pairs equi-join, including
    zero-norm vectors and pairs straddling the threshold; also exercises
    chunking (chunk < block size) and unsorted ids within a block."""
    import math
    from dexscraper_spark.operators.similarity import (
        _dot, _norm, _safe_div, exact_cosine_pairs_blocked)
    rows = []
    for i in range(60):
        vec = [math.sin(i * 0.37 + j * 0.21) + (0.4 if i % 7 == 0 else 0.0)
               for j in range(8)]
        rows.append((997 - i * 13 % 61, i % 3, vec))   # unsorted, unique ids
    rows.append((5000, 0, [0.0] * 8))                  # zero-norm vector
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")

    got = exact_cosine_pairs_blocked(
        df, threshold=0.4, chunk=16).collect()

    a = df.select(F.col("vec_id").alias("id_a"), "label",
                  F.col("embedding").alias("__a"),
                  _norm(F.col("embedding")).alias("__an"))
    b = df.select(F.col("vec_id").alias("id_b"), "label",
                  F.col("embedding").alias("__b"),
                  _norm(F.col("embedding")).alias("__bn"))
    cos = F.floor(_safe_div(_dot(F.col("__a"), F.col("__b")),
                            F.col("__an") * F.col("__bn"))
                  * 1e6 + F.lit(0.5)) / 1e6
    want = (a.join(b, "label").filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= 0.4)).collect()

    key = lambda r: (r["id_a"], r["id_b"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(want) > 5  # non-trivial corpus
    gm = {key(r): r["cosine"] for r in got}
    for r in want:
        assert gm[key(r)] == r["cosine"]  # bit-identical scores


def test_lsh_arrow_rerank_matches_fold(spark):
    """The r13 Arrow cosine rerank (_cosine_rerank_arrow) must be
    BIT-identical to the sequential JVM fold it replaces — float32
    element casts, left-to-right accumulation order, zero-norm guard and
    half-up fixed-point rounding — on real embeddings (float arrays)
    plus degenerate rows (zero vector, exact-duplicate pair), with and
    without rounding. Guards the kernel against any reassociation (BLAS,
    pairwise summation) that would drift last-ulp from the oracle."""
    import struct as _struct

    from dexscraper_spark.operators.similarity import (
        _cosine_rerank_arrow, _dot, _norm, _safe_div)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    extra = spark.createDataFrame(
        [(90001, [0.0] * 64), (90002, [1.5] * 64), (90003, [1.5] * 64)],
        "vec_id long, embedding array<float>").withColumn(
            "label", F.lit(0))
    emb = emb.select("vec_id", "embedding", "label").unionByName(extra)
    q = emb.filter((F.col("vec_id") < 6) | (F.col("vec_id") > 90000))
    vc = F.col("embedding")
    qv = q.select(F.col("vec_id").alias("query_id"), vc.alias("__qv"),
                  _norm(vc).alias("__qn"))
    cv = emb.select(F.col("vec_id").alias("neighbor_id"), vc.alias("__nv"),
                    _norm(vc).alias("__nn"))
    scored_in = (qv.crossJoin(cv)
                 .filter(F.col("query_id") != F.col("neighbor_id"))
                 .select("query_id", "neighbor_id",
                         "__qv", "__nv", "__qn", "__nn"))
    for round_to in (None, 6):
        cos = _safe_div(_dot(F.col("__qv"), F.col("__nv")),
                        F.col("__qn") * F.col("__nn"))
        if round_to is not None:
            p = float(10 ** round_to)
            cos = F.floor(cos * p + F.lit(0.5)) / p
        want = {(r["query_id"], r["neighbor_id"]):
                _struct.pack("d", r["cosine"])
                for r in scored_in.select(
                    "query_id", "neighbor_id",
                    cos.alias("cosine")).collect()}
        got = {(r["query_id"], r["neighbor_id"]):
               _struct.pack("d", r["cosine"])
               for r in _cosine_rerank_arrow(
                   scored_in, round_to=round_to).collect()}
        assert got == want
        assert len(got) > 100


def test_lsh_multiprobe_recall_dominates_single_probe(spark):
    """Query-side multiprobe (flip weakest-margin bit per band) must
    strictly contain the single-probe candidate set and lift recall@5;
    the corpus side still explodes to num_bands rows only."""
    from dexscraper_spark.operators.similarity import (
        cosine_topk, lsh_bucketed_topk)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, queries, k=5).collect()}
    kw = dict(k=5, num_planes=24, num_bands=8, dim=64)
    single = {(r["query_id"], r["neighbor_id"])
              for r in lsh_bucketed_topk(emb, queries, **kw).collect()}
    multi = {(r["query_id"], r["neighbor_id"])
             for r in lsh_bucketed_topk(emb, queries, multiprobe=2,
                                        **kw).collect()}
    r1 = len(exact & single) / len(exact)
    r2 = len(exact & multi) / len(exact)
    assert r2 >= r1          # more probes can only add candidates
    assert r2 >= 0.9         # measured: single ~0.84, multiprobe=2 higher


def test_dedup_components_long_chain_pointer_jumping(spark):
    """A 256-node path graph needs ~255 rounds under plain min-label
    propagation — far beyond the 20-round budget — but O(log d) with
    pointer jumping. Regression for the dup-heavy-crawl case (chained
    rotations/revisions)."""
    from dexscraper_spark.operators.dedup import dedup_components
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(255)], ["id_a", "id_b"])
    # driver_max_pairs=0 forces the DISTRIBUTED loop — this test exists
    # to cover the pointer jump, not the small-graph fast path
    comp = dedup_components(pairs, max_iter=20, driver_max_pairs=0)
    assert comp.filter(F.col("component") != 0).count() == 0
    assert comp.count() == 256


def test_minhash_lsh_rejects_zero_width_bands(spark):
    """num_bands > num_hashes would hash the empty slice identically for
    every doc — one global bucket, full O(n^2) cross product. Must raise."""
    import pytest
    from dexscraper_spark.operators.dedup import (
        minhash_lsh_candidates, minhash_signatures)
    docs = spark.createDataFrame(
        [(1, "aaa bbb"), (2, "bbb ccc")], "doc_id long, text string")
    sigs = minhash_signatures(docs, id_col="doc_id", text_col="text",
                              num_hashes=8)
    with pytest.raises(ValueError, match="band width"):
        minhash_lsh_candidates(sigs, id_col="doc_id", num_bands=16,
                               num_hashes=8)
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_candidates(sigs, id_col="doc_id", num_bands=3,
                               num_hashes=8)


def test_split_assignment_rejects_fractional_percentages():
    import pytest
    from pyspark.sql import functions as F
    from dexscraper_spark.operators.dedup import split_assignment
    with pytest.raises(ValueError, match="pass 80"):
        split_assignment(F.col("id"), train_pct=0.8, valid_pct=0.1)


def test_null_text_docs_do_not_pair_as_near_dups(spark):
    """NULL text = failed extraction: null-text docs must not fingerprint
    identically and flood the candidate set as mutual 'duplicates'."""
    from dexscraper_spark.operators.dedup import (
        jaccard_pairs, minhash_lsh_candidates, minhash_signatures,
        simhash_near_pairs)
    rows = [(i, None) for i in range(1, 6)] + [(10, "real text one here"),
                                               (11, "real text one here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh_pairs = simhash_near_pairs(docs, id_col="doc_id", text_col="text",
                                  persist_fingerprints=False)
    ids = {x for r in sh_pairs.collect() for x in (r.id_a, r.id_b)}
    assert ids == {10, 11}
    sigs = minhash_signatures(docs, id_col="doc_id", text_col="text",
                              num_hashes=8, char_shingles=False)
    cands = minhash_lsh_candidates(sigs, id_col="doc_id", num_bands=2,
                                   num_hashes=8)
    verified = jaccard_pairs(docs, cands, id_col="doc_id", text_col="text",
                             char_shingles=False, threshold=0.5,
                             persist_candidates=False)
    ids = {x for r in verified.collect() for x in (r.id_a, r.id_b)}
    assert ids == {10, 11}


def test_exact_cosine_pairs_blocked_string_ids(spark):
    """The BLAS pair finder must be id-type agnostic (string ids are the
    norm in scraped corpora)."""
    from dexscraper_spark.operators.similarity import exact_cosine_pairs_blocked
    rows = [("docA", [1.0, 0.0], "x"), ("docB", [1.0, 0.001], "x"),
            ("docC", [0.0, 1.0], "x")]
    emb = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>, label string")
    pairs = exact_cosine_pairs_blocked(emb, threshold=0.9).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [("docA", "docB")]


def test_dedup_exact_keep_by_total_order(spark):
    """Rows tying on keep_by must yield a partition-independent survivor."""
    from dexscraper_spark.operators.dedup import dedup_exact
    rows = [("k", 5, "zzz"), ("k", 5, "aaa"), ("k", 7, "mmm")]
    df = spark.createDataFrame(rows, "key string, ts long, payload string")
    a = dedup_exact(df.repartition(1), ["key"], keep_by="ts").collect()
    b = dedup_exact(df.repartition(8), ["key"], keep_by="ts").collect()
    assert a == b and a[0].payload == "aaa"


def test_scan_patterns_single_scan_and_empty_kinds(spark, tmp_path):
    """One FileScan for all pattern kinds (the union form read the source
    once per kind); explicit kinds={} means no patterns, not defaults."""
    from dexscraper_spark.operators.metascan import scan_patterns
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "visit https://a.io now pumpfun 5m"),
         (2, "raydium https://b.io")],
        "doc_id long, text string").write.parquet(src)
    df = spark.read.parquet(src)
    out = scan_patterns(df, id_col="doc_id", text_col="text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    kinds = {r.kind for r in out.collect()}
    assert {"url", "protocol", "age_indicator"} <= kinds
    assert scan_patterns(df, id_col="doc_id", text_col="text",
                         kinds={}).count() == 0


def test_dedup_exact_keep_by_with_nested_map_column(spark):
    """ADVICE r4: orderability is recursive — array<map> / struct<map>
    columns must be excluded from the tiebreak order, not crash it."""
    from dexscraper_spark.operators.dedup import dedup_exact
    df = spark.createDataFrame(
        [(1, 10, [{"a": 1}], {"m": {"x": 2}}),
         (1, 9, [{"b": 3}], {"m": {"y": 4}}),
         (2, 5, [], {"m": {}})],
        "k int, id int, am array<map<string,int>>, "
        "sm struct<m: map<string,int>>")
    out = dedup_exact(df, ["k"], keep_by="id").collect()
    assert {(r["k"], r["id"]) for r in out} == {(1, 9), (2, 5)}


def test_simhash_wide_finds_near_dups_and_matches_brute_force(spark):
    """128-bit simhash + 4x32-bit bands: exact dups at hamming 0, near
    dups found, and the banded pair set equals brute-force all-pairs
    hamming<=3 over the same fingerprints (pigeonhole completeness)."""
    from dexscraper_spark.operators.dedup import (
        simhash_wide, simhash_wide_band_pairs)

    # hamming over 128 bits scales ~2x the 64-bit hamming for the same
    # edit, so the near-dup fixture is a proportionally TINY edit (6
    # chars off a 1.7k-char diverse text -> wide hamming 0-2)
    base = " ".join(f"sentence {i} explores subject {i * 31} with care"
                    for i in range(40))
    rows = [(0, base), (1, base), (2, base[:-6]),
            (3, "a completely different document about glacier formation "
                "and the slow grinding of continental ice")]
    rows += [(10 + i, f"unrelated filler text number {i} with its own "
                      f"distinct vocabulary stanza {i * 7919}")
             for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = simhash_wide(docs, id_col="doc_id", text_col="text").persist()

    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_wide_band_pairs(
               fps, id_col="doc_id", max_hamming=3).collect()}
    assert got.get((0, 1)) == 0              # exact dup: both words equal
    assert (0, 2) in got or (1, 2) in got    # near dup found

    # completeness vs brute force over the same fingerprints
    rows_fp = fps.collect()
    want = {}
    for i, a in enumerate(rows_fp):
        for b in rows_fp[i + 1:]:
            h = (bin((a["simhash_lo"] ^ b["simhash_lo"])
                     & ((1 << 64) - 1)).count("1")
                 + bin((a["simhash_hi"] ^ b["simhash_hi"])
                       & ((1 << 64) - 1)).count("1"))
            if h <= 3:
                key = (min(a["doc_id"], b["doc_id"]),
                       max(a["doc_id"], b["doc_id"]))
                want[key] = h
    assert got == want
    fps.unpersist()


def test_simhash_wide_bands_cut_chance_candidates(spark):
    """The saturation remedy, measured: on random unrelated docs the
    16-bit-band candidate volume is pure chance collisions while the
    32-bit bands produce (near) none. Candidate counts are read by
    disabling the hamming verify (threshold = fingerprint width)."""
    from dexscraper_spark.operators.dedup import (
        simhash, simhash_band_pairs, simhash_wide, simhash_wide_band_pairs)

    docs = spark.createDataFrame(
        [(i, f"{i * 2654435761 % 104729:x} {i * 7919:x} {i * 31:x} "
             f"{i * 104729 % 7919:x} noise {i}") for i in range(1500)],
        "doc_id long, text string")
    narrow = simhash(docs, id_col="doc_id", text_col="text")
    n_narrow = simhash_band_pairs(
        narrow, id_col="doc_id", max_hamming=64).count()
    wide = simhash_wide(docs, id_col="doc_id", text_col="text")
    n_wide = simhash_wide_band_pairs(
        wide, id_col="doc_id", max_hamming=128).count()
    # ~1500²/2 × 4/2¹⁶ ≈ 69 expected chance candidates for 16-bit bands;
    # 2⁻³² makes the wide count ~0. Generous margins for hash luck.
    assert n_narrow > 10
    assert n_wide <= n_narrow // 10


def test_simhash_wide_probe_side_delta_semantics(spark):
    from dexscraper_spark.operators.dedup import (
        simhash_wide, simhash_wide_band_pairs)
    base = " ".join(f"line {i} describes phenomenon {i * 17} in detail"
                    for i in range(40))
    corpus = spark.createDataFrame(
        [(1, base), (2, "something else entirely about deep sea vents")],
        "doc_id long, text string")
    delta = spark.createDataFrame(
        [(100, base[:-6])], "doc_id long, text string")
    fc = simhash_wide(corpus, id_col="doc_id", text_col="text")
    fd = simhash_wide(delta, id_col="doc_id", text_col="text")
    pairs = simhash_wide_band_pairs(
        fc.unionByName(fd), id_col="doc_id", max_hamming=3, probe=fd)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 100)}  # only pairs touching the probe side


def test_ivf_extend_saved_retry_is_idempotent(spark, tmp_path):
    """A retried nightly append (orchestrator re-run after success or
    partial crash) must not duplicate vectors: skip_existing anti-joins
    the batch against stored ids, so rerunning the same extend leaves
    the index unchanged."""
    from dexscraper_spark.operators.similarity import (
        ivf_build, ivf_extend_saved, ivf_save)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 10 != 3)
    new = emb.filter(F.col("vec_id") % 10 == 3)
    path = str(tmp_path / "idx")
    ivf_save(ivf_build(old, nlist=8, seed=7, cache=False), path)
    once = ivf_extend_saved(spark, path, new)
    n = once.assigned.count()
    assert n == emb.count()
    twice = ivf_extend_saved(spark, path, new)   # full retry
    assert twice.assigned.count() == n
    # a partial-crash retry (half the batch already landed) also heals
    # to exactly-once: only the missing half appends
    third = ivf_extend_saved(spark, path,
                             new.unionByName(new.limit(0)))
    assert third.assigned.count() == n
    assert third.assigned.groupBy("vec_id").count() \
        .filter(F.col("count") > 1).count() == 0


def test_ivf_add_extended_index_releases_base_artifact(spark):
    """unpersist() on an ivf_add-extended index must release the BASE
    index's materialized artifact (the extended assigned is a union
    plan release_artifact can't see)."""
    import os

    import dexscraper_spark.persist as P
    from dexscraper_spark.operators.similarity import ivf_add, ivf_build

    P.release_artifacts()
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = ivf_build(emb.filter(F.col("vec_id") % 2 == 0), nlist=4,
                     cache=True)
    [path] = P._ARTIFACT_DIRS
    ext = ivf_add(base, emb.filter(F.col("vec_id") % 2 == 1))
    assert ext.assigned.count() == emb.count()
    ext.unpersist()
    assert not os.path.exists(path) and P._ARTIFACT_DIRS == []


def test_skew_report_flags_hot_key(spark):
    from pyspark.sql import functions as F

    from dexscraper_spark.operators.skew import skew_report

    # 10k rows: one key owns half, the rest spread over 500 keys
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
        .otherwise((F.col("id") % 500).cast("string")).alias("k"))
    rep = skew_report(df, keys=["k"], k=16, threshold=2.0).collect()
    assert rep[0].item == "HOT" and rep[0].skewed
    assert rep[0].share > 0.4
    assert all(not r.skewed for r in rep[1:])
