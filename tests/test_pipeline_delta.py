"""`pipeline --delta` + `pipeline --resume` (VERDICT r9 §next-1/2).

Equivalence contract: bootstrap + N delta folds ≡ one full rebuild,
ROW-FOR-ROW on the published corpus, the curation state, the semantic
state, the training shards, and the shard manifest. The packed/
assignment is intentionally delta-local (chunk boundaries depend on
global stream order) and is not compared.

Embedding geometry discipline (same as test_semantic_delta): tight
near-orthogonal blobs, so the deterministic coarse k-means co-blocks
every true pair in both the fold and the rebuild and the semantic
delta's exactness contract applies.
"""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from dexscraper_spark import fsio
from dexscraper_spark.cli import run

SF = "/root/testdata/sf0.001"
FLAGS = ["--min-quality", "0.3", "--min-tokens", "3",
         "--split-max-tokens", "64", "--max-tokens", "256",
         "--train-shards", "4", "--semantic-threshold", "0.95",
         "--semantic-nlist", "4"]
CURATED_COLS = ["doc_id", "text", "lang", "quality", "n_tokens",
                "split"]
SHARD_COLS = ["piece_id", "doc_id", "window_id", "text", "n_tokens",
              "split", "lang", "shard"]


def _frames_equal(a, b, cols):
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _blob_vec(i: int) -> list:
    """Tight blob per (doc_id % 5): pairwise within-blob cosine
    ~cos(0.03) > 0.95, cross-blob ~0."""
    axis = i % 5
    j = 0.01 * (1 + (i % 4))
    v = [0.0] * 8
    v[axis] = math.cos(j)
    v[(axis + 1) % 8] = math.sin(j)
    return v


def _prep(spark, tmp_path):
    """day0/day1/full docs parquet + blob embeddings for 1/3 of ids."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hi, lo = docs.select(F.max("doc_id"), F.min("doc_id")).first()
    mid = (hi + lo) // 2
    d0 = docs.filter(F.col("doc_id") <= mid)
    probe = docs.orderBy("doc_id").limit(2).collect()
    extra = spark.createDataFrame(
        [(100001, probe[0]["text"]),          # exact dup of old doc
         (100002, probe[0]["text"] + "."),    # near dup of old doc
         (100007, "a fresh unique sentence about entirely novel things"),
         ],
        "doc_id long, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("syn").alias("source"), F.length("text").alias("n_chars"))
    d1 = docs.filter(F.col("doc_id") > mid).unionByName(extra)
    full = d0.unionByName(d1)
    p0, p1, pf = (str(tmp_path / n) for n in ("d0", "d1", "dfull"))
    d0.write.parquet(p0)
    d1.write.parquet(p1)
    full.write.parquet(pf)
    ids = [r["doc_id"] for r in full.select("doc_id").collect()]
    emb = spark.createDataFrame(
        [(i, _blob_vec(i)) for i in ids if i % 3 == 0],
        "doc_id long, embedding array<float>")
    pe = str(tmp_path / "emb")
    emb.write.parquet(pe)
    return p0, p1, pf, pe


def _summary(capsys) -> dict:
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def _compare_outputs(spark, inc_out: str, full_out: str):
    """Everything the contract covers, row-for-row."""
    from dexscraper_spark.plans.pipeline_driver import (
        read_pipeline_state)

    _frames_equal(spark.read.parquet(f"{inc_out}/curated"),
                  spark.read.parquet(f"{full_out}/curated"),
                  CURATED_COLS)
    _frames_equal(spark.read.parquet(f"{inc_out}/shards"),
                  spark.read.parquet(f"{full_out}/shards"),
                  SHARD_COLS)
    man_i = json.loads(fsio.read_text(
        spark, fsio.join(inc_out, "shards", "_manifest.json")))
    man_f = json.loads(fsio.read_text(
        spark, fsio.join(full_out, "shards", "_manifest.json")))
    assert man_i == man_f
    cur_i, sem_i = read_pipeline_state(spark, inc_out)
    cur_f, sem_f = read_pipeline_state(spark, full_out)
    _frames_equal(cur_i, cur_f,
                  ["doc_id", "exact_h", "simhash", "component"])
    if sem_f is not None:
        _frames_equal(sem_i, sem_f, ["doc_id", "component"])


@pytest.mark.parametrize("assign_n", ["1", "2"])
def test_delta_equals_full_rebuild(spark, tmp_path, capsys, assign_n):
    """assign_n=2 (VERDICT r10 §next-6): the delta fold supports
    multi-assignment probing, so an assign_n=2 bootstrap has a nightly
    path too — same equivalence contract (the blob geometry co-blocks
    identically at either n)."""
    p0, p1, pf, pe = _prep(spark, tmp_path)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    flags = [*FLAGS, "--assign-n", assign_n]

    assert run(["pipeline", "--docs", p0, "--out", inc,
                "--embeddings", pe, *flags], spark=spark) == 0
    boot = _summary(capsys)
    assert run(["pipeline", "--delta", "--docs", p1, "--out", inc,
                "--embeddings", pe, *flags], spark=spark) == 0
    ds = _summary(capsys)
    assert ds["mode"] == "pipeline-delta"
    assert ds["curated_new"] > 0
    # the crafted dups really exercised the fold
    new_ids = {r["doc_id"] for r in spark.read.parquet(f"{inc}/curated")
               .select("doc_id").collect()}
    assert 100001 not in new_ids and 100002 not in new_ids
    # 100007 is unique AND has no embedding (100007 % 3 != 0): passes
    # curation and bypasses the semantic stage
    assert 100007 in new_ids

    assert run(["pipeline", "--docs", pf, "--out", full,
                "--embeddings", pe, *flags], spark=spark) == 0
    fs = _summary(capsys)
    _compare_outputs(spark, inc, full)
    # manifest totals line up with the full run's own summary
    assert fs["shard_docs"] == json.loads(fsio.read_text(
        spark, fsio.join(inc, "shards", "_manifest.json")))["total_docs"]
    assert boot["curated"] - ds["corpus_removed"] + ds["corpus_added"] \
        == fs["curated"]


def test_delta_noop_rerun_and_validation(spark, tmp_path, capsys):
    p0, p1, pf, pe = _prep(spark, tmp_path)
    inc = str(tmp_path / "inc")
    assert run(["pipeline", "--docs", p0, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    capsys.readouterr()
    assert run(["pipeline", "--delta", "--docs", p1, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    s1 = _summary(capsys)
    root = fsio.join(inc, "state_versions")
    v1 = fsio.pointer_read(spark, root)

    # identical rerun: no-op, same summary, no state version bump
    assert run(["pipeline", "--delta", "--docs", p1, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    out = capsys.readouterr()
    assert json.loads(out.out.strip().splitlines()[-1]) == s1
    assert "already folded" in out.err
    assert fsio.pointer_read(spark, root) == v1

    # validation: DSIR in delta mode is rejected
    assert run(["pipeline", "--delta", "--docs", p1, "--out", inc,
                "--target-docs", p0, "--n", "5", *FLAGS],
               spark=spark) == 2
    assert "--target-docs" in capsys.readouterr().err
    # validation: delta against a non-bootstrapped out
    assert run(["pipeline", "--delta", "--docs", p1,
                "--out", str(tmp_path / "nothing"), *FLAGS],
               spark=spark) == 2
    assert "bootstrapped" in capsys.readouterr().err
    # validation: a semantic fold against a non-semantic bootstrap is
    # refused (the knob record catches it before the sem_state probe)
    noemb = str(tmp_path / "noemb")
    assert run(["pipeline", "--docs", p0, "--out", noemb, *FLAGS],
               spark=spark) == 0
    capsys.readouterr()
    assert run(["pipeline", "--delta", "--docs", p1, "--out", noemb,
                "--embeddings", pe, *FLAGS], spark=spark) == 2
    err = capsys.readouterr().err
    assert "semantic" in err and "mismatch" in err
    # the sem_state probe still guards LEGACY bootstraps with no record
    fsio.delete(spark, fsio.join(noemb, "_knobs.json"))
    assert run(["pipeline", "--delta", "--docs", p1, "--out", noemb,
                "--embeddings", pe, *FLAGS], spark=spark) == 2
    assert "sem_state" in capsys.readouterr().err


def test_delta_retraction_tombstones_index(spark, tmp_path, capsys):
    """VERDICT r10 §missing-3 end-to-end: a delta doc bridges two old
    near-dup clusters → the higher-id old survivor is RETRACTED → the
    --index fold tombstones it → a query against the nightly-folded
    index never returns it; a republish clears the tombstone table.

    Texts found by brute-force search over the real simhash: A–Z and
    Z–B are hamming ≤3 (near), A–B is 6 (not near), so the bootstrap
    publishes A and B separately and the delta's Z merges them."""
    from dexscraper_spark.operators.quantize import (
        ivf_pq_query_saved, ivf_pq_republish, ivf_pq_tombstones)

    A = ("the quick golden fox jumps over the lazy drowsy near the "
         "old river lake today")
    B = ("the quick golden fox hops over the lazy sleepy near the "
         "old river stream today")
    Z = ("the quick golden fox jumps over the lazy drowsy near the "
         "old river stream today")
    filler = [
        (30, "we walked to the market in the morning and bought some "
             "fresh bread for the family"),
        (31, "she plays the violin in a small orchestra that rehearses "
             "every tuesday evening downtown"),
        (32, "the committee approved the budget after a long debate "
             "about the cost of the new library"),
        (33, "my grandfather tells wonderful stories about his years "
             "as a sailor on the northern seas"),
        (34, "rain fell steadily on the roof while we watched an old "
             "film and drank hot chocolate inside"),
        (35, "the scientists measured the temperature of the lake "
             "every hour during the whole experiment"),
    ]
    rows = [(10, A), (20, B)] + filler

    def _docs(pairs):
        return spark.createDataFrame(
            pairs, "doc_id long, text string").select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("syn").alias("source"),
            F.length("text").alias("n_chars"))

    pboot, pz = str(tmp_path / "boot"), str(tmp_path / "z")
    _docs(rows).write.parquet(pboot)
    _docs([(100, Z)]).write.parquet(pz)
    # one-hot 16-dim embeddings: pairwise cosine 0 → the semantic
    # stage is a no-op; the ANN index just needs real vectors
    ids = [r[0] for r in rows]
    emb = spark.createDataFrame(
        [(i, [1.0 if d == j else 0.0 for d in range(16)])
         for j, i in enumerate(ids)],
        "vec_id long, embedding array<float>")
    pe = str(tmp_path / "emb")
    emb.write.parquet(pe)

    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    boot = _summary(capsys)
    assert boot["curated"] == len(rows)   # A and B both published

    # index the bootstrap corpus' embeddings
    idx = str(tmp_path / "index")
    assert ivf_pq_republish(spark, emb, idx, nlist=2, m=4, ksub=8,
                            seed=3, k=2, n_queries=4, nprobe=2,
                            expand=8)["published"]
    q = spark.createDataFrame(
        [(999, [1.0 if d == 1 else 0.0 for d in range(16)])],
        "vec_id long, embedding array<float>")  # axis of doc 20
    pre = {r["neighbor_id"] for r in ivf_pq_query_saved(
        spark, idx, q, corpus=emb, k=3, nprobe=2, expand=8).collect()}
    assert 20 in pre

    assert run(["pipeline", "--delta", "--docs", pz, "--out", out,
                "--embeddings", pe, "--index", idx, *FLAGS],
               spark=spark) == 0
    s = _summary(capsys)
    assert s["retracted"] == 1 and s["curated_new"] == 0
    assert s["ann_tombstoned"] == 1
    assert {r["vec_id"] for r in
            ivf_pq_tombstones(spark, idx).collect()} == {20}
    post = {r["neighbor_id"] for r in ivf_pq_query_saved(
        spark, idx, q, corpus=emb, k=3, nprobe=2, expand=8).collect()}
    assert 20 not in post and len(post) == 3
    # the retraction reached the corpus too
    corpus_ids = {r["doc_id"]
                  for r in spark.read.parquet(f"{out}/curated")
                  .select("doc_id").collect()}
    assert 20 not in corpus_ids and 10 in corpus_ids

    # periodic republish on the post-delta corpus clears the tombstone
    emb_live = emb.filter("vec_id != 20")
    assert ivf_pq_republish(spark, emb_live, idx, nlist=2, m=4,
                            ksub=8, seed=3, k=2, n_queries=4,
                            nprobe=2, expand=8)["published"]
    assert ivf_pq_tombstones(spark, idx) is None
    fresh = {r["neighbor_id"] for r in ivf_pq_query_saved(
        spark, idx, q, corpus=emb_live, k=3, nprobe=2,
        expand=8).collect()}
    assert 20 not in fresh


def test_delta_knob_mismatch_rejected(spark, tmp_path, capsys):
    """VERDICT r10 §missing-2: the bootstrap records its delta-relevant
    knobs; a --delta run with a differing value is refused loudly with
    both values named (the state stores hold fingerprints computed
    under the bootstrap's knobs), and a semantic bootstrap refuses a
    non-semantic fold. A pre-record legacy bootstrap only warns."""
    p0, p1, pf, pe = _prep(spark, tmp_path)
    inc = str(tmp_path / "inc")
    assert run(["pipeline", "--docs", p0, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    capsys.readouterr()

    flags2 = list(FLAGS)
    flags2[flags2.index("--semantic-threshold") + 1] = "0.9"
    assert run(["pipeline", "--delta", "--docs", p1, "--out", inc,
                "--embeddings", pe, *flags2], spark=spark) == 2
    err = capsys.readouterr().err
    assert "semantic_threshold" in err
    assert "0.95" in err and "0.9" in err

    # semantic bootstrap, fold without --embeddings: would bypass the
    # semantic stage entirely — refused
    assert run(["pipeline", "--delta", "--docs", p1, "--out", inc,
                *FLAGS], spark=spark) == 2
    assert "semantic" in capsys.readouterr().err

    # matched knobs: the fold proceeds
    assert run(["pipeline", "--delta", "--docs", p1, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    s1 = _summary(capsys)
    assert s1["curated_new"] > 0

    # legacy bootstrap (no _knobs.json): warn, trust the caller
    fsio.delete(spark, fsio.join(inc, "_knobs.json"))
    assert run(["pipeline", "--delta", "--docs", p1, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    err = capsys.readouterr().err
    assert "cannot verify" in err and "already folded" in err


def test_delta_same_path_new_content_folds(spark, tmp_path, capsys):
    """VERDICT r10 §wrong-2: batch identity is CONTENT-based, so a
    nightly job overwriting a stable slice path (--docs /data/latest)
    folds night 2's docs instead of hitting night 1's _PUBLISHED marker
    and silently no-opping; an identical rerun still no-ops."""
    p0, p1, pf, pe = _prep(spark, tmp_path)
    inc = str(tmp_path / "inc")
    nightly = str(tmp_path / "nightly")
    assert run(["pipeline", "--docs", p0, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    capsys.readouterr()

    # night 1: fold d1 via the stable path
    spark.read.parquet(p1).write.mode("overwrite").parquet(nightly)
    assert run(["pipeline", "--delta", "--docs", nightly, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    s1 = _summary(capsys)
    root = fsio.join(inc, "state_versions")
    v1 = fsio.pointer_read(spark, root)

    # night 2: same path, NEW content (fresh monotone ids)
    d2 = spark.createDataFrame(
        [(200001, "a fresh nightly sentence about the glaciers and "
                  "the sea"),
         (200002, "this is another new sentence that talks about the "
                  "volcanoes in the north")],
        "doc_id long, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("syn").alias("source"), F.length("text").alias("n_chars"))
    d2.write.mode("overwrite").parquet(nightly)
    assert run(["pipeline", "--delta", "--docs", nightly, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    out = capsys.readouterr()
    s2 = json.loads(out.out.strip().splitlines()[-1])
    assert "already folded" not in out.err
    assert s2["batch"] != s1["batch"]
    assert s2["input_docs"] == 2
    assert fsio.pointer_read(spark, root) != v1
    corpus_ids = {r["doc_id"]
                  for r in spark.read.parquet(f"{inc}/curated")
                  .select("doc_id").collect()}
    assert {200001, 200002} <= corpus_ids

    # night 2 rerun, content unchanged: still a no-op
    v2 = fsio.pointer_read(spark, root)
    assert run(["pipeline", "--delta", "--docs", nightly, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    out = capsys.readouterr()
    assert json.loads(out.out.strip().splitlines()[-1]) == s2
    assert "already folded" in out.err
    assert fsio.pointer_read(spark, root) == v2


@pytest.mark.parametrize("after_shards", [False, True])
def test_delta_crash_replay_converges(spark, tmp_path, capsys,
                                      monkeypatch, after_shards):
    """Kill the delta run around the shard fold (before the state
    publish); a plain rerun recomputes from the unchanged state and
    CONVERGES — artifacts equal an uninterrupted twin's."""
    import dexscraper_spark.plans.curation as curation_mod

    p0, p1, pf, pe = _prep(spark, tmp_path)
    crash, clean = str(tmp_path / "crash"), str(tmp_path / "clean")
    for out in (crash, clean):
        assert run(["pipeline", "--docs", p0, "--out", out,
                    "--embeddings", pe, *FLAGS], spark=spark) == 0
    capsys.readouterr()

    real = curation_mod.update_training_shards

    def boom(*a, **kw):
        if after_shards:
            real(*a, **kw)
        raise RuntimeError("injected crash")

    monkeypatch.setattr(curation_mod, "update_training_shards", boom)
    with pytest.raises(RuntimeError, match="injected"):
        run(["pipeline", "--delta", "--docs", p1, "--out", crash,
             "--embeddings", pe, *FLAGS], spark=spark)
    monkeypatch.setattr(curation_mod, "update_training_shards", real)

    assert run(["pipeline", "--delta", "--docs", p1, "--out", crash,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    assert run(["pipeline", "--delta", "--docs", p1, "--out", clean,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    _frames_equal(spark.read.parquet(f"{crash}/curated"),
                  spark.read.parquet(f"{clean}/curated"), CURATED_COLS)
    _frames_equal(spark.read.parquet(f"{crash}/shards"),
                  spark.read.parquet(f"{clean}/shards"), SHARD_COLS)
    assert json.loads(fsio.read_text(
        spark, fsio.join(crash, "shards", "_manifest.json"))) == \
        json.loads(fsio.read_text(
            spark, fsio.join(clean, "shards", "_manifest.json")))


def test_full_resume_after_crash_and_flag_invalidation(
        spark, tmp_path, capsys, monkeypatch):
    """--resume: a crash at the LAST stage resumes without recomputing
    the five before it; a changed flag invalidates its stage (and
    anything downstream) loudly while still skipping earlier stages."""
    import dexscraper_spark.plans.curation as curation_mod

    p0, _, _, pe = _prep(spark, tmp_path)
    out, twin = str(tmp_path / "r"), str(tmp_path / "twin")

    real = curation_mod.write_training_shards
    monkeypatch.setattr(
        curation_mod, "write_training_shards",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("boom")))
    with pytest.raises(RuntimeError, match="boom"):
        run(["pipeline", "--docs", p0, "--out", out,
             "--embeddings", pe, *FLAGS], spark=spark)
    monkeypatch.setattr(curation_mod, "write_training_shards", real)
    capsys.readouterr()

    assert run(["pipeline", "--docs", p0, "--out", out,
                "--embeddings", pe, "--resume", *FLAGS],
               spark=spark) == 0
    res = capsys.readouterr()
    # the five completed stages were skipped, shards recomputed
    assert res.err.count("skipped (--resume)") == 5
    s_resumed = json.loads(res.out.strip().splitlines()[-1])

    assert run(["pipeline", "--docs", p0, "--out", twin,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    s_clean = _summary(capsys)
    assert {k: v for k, v in s_resumed.items()} == s_clean
    _frames_equal(spark.read.parquet(f"{out}/shards"),
                  spark.read.parquet(f"{twin}/shards"), SHARD_COLS)

    # flag change: --train-shards only touches the shards stage
    assert run(["pipeline", "--docs", p0, "--out", out,
                "--embeddings", pe, "--resume",
                *FLAGS[:-6], "--train-shards", "8",
                "--semantic-threshold", "0.95",
                "--semantic-nlist", "4"], spark=spark) == 0
    res = capsys.readouterr()
    assert "STALE" in res.err
    assert res.err.count("skipped (--resume)") == 5
    man = json.loads(fsio.read_text(
        spark, fsio.join(out, "shards", "_manifest.json")))
    assert man["n_shards"] == 8

    # upstream flag change: min-tokens invalidates curate AND all
    # downstream stages (pre still skips)
    assert run(["pipeline", "--docs", p0, "--out", out,
                "--embeddings", pe, "--resume",
                "--min-quality", "0.3", "--min-tokens", "4",
                "--split-max-tokens", "64", "--max-tokens", "256",
                "--train-shards", "8", "--semantic-threshold", "0.95",
                "--semantic-nlist", "4"], spark=spark) == 0
    res = capsys.readouterr()
    assert res.err.count("skipped (--resume)") == 1  # only `pre`
    assert res.err.count("STALE") >= 1


def test_two_successive_deltas_equal_full_rebuild(spark, tmp_path,
                                                  capsys):
    """The N-delta form of the contract: bootstrap + TWO folds ≡ one
    full rebuild — exercises state-version succession (pointer v1 →
    v2), label maintenance across rounds, and sem_dropped bookkeeping
    feeding the second fold.

    Embedding geometry: each blob is EXACTLY one repeated vector. With
    N ≥ 2 folds the intermediate fold clusters over an intermediate
    corpus whose k-means centroids differ from the full rebuild's, so
    jittered blobs could straddle a Voronoi boundary in one run but
    not the other (SemDeDup's documented co-blocking caveat);
    identical vectors are assignment-tied as a unit under ANY centroid
    set, so every true pair co-blocks in every run and the exactness
    contract applies round after round."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hi = docs.select(F.max("doc_id")).first()[0]
    b0 = docs.filter(F.col("doc_id") <= hi // 3)
    b1 = docs.filter((F.col("doc_id") > hi // 3)
                     & (F.col("doc_id") <= 2 * hi // 3))
    b2 = docs.filter(F.col("doc_id") > 2 * hi // 3)
    paths = {}
    for name, df in (("b0", b0), ("b1", b1), ("b2", b2),
                     ("full", docs)):
        paths[name] = str(tmp_path / name)
        df.write.parquet(paths[name])
    def axis_vec(i: int) -> list:
        v = [0.0] * 8
        v[i % 5] = 1.0
        return v

    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    emb = spark.createDataFrame(
        [(i, axis_vec(i)) for i in ids if i % 3 == 0],
        "doc_id long, embedding array<float>")
    pe = str(tmp_path / "emb")
    emb.write.parquet(pe)

    inc, full = str(tmp_path / "inc"), str(tmp_path / "fullout")
    assert run(["pipeline", "--docs", paths["b0"], "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    assert run(["pipeline", "--delta", "--docs", paths["b1"],
                "--out", inc, "--embeddings", pe, *FLAGS],
               spark=spark) == 0
    assert run(["pipeline", "--delta", "--docs", paths["b2"],
                "--out", inc, "--embeddings", pe, *FLAGS],
               spark=spark) == 0
    root = fsio.join(inc, "state_versions")
    assert fsio.pointer_read(spark, root) == "v_000002"
    assert run(["pipeline", "--docs", paths["full"], "--out", full,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    _compare_outputs(spark, inc, full)


def test_delta_state_store_is_bucket_scoped(spark, tmp_path, capsys):
    """VERDICT r10 §missing-4: the fingerprint store is hash-bucketed;
    after the first fold buckets it, each small fold rewrites only the
    k≪B buckets its docs hash into (state_buckets_written pins it),
    untouched buckets stay owned by older version dirs (the manifest
    spans versions, owner dirs survive GC), a fold whose manifest
    would span >_STATE_MAX_VERSIONS compacts to one version — and the
    assembled store still equals a full rebuild's row-for-row."""
    from dexscraper_spark.plans.pipeline_driver import (
        _STATE_MAX_VERSIONS, read_pipeline_state)

    boot_rows = [
        (1, "we walked to the market in the morning and bought some "
            "fresh bread for the family"),
        (2, "she plays the violin in a small orchestra that rehearses "
            "every tuesday evening downtown"),
        (3, "the committee approved the budget after a long debate "
            "about the cost of the new library"),
        (4, "my grandfather tells wonderful stories about his years "
            "as a sailor on the northern seas"),
        (5, "rain fell steadily on the roof while we watched an old "
            "film and drank hot chocolate inside"),
        (6, "the scientists measured the temperature of the lake "
            "every hour during the whole experiment"),
    ]
    # fold ids picked so pmod(xxhash64(id), 8) are pairwise DISTINCT
    # (0,3,2,5,6,4,7): each single-doc fold supersedes a different
    # bucket, so the owner manifest grows one version per fold until
    # the compaction bound trips at fold 7
    fold_rows = [
        (100, "a gentle breeze carried the smell of pine across the "
              "valley as the hikers reached the summit"),
        (101, "the baker opened his shop before dawn so that the "
              "first customers could smell the warm loaves"),
        (102, "children gathered around the fountain in the square "
              "to watch the puppets dance on their strings"),
        (103, "an old map in the attic showed a road that no longer "
              "appears in any of the modern atlases"),
        (105, "the orchestra tuned their instruments while the "
              "audience found their seats under the chandeliers"),
        (107, "a lighthouse keeper wrote in his journal every night "
              "about the ships that passed in the dark"),
        (111, "the gardener planted rows of tulips along the path "
              "that leads from the gate to the greenhouse"),
    ]

    def _docs(pairs):
        return spark.createDataFrame(
            pairs, "doc_id long, text string").select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("syn").alias("source"),
            F.length("text").alias("n_chars"))

    flags = [f for f in FLAGS]  # no --embeddings: curation-only store
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    pboot = str(tmp_path / "boot")
    _docs(boot_rows).write.parquet(pboot)
    assert run(["pipeline", "--docs", pboot, "--out", inc, *flags],
               spark=spark) == 0
    capsys.readouterr()

    B = 8
    root = fsio.join(inc, "state_versions")
    rewrote, vrows = [], []
    for i, row in enumerate(fold_rows):
        p = str(tmp_path / f"fold{i}")
        _docs([row]).write.parquet(p)
        assert run(["pipeline", "--delta", "--docs", p, "--out", inc,
                    "--state-buckets", str(B), *flags],
                   spark=spark) == 0
        s = _summary(capsys)
        rewrote.append(s["state_buckets_rewritten"])
        meta = json.loads(fsio.read_text(
            spark, fsio.join(root, "_current")))
        layout = meta["state_layout"]
        assert layout["buckets"] == B
        owner_vers = set()
        for vs in layout["bucket_owners"].values():
            owner_vers.update(vs)
        assert len(owner_vers) <= _STATE_MAX_VERSIONS
        assert s["state_versions_referenced"] == len(owner_vers)
        # every referenced version directory survives GC
        for v in owner_vers:
            assert fsio.exists(spark, fsio.join(root, v, "curation"))
        vrows.append(spark.read.parquet(fsio.join(
            root, fsio.pointer_read(spark, root), "curation")).count())

    # fold 1 bucketed the whole store (one-time full write); the five
    # scoped folds are MERGE-ON-READ appends — each version dir holds
    # exactly its one new row and NO bucket is rewritten (the crafted
    # folds have no relabels); the fold whose manifest would reference
    # >max versions compacted (full write, owner lists collapse)
    n_state0 = len(boot_rows)
    assert rewrote[0] == B and vrows[0] == n_state0 + 1
    assert rewrote[1:-1] == [0] * 5
    assert vrows[1:-1] == [1] * 5            # delta-sized writes
    assert rewrote[-1] == B                  # the compaction fold
    assert vrows[-1] == n_state0 + len(fold_rows)
    meta = json.loads(fsio.read_text(spark, fsio.join(root, "_current")))
    owner_vers = set()
    for vs in meta["state_layout"]["bucket_owners"].values():
        owner_vers.update(vs)
    assert len(owner_vers) == 1

    # the assembled layered store ≡ one full rebuild, row-for-row
    pfull = str(tmp_path / "all")
    _docs(boot_rows + fold_rows).write.parquet(pfull)
    assert run(["pipeline", "--docs", pfull, "--out", full, *flags],
               spark=spark) == 0
    _compare_outputs(spark, inc, full)
    cur, sem = read_pipeline_state(spark, inc)
    assert sem is None
    assert cur.count() == len(boot_rows) + len(fold_rows)


def test_delta_with_zero_semantic_drops_at_bootstrap(spark, tmp_path,
                                                     capsys):
    """Regression (caught at sf0.1): a bootstrap whose semantic stage
    drops NOTHING writes an empty sem_dropped/ (only _SUCCESS), and
    the delta's partition merge must read it with an explicit schema
    instead of tripping UNABLE_TO_INFER_SCHEMA — an empty side store
    is a normal state, not an error."""
    import numpy as np

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hi, lo = docs.select(F.max("doc_id"), F.min("doc_id")).first()
    mid = (hi + lo) // 2
    p0, p1 = str(tmp_path / "d0"), str(tmp_path / "d1")
    docs.filter(F.col("doc_id") <= mid).write.parquet(p0)
    docs.filter(F.col("doc_id") > mid).write.parquet(p1)
    # unique random vectors: nothing exceeds the 0.95 threshold
    rng = np.random.default_rng(3)
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)])
         for i in ids if i % 3 == 0],
        "doc_id long, embedding array<float>")
    pe = str(tmp_path / "emb")
    emb.write.parquet(pe)

    inc = str(tmp_path / "inc")
    assert run(["pipeline", "--docs", p0, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    boot = _summary(capsys)
    assert boot["semantic_dropped"] == 0
    # the store exists but holds zero data files
    assert not [n for n in fsio.list_names(spark,
                                           fsio.join(inc, "sem_dropped"))
                if not n.startswith(("_", "."))]
    assert run(["pipeline", "--delta", "--docs", p1, "--out", inc,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    ds = _summary(capsys)
    assert ds["curated_new"] > 0
