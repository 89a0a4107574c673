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


# r13 (VERDICT #6): multi-second delta/maintenance integration lane — the
# full-suite wall time (52 min measured) no longer fits the driver's
# verify budget, and this module is the dominant cost. The default lane
# (`-m "not slow"`, pyproject addopts) keeps every oracle-coverage and
# unit test; run `make test-all` for the complete suite.
pytestmark = pytest.mark.slow

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

    # the retained-loser store is part of the contract too: folds must
    # leave it exactly as a rebuild's bootstrap writes it
    def _dropped(out):
        try:
            return spark.read.parquet(
                f"{out}/dedup_dropped").drop("id_range")
        except Exception:
            return None

    dd_i, dd_f = _dropped(inc_out), _dropped(full_out)
    if dd_i is not None or dd_f is not None:
        assert dd_i is not None and dd_f is not None
        _frames_equal(dd_i, dd_f, ["doc_id", "text"])


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

    # the failed fold died AFTER shared-table merges began, so it
    # kept its lease (stamped failed): a plain rerun refuses loudly
    # instead of silently folding onto half-merged tables, and the
    # documented recovery is an explicit --break-lease replay
    assert run(["pipeline", "--delta", "--docs", p1, "--out", crash,
                "--embeddings", pe, *FLAGS], spark=spark) == 2
    err = capsys.readouterr().err
    assert "lease" in err and "--break-lease" in err
    assert run(["pipeline", "--delta", "--break-lease", "--docs", p1,
                "--out", crash, "--embeddings", pe, *FLAGS],
               spark=spark) == 0
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
    """VERDICT r10 §missing-4 + r11 §next-3: the fingerprint store is
    hash-bucketed; the first fold seeds it (one-time full write), each
    later fold appends delta-sized rows PLUS a bounded TRICKLE of
    compacted buckets (≤ ceil(B/(MAX-1)) per fold, oldest-referencing
    first) — over a 12-fold sequence NO fold after the seed ever
    rewrites the full store, versions_referenced stays bounded, every
    version a CURRENT OR PREVIOUS manifest references survives GC
    (laggard readers of the pre-flip manifest keep a readable store,
    ADVICE r11), and the assembled store still equals a full rebuild
    row-for-row."""
    from dexscraper_spark.plans.pipeline_driver import (
        _STATE_MAX_VERSIONS, _compact_budget, read_pipeline_state)

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
    # single-doc folds over a spread of buckets: the owner manifest
    # would grow one version per fold forever without the trickle
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
        (113, "the ferry crossed the strait twice a day and carried "
              "the mail between the two small harbor towns"),
        (117, "a travelling circus raised its striped tent on the "
              "field behind the school for the summer fair"),
        (121, "the librarian catalogued a donated box of letters "
              "written by settlers during the first hard winters"),
        (125, "wind turbines on the ridge turned slowly against the "
              "clouds while the cattle grazed in the pasture below"),
        (131, "the night train to the coast was delayed because a "
              "fallen branch had blocked the rails near the tunnel"),
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
    prev_owner_vers: set = set()
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
        # bounded span: ≤ MAX steady-state, +1 transient (first cycle)
        assert len(owner_vers) <= _STATE_MAX_VERSIONS + 1
        assert s["state_versions_referenced"] == len(owner_vers)
        # every referenced version directory survives GC — and so does
        # everything the PREVIOUS manifest references: a laggard reader
        # that resolved the pre-flip pointer must still be able to
        # assemble the old store (ADVICE r11)
        for v in owner_vers | prev_owner_vers:
            assert fsio.exists(spark, fsio.join(root, v, "curation"))
        prev_owner_vers = owner_vers
        vrows.append(spark.read.parquet(fsio.join(
            root, fsio.pointer_read(spark, root), "curation")).count())

    # fold 1 seeded the store (the one-time full bucketing); fold 2
    # has nothing old enough to trickle (pure delta-sized append);
    # every later fold compacts AT MOST the budget and NEVER the full
    # store — the r11 design's all-bucket compaction cliff is gone
    n_state0 = len(boot_rows)
    K = _compact_budget(B)
    assert rewrote[0] == B and vrows[0] == n_state0 + 1
    assert rewrote[1] == 0 and vrows[1] == 1   # merge-on-read append
    assert all(r <= K for r in rewrote[1:])
    assert all(r < B for r in rewrote[1:])     # no stop-the-world fold
    assert any(r > 0 for r in rewrote[1:])     # the trickle does run

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


def test_delta_resurrection_clears_tombstone(spark, tmp_path, capsys,
                                             monkeypatch):
    """ADVICE r11 resurrection path, end-to-end: doc 25 is a SEMANTIC
    duplicate of doc 20 (identical embedding) and loses at bootstrap;
    an earlier maintenance fold tombstoned 25 in the shared index
    (simulated directly — its codes are still there). The next delta's
    bridge doc Z retracts 20 at curation level, which RESURRECTS 25:
    the fold must re-publish 25 to the corpus, tombstone 20, and CLEAR
    25's tombstone in the same --index maintenance op, so 25's
    still-live index code is servable again without a republish."""
    from dexscraper_spark.operators.quantize import (
        ivf_pq_query_saved, ivf_pq_republish, ivf_pq_tombstone,
        ivf_pq_tombstones)

    A = ("the quick golden fox jumps over the lazy drowsy near the "
         "old river lake today")
    B = ("the quick golden fox hops over the lazy sleepy near the "
         "old river stream today")
    Z = ("the quick golden fox jumps over the lazy drowsy near the "
         "old river stream today")
    X = ("a completely different report about the harvest festival "
         "and the songs we sang together")
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
    rows = [(10, A), (20, B), (25, X)] + filler

    def _docs(pairs):
        return spark.createDataFrame(
            pairs, "doc_id long, text string").select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("syn").alias("source"),
            F.length("text").alias("n_chars"))

    pboot, pz = str(tmp_path / "boot"), str(tmp_path / "z")
    _docs(rows).write.parquet(pboot)
    _docs([(100, Z)]).write.parquet(pz)
    # one-hot 16-dim embeddings; doc 25 COPIES doc 20's axis (cosine
    # 1.0 → semantic duplicate), everyone else orthogonal
    ids = [r[0] for r in rows]
    axis = {i: j for j, i in enumerate(ids)}
    axis[25] = axis[20]
    emb = spark.createDataFrame(
        [(i, [1.0 if d == axis[i] else 0.0 for d in range(16)])
         for i in ids],
        "vec_id long, embedding array<float>")
    pe = str(tmp_path / "emb")
    emb.write.parquet(pe)

    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    boot = _summary(capsys)
    # 25 lost the semantic stage to 20
    assert boot["curated"] == len(rows) - 1
    corpus0 = {r["doc_id"] for r in spark.read
               .parquet(f"{out}/curated").select("doc_id").collect()}
    assert 25 not in corpus0 and 20 in corpus0

    idx = str(tmp_path / "index")
    assert ivf_pq_republish(spark, emb, idx, nlist=2, m=4, ksub=8,
                            seed=3, k=2, n_queries=4, nprobe=2,
                            expand=8)["published"]
    # the earlier fold that demoted 25 left its tombstone behind
    ivf_pq_tombstone(spark, idx,
                     spark.createDataFrame([(25,)], "vec_id long"))

    # lower the pressure threshold so the 1/9 fraction also exercises
    # the republish recommendation (VERDICT r11 §next-6)
    from dexscraper_spark.operators import quantize as _q
    monkeypatch.setattr(_q, "TOMBSTONE_REPUBLISH_FRACTION", 0.1)
    assert run(["pipeline", "--delta", "--docs", pz, "--out", out,
                "--embeddings", pe, "--index", idx, *FLAGS],
               spark=spark) == 0
    cap = capsys.readouterr()
    s = json.loads(cap.out.strip().splitlines()[-1])
    assert s["ann_tombstone_fraction"] == round(1 / 9, 4)
    assert "WARNING" in cap.err and "republish" in cap.err
    assert s["retracted"] == 1          # doc 20 (bridge Z merged A+B)
    assert s["resurrected"] == 1        # doc 25, suppressor gone
    assert s["ann_tombstoned"] == 1     # doc 20 enters the table
    assert s["ann_tombstones_cleared"] == 1   # doc 25 leaves it
    assert {r["vec_id"] for r in
            ivf_pq_tombstones(spark, idx).collect()} == {20}
    corpus1 = {r["doc_id"] for r in spark.read
               .parquet(f"{out}/curated").select("doc_id").collect()}
    assert 25 in corpus1 and 20 not in corpus1

    # 25 is servable again on its axis; 20 is not
    q = spark.createDataFrame(
        [(999, [1.0 if d == axis[25] else 0.0 for d in range(16)])],
        "vec_id long, embedding array<float>")
    got = {r["neighbor_id"] for r in ivf_pq_query_saved(
        spark, idx, q, corpus=emb, k=3, nprobe=2, expand=8).collect()}
    assert 25 in got and 20 not in got


def _tiny_boot(spark, tmp_path):
    """Bootstrap a small curation-only pipeline; returns (out, docs1,
    docs2) where docs1/docs2 are two distinct delta slices."""
    boot_rows = [
        (1, "we walked to the market in the morning and bought some "
            "fresh bread for the family"),
        (2, "she plays the violin in a small orchestra that rehearses "
            "every tuesday evening downtown"),
        (3, "the committee approved the budget after a long debate "
            "about the cost of the new library"),
    ]
    d1 = [(50, "a gentle breeze carried the smell of pine across the "
               "valley as the hikers reached the summit")]
    d2 = [(60, "the baker opened his shop before dawn so that the "
               "first customers could smell the warm loaves")]

    def _docs(pairs):
        return spark.createDataFrame(
            pairs, "doc_id long, text string").select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("syn").alias("source"),
            F.length("text").alias("n_chars"))

    out = str(tmp_path / "out")
    pboot, p1, p2 = (str(tmp_path / n) for n in ("boot", "d1", "d2"))
    _docs(boot_rows).write.parquet(pboot)
    _docs(d1).write.parquet(p1)
    _docs(d2).write.parquet(p2)
    assert run(["pipeline", "--docs", pboot, "--out", out, *FLAGS],
               spark=spark) == 0
    return out, p1, p2


def test_delta_fold_lease_serializes(spark, tmp_path, capsys):
    """VERDICT r11 §wrong-2: folds are serialized per --out by
    _delta/__fold.lock — a second fold starting while one runs is
    refused loudly at fold START (before any merge), a crashed
    holder's lock is cleared with --break-lease, and a successful fold
    releases the lease."""
    out, p1, p2 = _tiny_boot(spark, tmp_path)
    capsys.readouterr()

    lock = fsio.join(out, "_delta", "__fold.lock")
    assert fsio.create_exclusive(spark, lock, '{"pid": 0}')
    assert run(["pipeline", "--delta", "--docs", p1, "--out", out,
                *FLAGS], spark=spark) == 2
    err = capsys.readouterr().err
    assert "lease" in err and "--break-lease" in err
    # nothing was folded — no marker, no state pointer
    assert not fsio.exists(spark, fsio.join(out, "state_versions",
                                            "_current"))

    assert run(["pipeline", "--delta", "--docs", p1, "--out", out,
                "--break-lease", *FLAGS], spark=spark) == 0
    s = _summary(capsys)
    assert s["curated_new"] == 1
    assert not fsio.exists(spark, lock)      # released on success
    # and the next fold needs no flag at all
    assert run(["pipeline", "--delta", "--docs", p2, "--out", out,
                *FLAGS], spark=spark) == 0
    assert _summary(capsys)["curated_new"] == 1


def test_delta_publish_cas_refuses_interleaved_publish(
        spark, tmp_path, capsys, monkeypatch):
    """VERDICT r11 §wrong-2 defense-in-depth: a writer that bypasses
    the fold lease and flips the state pointer between this fold's
    state READ and its PUBLISH is detected by expect_current — the
    fold refuses loudly (rc 2, both versions named), writes no
    _PUBLISHED marker, and a rerun on fresh state folds the same slice
    successfully with no rows lost."""
    from dexscraper_spark.plans import curation as curation_mod

    out, p1, p2 = _tiny_boot(spark, tmp_path)
    capsys.readouterr()
    # seed the layered store with a first fold
    assert run(["pipeline", "--delta", "--docs", p1, "--out", out,
                *FLAGS], spark=spark) == 0
    capsys.readouterr()
    root = fsio.join(out, "state_versions")
    v_before = fsio.pointer_read(spark, root)

    real = curation_mod.apply_state_updates
    fired = {"n": 0}

    def rogue_then_real(state, delta):
        # simulate a concurrent fold's publish landing mid-span: a
        # content-identical manifest under a fresh version name
        # (owner lists unchanged → same rows), flipped directly,
        # ignoring the lease this fold holds
        if fired["n"] == 0:
            fired["n"] = 1
            meta = json.loads(fsio.read_text(
                spark, fsio.join(root, "_current")))
            vney = fsio.pointer_next_version(spark, root)
            fsio.mkdirs(spark, fsio.join(root, vney))
            fsio.write_text_atomic(
                spark, fsio.join(root, vney, "_rogue"), "1")
            retain = {v for vs in
                      meta["state_layout"]["bucket_owners"].values()
                      for v in vs}
            fsio.pointer_publish(
                spark, root, vney,
                meta={"batch": "rogue",
                      "state_layout": meta["state_layout"]},
                keep=2, retain=retain)
        return real(state, delta)

    monkeypatch.setattr(curation_mod, "apply_state_updates",
                        rogue_then_real)
    assert run(["pipeline", "--delta", "--docs", p2, "--out", out,
                *FLAGS], spark=spark) == 2
    err = capsys.readouterr().err
    assert "pointer now names" in err and v_before in err
    v_rogue = fsio.pointer_read(spark, root)
    assert v_rogue != v_before
    # no marker for the refused batch → the rerun is a real fold.
    # The refusal fired AFTER merges began, so the lease survived the
    # failure (stamped) — the documented recovery is --break-lease.
    monkeypatch.setattr(curation_mod, "apply_state_updates", real)
    assert run(["pipeline", "--delta", "--break-lease", "--docs", p2,
                "--out", out, *FLAGS], spark=spark) == 0
    s = _summary(capsys)
    assert s["curated_new"] == 1
    # both deltas' rows are in the corpus — nothing was lost
    ids = {r["doc_id"] for r in spark.read.parquet(f"{out}/curated")
           .select("doc_id").collect()}
    assert {50, 60} <= ids


def test_delta_state_buckets_mismatch_rejected(spark, tmp_path,
                                               capsys):
    """VERDICT r11 §next-5: a fold whose explicit --state-buckets
    disagrees with the store's frozen layout is refused loudly naming
    both values (r11 silently ignored the flag); dropping the flag —
    or passing the matching value — folds normally."""
    out, p1, p2 = _tiny_boot(spark, tmp_path)
    capsys.readouterr()
    assert run(["pipeline", "--delta", "--docs", p1, "--out", out,
                "--state-buckets", "8", *FLAGS], spark=spark) == 0
    capsys.readouterr()

    assert run(["pipeline", "--delta", "--docs", p2, "--out", out,
                "--state-buckets", "16", *FLAGS], spark=spark) == 2
    err = capsys.readouterr().err
    assert "16" in err and "8 buckets" in err
    assert run(["pipeline", "--delta", "--docs", p2, "--out", out,
                "--state-buckets", "8", *FLAGS], spark=spark) == 0
    assert _summary(capsys)["curated_new"] == 1


def test_state_buckets_derived_from_store_size(spark, tmp_path,
                                               monkeypatch):
    """VERDICT r11 §next-5: with no --state-buckets, the seeding fold
    derives the bucket count from the store's own row count (ceil of
    rows/target, clamped), so two corpora of different sizes get
    proportionate layouts instead of one fixed 64."""
    from dexscraper_spark.plans import pipeline_driver as pd

    monkeypatch.setattr(pd, "_STATE_ROWS_PER_BUCKET", 10)

    def _seed(n_rows, name):
        df = spark.range(n_rows).select(
            F.col("id").alias("doc_id"),
            F.xxhash64("id").alias("fingerprint"))
        layout, stats = pd._layered_write(
            spark, str(tmp_path / name), "v_000001", "curation",
            full_df=df, appended_df=df, changed_ids=None,
            prev_layout=None, default_buckets=None)
        return layout["buckets"]

    assert _seed(100, "small") == 16          # min clamp
    assert _seed(400, "large") == 40          # ceil(400/10)


# ---------------------------------------------------------------------------
# --upsert (VERDICT r11 §next-4): same-id content-update re-crawl folds
# ---------------------------------------------------------------------------

_UP_TEXTS = {
    10: "we walked to the market in the morning and bought some "
        "fresh bread for the family",
    20: "she plays the violin in a small orchestra that rehearses "
        "every tuesday evening downtown",
    30: "the committee approved the budget after a long debate "
        "about the cost of the new library",
    # 40/41: a verified simhash near-pair (hamming 3 on the repo's own
    # simhash; playbook: craft near-dups by measuring, not guessing) —
    # cluster {40, 41}, survivor 40
    40: "the quick golden fox jumps over the lazy drowsy near the "
        "old river lake today",
    41: "the quick golden fox jumps over the lazy drowsy near the "
        "old river stream today",
    50: "my grandfather tells wonderful stories about his years "
        "as a sailor on the northern seas",
}
_UP_NEW = {
    10: "rain fell steadily on the roof while we watched an old "
        "film and drank hot chocolate inside",
    30: "the scientists measured the temperature of the lake "
        "every hour during the whole experiment",
    41: "a gentle breeze carried the smell of pine across the "
        "valley as the hikers reached the summit",
    60: "the baker opened his shop before dawn so that the "
        "first customers could smell the warm loaves",
}


def _up_docs(spark, pairs):
    return spark.createDataFrame(
        pairs, "doc_id long, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("syn").alias("source"),
        F.length("text").alias("n_chars"))


def _up_emb(spark, axes):
    return spark.createDataFrame(
        [(i, [1.0 if d == a else 0.0 for d in range(16)])
         for i, a in axes.items()],
        "doc_id long, embedding array<float>")


def test_upsert_fold_equals_rebuild(spark, tmp_path, capsys):
    """The full --upsert story, checked against a rebuild on the
    updated corpus: unchanged docs no-op; a changed published doc is
    replaced (old row out of corpus/state/shards, stale index code
    tombstoned, new content re-published); a changed doc whose new
    embedding duplicates an older doc re-enters and loses the
    SEMANTIC stage (lands in sem_dropped under its NEW text); a
    changed never-published cluster loser re-enters and wins; a truly
    new doc folds normally; an exact copy of stored text drops. The
    incremental outputs equal the full rebuild row-for-row."""
    from dexscraper_spark.operators.quantize import (
        ivf_pq_republish, ivf_pq_tombstones)

    boot = _up_docs(spark, list(_UP_TEXTS.items()))
    pboot = str(tmp_path / "boot")
    boot.write.parquet(pboot)
    emb_v1 = _up_emb(spark, {10: 0, 20: 1, 30: 2, 40: 3, 41: 4, 50: 5})
    pe1 = str(tmp_path / "emb1")
    emb_v1.write.parquet(pe1)

    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out,
                "--embeddings", pe1, *FLAGS], spark=spark) == 0
    bs = _summary(capsys)
    assert bs["curated"] == 5                 # 41 lost to 40

    # index over the PUBLISHED bootstrap embeddings (the real flow)
    idx = str(tmp_path / "idx")
    pub_emb = emb_v1.filter("doc_id != 41") \
        .withColumnRenamed("doc_id", "vec_id")
    assert ivf_pq_republish(spark, pub_emb, idx, nlist=2, m=4, ksub=8,
                            seed=3, k=2, n_queries=4, nprobe=2,
                            expand=8)["published"]

    # the re-crawl: 50 unchanged; 10/30/41 changed; 60 new; 61 an
    # exact copy of stored doc 20's text (must drop, keeper stays)
    slice_rows = [(50, _UP_TEXTS[50]), (10, _UP_NEW[10]),
                  (30, _UP_NEW[30]), (41, _UP_NEW[41]),
                  (60, _UP_NEW[60]), (61, _UP_TEXTS[20])]
    pup = str(tmp_path / "up")
    _up_docs(spark, slice_rows).write.parquet(pup)
    # updated embeddings: 10 moves to a fresh axis; 30's NEW embedding
    # duplicates 20's (semantic loser); 41/60 fresh axes
    emb_v2 = _up_emb(spark, {10: 6, 20: 1, 30: 1, 40: 3, 41: 7,
                             50: 5, 60: 8})
    pe2 = str(tmp_path / "emb2")
    emb_v2.write.parquet(pe2)

    assert run(["pipeline", "--delta", "--upsert", "--docs", pup,
                "--out", out, "--embeddings", pe2, "--index", idx,
                *FLAGS], spark=spark) == 0
    s = _summary(capsys)
    assert s["upsert_unchanged"] == 1         # 50
    assert s["upsert_changed"] == 3           # 10, 30, 41
    assert s["upsert_revived"] == 0
    assert s["semantic_dropped_new"] == 1     # 30 loses to 20
    # ALL changed ids are marked sticky — 10/30 (published, stale
    # codes live in the index) and 41 (never indexed: the mark
    # excludes nothing, but a changed id whose code entered the index
    # in an earlier fold and was since demoted carries exactly this
    # shape, and its stale code must not be resurrection-clearable)
    assert s["ann_tombstoned"] == 3
    assert s["ann_tombstones_sticky"] == 3

    corpus = {r["doc_id"]: r["text"]
              for r in spark.read.parquet(f"{out}/curated").collect()}
    assert corpus[10] == _UP_NEW[10]          # replaced
    assert 30 not in corpus                   # semantic loser now
    assert corpus[41] == _UP_NEW[41]          # freed loser published
    assert corpus[60] == _UP_NEW[60]
    assert 61 not in corpus                   # exact dup dropped
    assert corpus[20] == _UP_TEXTS[20] and corpus[50] == _UP_TEXTS[50]
    assert {r["vec_id"] for r in
            ivf_pq_tombstones(spark, idx).collect()} == {10, 30, 41}
    # the changed docs' marks are STICKY: their indexed codes encode
    # the SUPERSEDED text, so a later fold's resurrection clear (which
    # correctly re-exposes a demoted doc's still-valid code) must not
    # re-expose these — only a republish removes them
    from dexscraper_spark.operators.quantize import ivf_pq_tombstone
    ivf_pq_tombstone(
        spark, idx, spark.createDataFrame([], "vec_id long"),
        clear_ids=spark.createDataFrame([(10,), (30,), (41,)],
                                        "vec_id long"))
    assert {r["vec_id"] for r in
            ivf_pq_tombstones(spark, idx).collect()} == {10, 30, 41}
    drops = {r["doc_id"]: r["text"] for r in
             spark.read.parquet(f"{out}/sem_dropped").collect()}
    assert drops[30] == _UP_NEW[30]           # NEW text, not stale

    # state rows: exactly one per id, content-hash current
    from dexscraper_spark.plans.pipeline_driver import (
        read_pipeline_state)
    cur, sem = read_pipeline_state(spark, out)
    per_id = {r["doc_id"]: r["n"] for r in
              cur.groupBy("doc_id").agg(F.count("*").alias("n"))
              .collect()}
    assert all(n == 1 for n in per_id.values())
    assert set(per_id) == {10, 20, 30, 40, 41, 50, 60}

    # rebuild on the updated corpus ≡ the upsert fold. The corpus
    # includes 61 (the slice's exact dup of 20): it left no trace
    # before the retained-loser store, but the store DOES keep it, so
    # the honest rebuild input carries it too.
    updated = dict(_UP_TEXTS)
    updated.update({k: v for k, v in _UP_NEW.items() if k != 60})
    updated[60] = _UP_NEW[60]
    updated[61] = _UP_TEXTS[20]
    pfull = str(tmp_path / "full_docs")
    _up_docs(spark, sorted(updated.items())).write.parquet(pfull)
    full = str(tmp_path / "full")
    assert run(["pipeline", "--docs", pfull, "--out", full,
                "--embeddings", pe2, *FLAGS], spark=spark) == 0
    _compare_outputs(spark, out, full)

    # identical re-crawl: content-aware batch id makes it a no-op
    assert run(["pipeline", "--delta", "--upsert", "--docs", pup,
                "--out", out, "--embeddings", pe2, "--index", idx,
                *FLAGS], spark=spark) == 0
    cap = capsys.readouterr()
    assert "already folded" in cap.err


def test_upsert_promotes_cluster_loser(spark, tmp_path, capsys):
    """The r11 scope boundary, closed by the retained-loser store: a
    changed doc that is the SURVIVOR of a multi-member simhash cluster
    is removed and the cluster's new min-id member is PROMOTED —
    published under its retained text with the deterministic split,
    entering the corpus and shards exactly as a rebuild on the updated
    corpus would publish it."""
    boot = _up_docs(spark, list(_UP_TEXTS.items()))
    pboot = str(tmp_path / "boot")
    boot.write.parquet(pboot)
    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out, *FLAGS],
               spark=spark) == 0
    capsys.readouterr()

    # 40 is {40,41}'s survivor; moving its content away frees 41,
    # whose text the bootstrap retained in dedup_dropped/
    pup = str(tmp_path / "up")
    _up_docs(spark, [(40, _UP_NEW[10])]).write.parquet(pup)
    assert run(["pipeline", "--delta", "--upsert", "--docs", pup,
                "--out", out, *FLAGS], spark=spark) == 0
    s = _summary(capsys)
    assert s["upsert_changed"] == 1
    assert s["upsert_promoted"] == 1
    corpus = {r["doc_id"]: r["text"]
              for r in spark.read.parquet(f"{out}/curated").collect()}
    assert corpus[41] == _UP_TEXTS[41]         # promoted, old text
    assert corpus[40] == _UP_NEW[10]
    # the promoted text left the loser store (it is published now)
    with pytest.raises(Exception):
        spark.read.parquet(f"{out}/dedup_dropped").count()

    updated = dict(_UP_TEXTS)
    updated[40] = _UP_NEW[10]
    pfull = str(tmp_path / "full_docs")
    _up_docs(spark, sorted(updated.items())).write.parquet(pfull)
    full = str(tmp_path / "full")
    assert run(["pipeline", "--docs", pfull, "--out", full, *FLAGS],
               spark=spark) == 0
    _compare_outputs(spark, out, full)


def test_upsert_promotes_exact_copy(spark, tmp_path, capsys):
    """Exact-dup losers have NO fingerprint-state row, so without the
    retained-loser store a changed keeper's copies would silently
    vanish from the rebuild-equivalence contract. With it: the
    smallest retained copy REPLACES the changed doc in the near-dup
    graph (identical text ⇒ identical fingerprint ⇒ identical
    connectivity), is promoted under the old text, and the remaining
    copies stay its exact losers."""
    A = _UP_TEXTS[20]
    boot = _up_docs(spark, [(20, A), (25, A), (27, A),
                            (50, _UP_TEXTS[50])])
    pboot = str(tmp_path / "boot")
    boot.write.parquet(pboot)
    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out, *FLAGS],
               spark=spark) == 0
    capsys.readouterr()

    pup = str(tmp_path / "up")
    _up_docs(spark, [(20, _UP_NEW[10])]).write.parquet(pup)
    assert run(["pipeline", "--delta", "--upsert", "--docs", pup,
                "--out", out, *FLAGS], spark=spark) == 0
    s = _summary(capsys)
    assert s["upsert_promoted"] == 1
    corpus = {r["doc_id"]: r["text"]
              for r in spark.read.parquet(f"{out}/curated").collect()}
    assert corpus[25] == A                     # copy re-surfaced
    assert corpus[20] == _UP_NEW[10]
    # 27 remains 25's exact loser in the store
    store = {r["doc_id"] for r in
             spark.read.parquet(f"{out}/dedup_dropped").collect()}
    assert store == {27}

    pfull = str(tmp_path / "full_docs")
    _up_docs(spark, [(20, _UP_NEW[10]), (25, A), (27, A),
                     (50, _UP_TEXTS[50])]).write.parquet(pfull)
    full = str(tmp_path / "full")
    assert run(["pipeline", "--docs", pfull, "--out", full, *FLAGS],
               spark=spark) == 0
    _compare_outputs(spark, out, full)


def test_upsert_bridge_split_promotes_far_side(spark, tmp_path,
                                               capsys):
    """A changed LOSER that was the connectivity BRIDGE of its cluster
    (A~B and B~C band-match, A~C does not — verified hammings 3/3/6):
    removing B splits the cluster; the half holding the published
    survivor stays, the far half's min member is promoted."""
    A = _UP_TEXTS[40]
    B = _UP_TEXTS[41]
    C = ("the quick golden fox jumps over the lazy drowsy near the "
         "old river stream tonight")
    boot = _up_docs(spark, [(40, A), (41, B), (42, C),
                            (50, _UP_TEXTS[50])])
    pboot = str(tmp_path / "boot")
    boot.write.parquet(pboot)
    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out, *FLAGS],
               spark=spark) == 0
    boot_s = _summary(capsys)
    assert boot_s["curated"] == 2              # {40,41,42} → 40; 50

    pup = str(tmp_path / "up")
    _up_docs(spark, [(41, _UP_NEW[10])]).write.parquet(pup)
    assert run(["pipeline", "--delta", "--upsert", "--docs", pup,
                "--out", out, *FLAGS], spark=spark) == 0
    s = _summary(capsys)
    assert s["upsert_promoted"] == 1
    assert s["corpus_removed"] == 0            # 41 was never published
    corpus = {r["doc_id"]: r["text"]
              for r in spark.read.parquet(f"{out}/curated").collect()}
    assert corpus[42] == C and corpus[40] == A
    assert corpus[41] == _UP_NEW[10]

    pfull = str(tmp_path / "full_docs")
    _up_docs(spark, [(40, A), (41, _UP_NEW[10]), (42, C),
                     (50, _UP_TEXTS[50])]).write.parquet(pfull)
    full = str(tmp_path / "full")
    assert run(["pipeline", "--docs", pfull, "--out", full, *FLAGS],
               spark=spark) == 0
    _compare_outputs(spark, out, full)


def test_upsert_rejoining_content_wins_back(spark, tmp_path, capsys):
    """A pending promotion is finalized only AFTER curate_delta: when
    the changed survivor's NEW text still near-matches its old cluster
    (verified hamming 2 to the loser's text), the re-entering content
    wins the merged cluster back (its id is the historical min), the
    pending label is merged under it, and NOTHING is promoted — the
    loser stays a loser, as the rebuild keeps it."""
    NEW40 = ("a quick golden fox jumps over the lazy drowsy near the "
             "old river stream today")
    boot = _up_docs(spark, [(40, _UP_TEXTS[40]), (41, _UP_TEXTS[41]),
                            (50, _UP_TEXTS[50])])
    pboot = str(tmp_path / "boot")
    boot.write.parquet(pboot)
    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out, *FLAGS],
               spark=spark) == 0
    capsys.readouterr()

    pup = str(tmp_path / "up")
    _up_docs(spark, [(40, NEW40)]).write.parquet(pup)
    assert run(["pipeline", "--delta", "--upsert", "--docs", pup,
                "--out", out, *FLAGS], spark=spark) == 0
    s = _summary(capsys)
    assert s["upsert_promoted"] == 0
    assert s["retracted"] == 1                 # pending 41, merged back
    corpus = {r["doc_id"]: r["text"]
              for r in spark.read.parquet(f"{out}/curated").collect()}
    assert corpus[40] == NEW40 and 41 not in corpus
    store = {r["doc_id"] for r in
             spark.read.parquet(f"{out}/dedup_dropped").collect()}
    assert store == {41}                       # still a loser

    pfull = str(tmp_path / "full_docs")
    _up_docs(spark, [(40, NEW40), (41, _UP_TEXTS[41]),
                     (50, _UP_TEXTS[50])]).write.parquet(pfull)
    full = str(tmp_path / "full")
    assert run(["pipeline", "--docs", pfull, "--out", full, *FLAGS],
               spark=spark) == 0
    _compare_outputs(spark, out, full)


def test_upsert_refuses_orphaning_removal_legacy(spark, tmp_path,
                                                 capsys):
    """Pre-store dirs keep the r11 scope boundary: without
    dedup_dropped/ the loser's text was never retained, so the fold
    refuses loudly BEFORE any side effect and the out dir is
    untouched."""
    boot = _up_docs(spark, list(_UP_TEXTS.items()))
    pboot = str(tmp_path / "boot")
    boot.write.parquet(pboot)
    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out, *FLAGS],
               spark=spark) == 0
    capsys.readouterr()
    # simulate a dir bootstrapped before the store existed
    fsio.delete(spark, fsio.join(out, "dedup_dropped"))

    pup = str(tmp_path / "up")
    _up_docs(spark, [(40, _UP_NEW[10])]).write.parquet(pup)
    assert run(["pipeline", "--delta", "--upsert", "--docs", pup,
                "--out", out, *FLAGS], spark=spark) == 2
    err = capsys.readouterr().err
    assert "--upsert cannot remove" in err and "41" in err
    # nothing happened: corpus intact, no state version published
    assert spark.read.parquet(f"{out}/curated").count() == 5
    assert fsio.pointer_read(
        spark, fsio.join(out, "state_versions")) is None


def test_upsert_exact_hash_inversion_refused(spark, tmp_path, capsys):
    """A fold doc whose new text equals a stored doc's with a LARGER
    id would displace that keeper in a rebuild — the incremental
    shortcut cannot express it, so the fold refuses loudly."""
    boot = _up_docs(spark, list(_UP_TEXTS.items()))
    pboot = str(tmp_path / "boot")
    boot.write.parquet(pboot)
    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out, *FLAGS],
               spark=spark) == 0
    capsys.readouterr()

    pup = str(tmp_path / "up")
    _up_docs(spark, [(10, _UP_TEXTS[50])]).write.parquet(pup)
    assert run(["pipeline", "--delta", "--upsert", "--docs", pup,
                "--out", out, *FLAGS], spark=spark) == 2
    assert "inversion" in capsys.readouterr().err


def test_upsert_all_unchanged_noop_and_full_mode_rejected(
        spark, tmp_path, capsys):
    """An all-unchanged re-crawl folds to a zero-change summary; the
    flag is refused outside --delta."""
    boot = _up_docs(spark, list(_UP_TEXTS.items()))
    pboot = str(tmp_path / "boot")
    boot.write.parquet(pboot)
    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out, *FLAGS],
               spark=spark) == 0
    capsys.readouterr()

    assert run(["pipeline", "--delta", "--upsert", "--docs", pboot,
                "--out", out, *FLAGS], spark=spark) == 0
    s = _summary(capsys)
    assert s["upsert_unchanged"] == len(_UP_TEXTS)
    assert s["upsert_changed"] == 0 and s["curated_new"] == 0
    assert s["corpus_removed"] == 0
    assert spark.read.parquet(f"{out}/curated").count() == 5

    assert run(["pipeline", "--docs", pboot, "--out",
                str(tmp_path / "o2"), "--upsert", *FLAGS],
               spark=spark) == 2
    assert "--upsert is a --delta mode" in capsys.readouterr().err


def test_upsert_small_id_wins_near_dup_cluster(spark, tmp_path,
                                               capsys):
    """The min-id math end-to-end: a changed doc's NEW text becomes a
    near-dup of a stored doc with a LARGER id — the rebuild keeps the
    smaller (changed) id and retracts the stored keeper, and the
    incremental fold reproduces exactly that through the ordinary
    relabel/retract path."""
    A = _UP_TEXTS[40]                          # doc 20's stored text
    Z = _UP_TEXTS[41]                          # near-dup of A
    boot = _up_docs(spark, [(10, _UP_TEXTS[10]), (20, A),
                            (30, _UP_TEXTS[30])])
    pboot = str(tmp_path / "boot")
    boot.write.parquet(pboot)
    out = str(tmp_path / "out")
    assert run(["pipeline", "--docs", pboot, "--out", out, *FLAGS],
               spark=spark) == 0
    capsys.readouterr()

    pup = str(tmp_path / "up")
    _up_docs(spark, [(10, Z)]).write.parquet(pup)
    assert run(["pipeline", "--delta", "--upsert", "--docs", pup,
                "--out", out, *FLAGS], spark=spark) == 0
    s = _summary(capsys)
    assert s["upsert_changed"] == 1
    assert s["retracted"] == 1                 # doc 20 lost to 10
    corpus = {r["doc_id"]: r["text"]
              for r in spark.read.parquet(f"{out}/curated").collect()}
    assert corpus[10] == Z and 20 not in corpus

    updated = _up_docs(spark, [(10, Z), (20, A), (30, _UP_TEXTS[30])])
    pfull = str(tmp_path / "full_docs")
    updated.write.parquet(pfull)
    full = str(tmp_path / "full")
    assert run(["pipeline", "--docs", pfull, "--out", full, *FLAGS],
               spark=spark) == 0
    _compare_outputs(spark, out, full)


@pytest.mark.parametrize("crash_at", [2, 3])
def test_delta_crash_between_merges_keeps_resurrection(
        spark, tmp_path, capsys, monkeypatch, crash_at):
    """The narrowest replay window: the sem_dropped merge REMOVES a
    resurrected doc's retained row, and only the later corpus merge
    re-publishes it — a crash in between (injected at merge call 2 =
    the dedup_dropped fold, and 3 = the corpus merge) used to leave a
    replay unable to recover the text from any live table. add_docs
    is frozen batch-scoped at first computation, so the rerun
    converges to an uninterrupted twin's outputs."""
    import dexscraper_spark.plans.curation as curation_mod

    A = ("the quick golden fox jumps over the lazy drowsy near the "
         "old river lake today")
    B = ("the quick golden fox hops over the lazy sleepy near the "
         "old river stream today")
    Z = ("the quick golden fox jumps over the lazy drowsy near the "
         "old river stream today")
    X = ("a completely different report about the harvest festival "
         "and the songs we sang together")
    rows = [(10, A), (20, B), (25, X), (30, _UP_TEXTS[50])]
    pboot, pz = str(tmp_path / "boot"), str(tmp_path / "z")
    _up_docs(spark, rows).write.parquet(pboot)
    _up_docs(spark, [(100, Z)]).write.parquet(pz)
    ids = [r[0] for r in rows] + [100]
    axis = {i: j for j, i in enumerate(ids)}
    axis[25] = axis[20]                  # 25 = semantic dup of 20
    pe = str(tmp_path / "emb")
    _up_emb(spark, axis).write.parquet(pe)

    crash, clean = str(tmp_path / "crash"), str(tmp_path / "clean")
    for out in (crash, clean):
        assert run(["pipeline", "--docs", pboot, "--out", out,
                    "--embeddings", pe, *FLAGS], spark=spark) == 0
    capsys.readouterr()

    real = curation_mod.merge_partitioned
    calls = {"n": 0}

    def boom(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= crash_at:
            raise RuntimeError("injected crash")
        return real(*a, **kw)

    monkeypatch.setattr(curation_mod, "merge_partitioned", boom)
    with pytest.raises(RuntimeError, match="injected"):
        run(["pipeline", "--delta", "--docs", pz, "--out", crash,
             "--embeddings", pe, *FLAGS], spark=spark)
    monkeypatch.setattr(curation_mod, "merge_partitioned", real)

    # mutations began → the lease survived the failure; replay with
    # the documented --break-lease
    assert run(["pipeline", "--delta", "--break-lease", "--docs", pz,
                "--out", crash, "--embeddings", pe, *FLAGS],
               spark=spark) == 0
    s = _summary(capsys)
    assert s["resurrected"] == 1
    assert run(["pipeline", "--delta", "--docs", pz, "--out", clean,
                "--embeddings", pe, *FLAGS], spark=spark) == 0
    # the resurrected doc's text survived the window
    cor = {r["doc_id"]: r["text"] for r in
           spark.read.parquet(f"{crash}/curated").collect()}
    assert cor[25] == X
    _compare_outputs(spark, crash, clean)


def test_layered_write_span_backstop_under_relabel_storm(
        spark, tmp_path):
    """Relabel-heavy folds consume the whole trickle budget on buckets
    that are already fresh; without the backstop the quiet buckets'
    owner lists (and versions_referenced, GC retention, read fan-in)
    grow without bound. Any bucket referencing beyond the MAX-version
    window is force-compacted regardless of budget — and no fold ever
    rewrites the full store."""
    from dexscraper_spark.plans.pipeline_driver import (
        _layered_write, _read_layered, _STATE_MAX_VERSIONS)

    B = 16
    root = str(tmp_path / "sv")

    def mk(lo, hi):
        return (spark.range(lo, hi).toDF("doc_id")
                .withColumn("exact_h", F.xxhash64("doc_id"))
                .withColumn("simhash", F.xxhash64("doc_id"))
                .withColumn("component", F.col("doc_id")))

    n = 1600
    layout, _ = _layered_write(
        spark, root, "v_000000", "curation", full_df=mk(0, n),
        appended_df=mk(0, n), changed_ids=None, prev_layout=None,
        default_buckets=B)
    # storm: every fold relabels the SAME few ids, whose buckets cover
    # ≥ the trickle budget (ceil(16/5)=4) — pick ids spanning 4+
    # buckets deterministically by probing the hash
    ids = spark.range(0, 200).toDF("doc_id").withColumn(
        "b", F.pmod(F.xxhash64("doc_id"), F.lit(B)).cast("int"))
    storm = [r["doc_id"] for r in ids.dropDuplicates(["b"])
             .limit(5).collect()]
    spans, rewrites = [], []
    for i in range(1, 13):
        v = f"v_{i:06d}"
        app = mk(n, n + 10)
        full = mk(0, n + 10)
        changed = spark.createDataFrame(
            [(int(x),) for x in storm], "doc_id long")
        layout, stats = _layered_write(
            spark, root, v, "curation", full_df=full,
            appended_df=app, changed_ids=changed, prev_layout=layout,
            default_buckets=None)
        n += 10
        spans.append(stats["versions_referenced"])
        rewrites.append(stats["buckets_rewritten"])
    assert max(spans) <= _STATE_MAX_VERSIONS + 1
    assert all(r < B for r in rewrites)       # never the full store
    assert _read_layered(spark, root, layout, "curation").count() == n
