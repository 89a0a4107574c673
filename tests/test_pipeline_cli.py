"""One-command `pipeline` subcommand (VERDICT r8 §next-5): the full
training-data chain — decontaminate → quality classifier → curate →
semantic dedup → sliding-window split → pack → training shards — from
one flags/JSON config, pinned ROW-FOR-ROW against the hand-composed
stage-by-stage run of the same operators."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dexscraper_spark.cli import run


# r13 (VERDICT #6): multi-second delta/maintenance integration lane — the
# full-suite wall time (52 min measured) no longer fits the driver's
# verify budget, and this module is the dominant cost. The default lane
# (`-m "not slow"`, pyproject addopts) keeps every oracle-coverage and
# unit test; run `make test-all` for the complete suite.
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


def _frames_equal(a, b, cols):
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pipeline_matches_stage_by_stage_composition(spark, tmp_path,
                                                     capsys):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    [probe] = docs.orderBy("doc_id").limit(1).collect()
    spark.createDataFrame([(0, probe.text)],
                          "doc_id long, text string") \
        .write.parquet(str(tmp_path / "eval"))

    out = str(tmp_path / "run")
    rc = run(["pipeline", "--docs", f"{SF}/documents.parquet",
              "--out", out,
              "--eval-docs", str(tmp_path / "eval"),
              "--embeddings", f"{SF}/embeddings.parquet",
              "--semantic-threshold", "0.4", "--assign-n", "2",
              "--min-quality", "0.3", "--min-tokens", "3",
              "--split-max-tokens", "64", "--max-tokens", "256",
              "--train-shards", "4"], spark=spark)
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # ---- hand-compose the same stages with the library operators ----
    from dexscraper_spark.operators.decontaminate import decontaminate
    from dexscraper_spark.operators.dedup import semantic_dedup
    from dexscraper_spark.operators.packing import (chunk_token_stream,
                                                    split_documents)
    from dexscraper_spark.plans.curation import (CurationConfig,
                                                 curate_corpus)

    clean, removed = decontaminate(
        docs, spark.read.parquet(str(tmp_path / "eval")))
    cfg = CurationConfig(min_quality=0.3, min_tokens=3)
    curated = curate_corpus(clean, config=cfg)
    emb_cur = (spark.read.parquet(f"{SF}/embeddings.parquet")
               .withColumnRenamed("vec_id", "doc_id")
               .select("doc_id", "embedding")
               .join(curated.select("doc_id"), "doc_id", "left_semi"))
    kept_emb = semantic_dedup(emb_cur, id_col="doc_id", nlist=16,
                              threshold=0.4, assign_n=2)
    dropped = emb_cur.select("doc_id").join(
        kept_emb.select("doc_id"), "doc_id", "left_anti")
    curated = curated.join(dropped, "doc_id", "left_anti")
    pieces = (split_documents(curated, max_tokens=64)
              .join(curated.select("doc_id", "split", "lang"), "doc_id")
              .select("doc_id", "window_id",
                      F.col("window_text").alias("text"),
                      F.col("n_window_tokens").alias("n_tokens"),
                      "split", "lang")
              .withColumn("piece_id",
                          (F.col("doc_id") * F.lit(1 << 20)
                           + F.col("window_id")).cast("long")))
    # packing runs PER SPLIT (a shared stream would let a chunk span
    # train and test pieces — eval leakage)
    parts = []
    for sp in ("train", "valid", "test"):
        parts.append(chunk_token_stream(
            pieces.filter(F.col("split") == sp)
            .select("piece_id", "n_tokens"),
            id_col="piece_id", max_tokens=256).withColumn(
                "split", F.lit(sp)))
    packed = parts[0].unionByName(parts[1]).unionByName(parts[2])

    # ---- row-for-row: every written artifact equals the composition --
    _frames_equal(spark.read.parquet(f"{out}/contaminated"), removed,
                  ["doc_id"])
    _frames_equal(spark.read.parquet(f"{out}/curated"), curated,
                  ["doc_id", "text", "lang", "quality", "n_tokens",
                   "split"])
    shards = spark.read.parquet(f"{out}/shards")
    _frames_equal(shards, pieces,
                  ["piece_id", "doc_id", "window_id", "text",
                   "n_tokens", "split", "lang"])
    _frames_equal(spark.read.parquet(f"{out}/packed"), packed,
                  ["piece_id", "chunk_id", "tok_start", "tok_end",
                   "split"])
    # no packed unit mixes splits (the leakage guard, asserted directly:
    # every packed row's split matches its piece's split)
    pk = spark.read.parquet(f"{out}/packed")
    sh = spark.read.parquet(f"{out}/shards").select(
        "piece_id", F.col("split").alias("psplit"))
    mixed = pk.join(sh, "piece_id").filter(
        F.col("split") != F.col("psplit")).count()
    assert mixed == 0

    # ---- summary + manifest consistency ----
    n_pieces = pieces.count()
    assert summary["contaminated"] == removed.count() >= 1
    assert summary["curated"] == curated.count()
    assert summary["semantic_dropped"] == dropped.count() > 0
    assert summary["pieces"] == n_pieces
    assert summary["pack_units"] == packed.select("split", "chunk_id") \
        .distinct().count()
    man = json.loads((tmp_path / "run" / "shards" / "_manifest.json")
                     .read_text())
    assert man["total_docs"] == n_pieces
    assert man["total_tokens"] == summary["total_tokens"]
    assert json.loads((tmp_path / "run" / "_run_summary.json")
                      .read_text()) == summary
    # the state store supports later nightly deltas (wide enough schema)
    st = spark.read.parquet(f"{out}/state")
    assert {"doc_id", "exact_h", "simhash", "component"} \
        <= set(st.columns)


def test_pipeline_quality_stage_and_bins_mode(spark, tmp_path, capsys):
    """--quality-model drops what qc_filter drops (exact composition),
    and --mode bins packs whole pieces."""
    from tests.conftest import junk_docs

    from dexscraper_spark.operators.classifier import (qc_filter,
                                                       qc_save, qc_train)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    model = qc_train(docs.filter(F.col("doc_id") < 300),
                     junk_docs(spark, n=300), bits=14, sample_n=200,
                     iters=60)
    qc_save(spark, model, str(tmp_path / "qcm"))

    out = str(tmp_path / "run")
    rc = run(["pipeline", "--docs", f"{SF}/documents.parquet",
              "--out", out, "--quality-model", str(tmp_path / "qcm"),
              "--quality-alpha", "2.0",
              "--min-quality", "0.3", "--min-tokens", "3",
              "--split-max-tokens", "0", "--mode", "bins",
              "--max-tokens", "512", "--train-shards", "2"],
             spark=spark)
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from dexscraper_spark.plans.curation import (CurationConfig,
                                                 curate_corpus)
    kept = qc_filter(docs, model, alpha=2.0).drop("prob")
    assert summary["quality_dropped"] == docs.count() - kept.count()
    curated = curate_corpus(kept, config=CurationConfig(
        min_quality=0.3, min_tokens=3))
    assert summary["curated"] == curated.count()
    # split disabled: pieces are whole docs, window_id 0
    shards = spark.read.parquet(f"{out}/shards")
    assert summary["pieces"] == curated.count() == shards.count()
    assert shards.select(F.max("window_id")).first()[0] == 0
    packed = spark.read.parquet(f"{out}/packed")
    assert {"bin_id", "oversize", "split"} <= set(packed.columns)
    assert summary["pack_units"] == packed.select("split", "bin_id") \
        .distinct().count()


def test_pipeline_config_file_and_flag_precedence(spark, tmp_path,
                                                  capsys):
    conf = {"min_quality": 0.3, "min_tokens": 3, "train_shards": 2,
            "split_max_tokens": 0, "max_tokens": 512}
    (tmp_path / "run.json").write_text(json.dumps(conf))
    out = str(tmp_path / "run")
    rc = run(["pipeline", "--docs", f"{SF}/documents.parquet",
              "--out", out, "--config", str(tmp_path / "run.json"),
              "--train-shards", "3"],   # explicit flag beats config
             spark=spark)
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["shards"] == 3
    man = json.loads((tmp_path / "run" / "shards" / "_manifest.json")
                     .read_text())
    assert man["n_shards"] == 3
    # config values that were NOT overridden took effect (split off)
    assert summary["pieces"] == summary["curated"]

    # an explicit flag set to its DEFAULT value still beats the config
    # (precedence is detected from argv, not value comparison)
    (tmp_path / "run2.json").write_text(json.dumps(
        {**conf, "train_shards": 2}))
    rc = run(["pipeline", "--docs", f"{SF}/documents.parquet",
              "--out", str(tmp_path / "run2"),
              "--config", str(tmp_path / "run2.json"),
              "--train-shards", "16"],   # 16 == parser default
             spark=spark)
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["shards"] == 16


def test_pipeline_dsir_selection_stage(spark, tmp_path, capsys):
    """--target-docs + --n inserts DSIR importance resampling between
    the cleaning stages and curation; pinned against the hand-composed
    select-then-curate chain."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.filter(F.col("lang") == "fr").select("doc_id", "text")
    target.write.parquet(str(tmp_path / "target"))

    out = str(tmp_path / "run")
    rc = run(["pipeline", "--docs", f"{SF}/documents.parquet",
              "--out", out, "--target-docs", str(tmp_path / "target"),
              "--n", "120", "--lm-order", "2", "--seed", "7",
              "--min-quality", "0.3", "--min-tokens", "3",
              "--split-max-tokens", "0", "--train-shards", "2"],
             spark=spark)
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["selected"] == 120

    from dexscraper_spark.operators.lm import lm_train
    from dexscraper_spark.operators.sampling import importance_resample
    from dexscraper_spark.plans.curation import (CurationConfig,
                                                 curate_corpus)
    target_lm = lm_train(target.select("text"), n=2)
    raw_lm = lm_train(docs.select("text"), n=2)
    picked = importance_resample(docs, target_lm, raw_lm, n=120,
                                 lm_order=2, seed=7).drop("logw")
    curated = curate_corpus(picked, config=CurationConfig(
        min_quality=0.3, min_tokens=3))
    assert summary["curated"] == curated.count()
    _frames_equal(spark.read.parquet(f"{out}/curated"), curated,
                  ["doc_id", "text", "lang", "quality", "n_tokens",
                   "split"])
    # --target-docs without --n fails the arg contract
    assert run(["pipeline", "--docs", f"{SF}/documents.parquet",
                "--out", str(tmp_path / "x"),
                "--target-docs", str(tmp_path / "target")],
               spark=spark) == 2
    capsys.readouterr()


def test_pipeline_rerun_is_deterministic(spark, tmp_path, capsys):
    """The nightly contract: rerunning the same pipeline config yields
    byte-identical logical outputs (shards, manifest, summary)."""
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        rc = run(["pipeline", "--docs", f"{SF}/documents.parquet",
                  "--out", out, "--min-quality", "0.3",
                  "--min-tokens", "3", "--split-max-tokens", "64",
                  "--train-shards", "4"], spark=spark)
        assert rc == 0
        outs.append((
            json.loads(capsys.readouterr().out.strip().splitlines()[-1]),
            json.loads((tmp_path / name / "shards" / "_manifest.json")
                       .read_text())))
    assert outs[0] == outs[1]
    a = spark.read.parquet(str(tmp_path / "a" / "shards"))
    b = spark.read.parquet(str(tmp_path / "b" / "shards"))
    cols = ["piece_id", "text", "n_tokens", "split", "lang", "shard"]
    assert a.select(*cols).exceptAll(b.select(*cols)).count() == 0
    assert b.select(*cols).exceptAll(a.select(*cols)).count() == 0


def test_pipeline_rejects_non_integral_doc_id(spark, tmp_path, capsys):
    """The composite piece id needs an integral doc_id — the contract
    fails EARLY with a clear message, not four stages in."""
    spark.createDataFrame(
        [("a1", "some perfectly fine document text here")],
        "doc_id string, text string") \
        .write.parquet(str(tmp_path / "strdocs"))
    rc = run(["pipeline", "--docs", str(tmp_path / "strdocs"),
              "--out", str(tmp_path / "x")], spark=spark)
    assert rc == 2
    assert "integral doc_id" in capsys.readouterr().err


def test_pipeline_arg_validation(spark, tmp_path, capsys):
    assert run(["pipeline", "--out", str(tmp_path / "x")],
               spark=spark) == 2
    assert run(["pipeline", "--docs", f"{SF}/documents.parquet"],
               spark=spark) == 2
    assert run(["pipeline", "--docs", f"{SF}/documents.parquet",
                "--out", str(tmp_path / "x"), "--mode", "query"],
               spark=spark) == 2
    (tmp_path / "bad.json").write_text('{"no_such_flag": 1}')
    assert run(["pipeline", "--docs", f"{SF}/documents.parquet",
                "--out", str(tmp_path / "x"),
                "--config", str(tmp_path / "bad.json")], spark=spark) == 2
    (tmp_path / "list.json").write_text("[1]")
    assert run(["pipeline", "--docs", f"{SF}/documents.parquet",
                "--out", str(tmp_path / "x"),
                "--config", str(tmp_path / "list.json")],
               spark=spark) == 2
    capsys.readouterr()
