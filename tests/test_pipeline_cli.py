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
    packed = chunk_token_stream(pieces.select("piece_id", "n_tokens"),
                                id_col="piece_id", max_tokens=256)

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
                  ["piece_id", "chunk_id", "tok_start", "tok_end"])

    # ---- summary + manifest consistency ----
    n_pieces = pieces.count()
    assert summary["contaminated"] == removed.count() >= 1
    assert summary["curated"] == curated.count()
    assert summary["semantic_dropped"] == dropped.count() > 0
    assert summary["pieces"] == n_pieces
    assert summary["pack_units"] == packed.select("chunk_id") \
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
    assert {"bin_id", "oversize"} <= set(packed.columns)
    assert summary["pack_units"] == packed.select("bin_id") \
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
