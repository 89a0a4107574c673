"""update_training_shards / merge_partitioned — the append/retract twin
of write_training_shards (VERDICT r9 §next-1: the shard-maintenance leg
of `pipeline --delta`). The invariant under test everywhere: after any
sequence of folds, (table rows, manifest) are IDENTICAL to a one-shot
write_training_shards of the final corpus."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _docs(spark, ids, tok=10):
    return spark.createDataFrame(
        [(i, f"text {i}", tok + i % 3) for i in ids],
        "doc_id long, text string, n_tokens long")


def _write(spark, df, path, n_shards=8):
    from dexscraper_spark.plans.curation import write_training_shards
    return write_training_shards(df, path, n_shards=n_shards,
                                 id_col="doc_id")


def _rows(spark, path):
    return sorted(map(tuple, spark.read.parquet(path)
                      .select("doc_id", "text", "n_tokens", "shard")
                      .collect()))


def _manifest(path):
    with open(f"{path}/_manifest.json") as f:
        return json.load(f)


def test_update_equals_one_shot_rewrite(spark, tmp_path):
    from dexscraper_spark.plans.curation import update_training_shards

    p = str(tmp_path / "shards")
    _write(spark, _docs(spark, range(40)), p)

    add = _docs(spark, range(100, 112))
    rm = spark.createDataFrame([(3,), (17,), (25,)], "doc_id long")
    m = update_training_shards(spark, p, add=add, remove_ids=rm)

    q = str(tmp_path / "oneshot")
    final = _docs(spark, [i for i in range(40) if i not in (3, 17, 25)]
                  + list(range(100, 112)))
    m2 = _write(spark, final, q)
    assert _rows(spark, p) == _rows(spark, q)
    assert m == m2 == _manifest(p)


def test_update_replay_is_idempotent(spark, tmp_path):
    """A crash between the partition merge and the manifest write is
    repaired by RERUNNING the same delta: rows keyed by the add set are
    dropped before re-adding, removals are no-ops, counts converge."""
    from dexscraper_spark.plans.curation import update_training_shards

    p = str(tmp_path / "shards")
    _write(spark, _docs(spark, range(30)), p)
    add = _docs(spark, range(200, 206))
    rm = spark.createDataFrame([(7,)], "doc_id long")
    m1 = update_training_shards(spark, p, add=add, remove_ids=rm)
    r1 = _rows(spark, p)
    m2 = update_training_shards(spark, p, add=add, remove_ids=rm)
    assert _rows(spark, p) == r1
    assert m1 == m2


def test_update_deletes_emptied_shard_and_zeroes_manifest(spark,
                                                          tmp_path):
    import os

    from dexscraper_spark.plans.curation import update_training_shards

    p = str(tmp_path / "shards")
    _write(spark, _docs(spark, range(12)), p, n_shards=4)
    # remove EVERYTHING: every shard empties; manifest must read zeros
    # and no shard directory may survive to confuse a dir-listing reader
    rm = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    m = update_training_shards(spark, p, remove_ids=rm)
    assert m["total_docs"] == 0
    assert all(s["n_docs"] == 0 for s in m["shards"].values())
    assert not [d for d in os.listdir(p) if d.startswith("shard=")]


def test_update_untouched_shards_keep_their_files(spark, tmp_path):
    """The point of the merge path: a delta rewrites ONLY affected
    shards — unaffected shard files are bit-identical afterwards."""
    import glob
    import os

    from dexscraper_spark.plans.curation import update_training_shards

    p = str(tmp_path / "shards")
    _write(spark, _docs(spark, range(60)), p, n_shards=16)
    before = {f: os.stat(f).st_mtime_ns
              for f in glob.glob(f"{p}/shard=*/*.parquet")}
    add = _docs(spark, [500])           # lands in exactly one shard
    update_training_shards(spark, p, add=add)
    after = {f: os.stat(f).st_mtime_ns
             for f in glob.glob(f"{p}/shard=*/*.parquet")}
    untouched = [f for f in before if f in after
                 and before[f] == after[f]]
    # at least 14 of 16 shards must be untouched (the add hits one)
    assert len(untouched) >= 14


def test_update_rejects_precomputed_shard_column(spark, tmp_path):
    import pytest

    from dexscraper_spark.plans.curation import update_training_shards

    p = str(tmp_path / "shards")
    _write(spark, _docs(spark, range(8)), p, n_shards=4)
    bad = _docs(spark, [100]).withColumn("shard", F.lit(0))
    with pytest.raises(ValueError, match="derived"):
        update_training_shards(spark, p, add=bad)
