"""fsio — the object-store-safe control-plane I/O helper (VERDICT r8
§next-1).

Two path classes, same contract:
* local paths → pure-Python fast path (works with spark=None);
* any other scheme → the JVM Hadoop FileSystem for the session's conf.

The Hadoop branch is exercised for real with a NON-``file:`` scheme:
Hadoop's built-in ``viewfs://`` filesystem with a mount-table link into
the test tmpdir, so every fsio call resolves through
``Path.getFileSystem`` + the Hadoop client API exactly as it would for
``s3a:``/``abfss:`` (a bare scheme swap like registering
RawLocalFileSystem under a fake scheme fails Hadoop's own checkPath —
"Wrong FS" — so viewfs is the honest in-process option), while the
bytes land in a local tmpdir we can independently verify. The same
scheme then drives the three consumers end-to-end: the versioned
streaming fold store, the z-order compaction swap, and the
training-shard manifest.
"""

from __future__ import annotations

import json
import os

import pytest

from dexscraper_spark import fsio


@pytest.fixture()
def mockfs(spark, tmp_path):
    """Mount ``viewfs://<unique-cluster>/store`` onto tmp_path and
    return a path factory. The cluster name is unique per test:
    FileSystem instances are CACHED by (scheme, authority), so a reused
    name would serve a stale mount table from an earlier test."""
    cluster = "t" + tmp_path.name.replace("_", "").replace("-", "").lower()
    spark._jsc.hadoopConfiguration().set(
        f"fs.viewfs.mounttable.{cluster}.link./store", tmp_path.as_uri())

    def at(*names: str) -> str:
        return fsio.join(f"viewfs://{cluster}/store", *names)

    return at


# ---------------------------------------------------------------- local

def test_local_roundtrip_no_spark(tmp_path):
    """The local fast path needs no SparkSession at all."""
    p = str(tmp_path / "store")
    assert not fsio.exists(None, p)
    fsio.mkdirs(None, p)
    assert fsio.is_dir(None, p)
    fsio.write_text_atomic(None, fsio.join(p, "spec.json"), '{"k": 3}')
    assert json.loads(fsio.read_text(None, p + "/spec.json")) == {"k": 3}
    assert fsio.list_names(None, p) == ["spec.json"]
    # overwrite is atomic-replace, not append
    fsio.write_text_atomic(None, p + "/spec.json", '{"k": 4}')
    assert json.loads(fsio.read_text(None, p + "/spec.json")) == {"k": 4}
    assert not os.path.exists(p + "/spec.json.tmp")  # tmp cleaned up
    fsio.rename(None, p + "/spec.json", p + "/spec2.json")
    assert fsio.list_names(None, p) == ["spec2.json"]
    fsio.write_text_atomic(None, p + "/other", "x")
    with pytest.raises(FileExistsError):
        fsio.rename(None, p + "/other", p + "/spec2.json")
    fsio.delete(None, p)
    assert not fsio.exists(None, p)
    fsio.delete(None, p)  # absent: silent no-op
    assert fsio.list_names(None, p) == []


def test_local_file_uri_maps_to_os_path(tmp_path):
    p = f"file://{tmp_path}/x.json"
    fsio.write_text_atomic(None, p, "hi")
    assert (tmp_path / "x.json").read_text() == "hi"
    assert fsio.read_text(None, p) == "hi"


def test_nonlocal_path_without_spark_fails_loudly():
    with pytest.raises(ValueError, match="SparkSession"):
        fsio.read_text(None, "s3a://bucket/key.json")


# --------------------------------------------------- hadoop (mockfs://)

def test_mockfs_text_roundtrip_and_listing(spark, mockfs, tmp_path):
    root = mockfs("ctrl")
    assert not fsio.exists(spark, root)
    fsio.mkdirs(spark, root)
    assert fsio.is_dir(spark, root)
    doc = {"alpha": 0.01, "cols": ["a", "b"]}
    fsio.write_text_atomic(spark, fsio.join(root, "_spec.json"),
                           json.dumps(doc))
    # the bytes really landed on disk (independent local verification)
    assert json.loads(
        (tmp_path / "ctrl" / "_spec.json").read_text()) == doc
    assert json.loads(
        fsio.read_text(spark, fsio.join(root, "_spec.json"))) == doc
    assert fsio.list_names(spark, root) == ["_spec.json"]
    # atomic overwrite through the Hadoop branch too
    fsio.write_text_atomic(spark, fsio.join(root, "_spec.json"), "{}")
    assert fsio.read_text(spark, fsio.join(root, "_spec.json")) == "{}"
    fsio.rename(spark, fsio.join(root, "_spec.json"),
                fsio.join(root, "spec_old.json"))
    assert fsio.list_names(spark, root) == ["spec_old.json"]
    fsio.write_text_atomic(spark, fsio.join(root, "x"), "x")
    with pytest.raises(FileExistsError):
        fsio.rename(spark, fsio.join(root, "x"),
                    fsio.join(root, "spec_old.json"))
    fsio.delete(spark, root)
    assert not fsio.exists(spark, root)
    fsio.delete(spark, root)  # absent: no-op
    assert fsio.list_names(spark, root) == []


def test_mockfs_unicode_text(spark, mockfs):
    p = mockfs("u.txt")
    fsio.write_text_atomic(spark, p, "héllo — κόσμε ✓")
    assert fsio.read_text(spark, p) == "héllo — κόσμε ✓"
    fsio.delete(spark, p)


def test_rename_across_filesystems_rejected(spark, mockfs, tmp_path):
    p = mockfs("a.txt")
    fsio.write_text_atomic(spark, p, "x")
    with pytest.raises(ValueError, match="across filesystems"):
        fsio.rename(spark, p, str(tmp_path / "b.txt"))
    fsio.delete(spark, p)


# ------------------------------------------- consumers on a mockfs root

def test_versioned_fold_store_on_mockfs(spark, mockfs, tmp_path):
    """The streaming versioned store works end-to-end on a non-file
    scheme: spec write+validate, _SUCCESS-gated version listing,
    retention deletes — plus Spark's own parquet writes to the same
    URI."""
    from dexscraper_spark.streaming.pipeline import (
        _list_bar_versions, latest_versioned_state,
        versioned_fold_builder)

    root = mockfs("folds")
    fold = versioned_fold_builder(
        root,
        init=lambda b: b.groupBy().sum("v").toDF("s"),
        update=lambda prev, b: prev.unionByName(
            b.groupBy().sum("v").toDF("s")).groupBy().sum("s").toDF("s"),
        keep_versions=2, name="t", spec={"k": 1})
    fold(spark.range(3).selectExpr("id as v"), 0)   # s = 3
    fold(spark.range(5).selectExpr("id as v"), 1)   # s = 3 + 10
    assert _list_bar_versions(root, spark) == [0, 1]
    assert latest_versioned_state(spark, root).collect()[0][0] == 13
    fold(spark.range(2).selectExpr("id as v"), 2)   # retention drops v0
    assert _list_bar_versions(root, spark) == [1, 2]
    # spec mismatch still fails loudly through the Hadoop read path
    bad = versioned_fold_builder(root, init=lambda b: b,
                                 update=lambda p, b: p, name="t",
                                 spec={"k": 2})
    with pytest.raises(RuntimeError, match="spec"):
        bad(spark.range(1).selectExpr("id as v"), 3)


def test_compact_zordered_on_mockfs(spark, mockfs, tmp_path):
    """The 2-rename compaction swap runs against the Hadoop client."""
    from dexscraper_spark.sinks.lake import (
        compact_zordered, write_zordered)

    df = spark.range(500).selectExpr(
        "cast(id as double) a", "cast(pmod(id * 37, 500) as double) b")
    path = mockfs("ztab")
    write_zordered(df, path, cols=["a", "b"], n_files=4)
    before = spark.read.parquet(path)
    n, s = before.count(), before.selectExpr("sum(a)").first()[0]
    compact_zordered(spark, path, n_files=2)
    after = spark.read.parquet(path)
    assert after.count() == n
    assert after.selectExpr("sum(a)").first()[0] == s
    # swap hygiene: no leftover __old/__compacting siblings
    assert not fsio.exists(spark, path + "__old")
    assert not fsio.exists(spark, path + "__compacting")


def test_training_shard_manifest_on_mockfs(spark, mockfs, tmp_path):
    from dexscraper_spark.plans.curation import write_training_shards

    docs = spark.range(200).selectExpr(
        "id as doc_id", "concat('t', id) as text",
        "cast(id % 7 + 3 as long) as n_tokens")
    path = mockfs("shards")
    man = write_training_shards(docs, path, n_shards=4)
    assert man["total_docs"] == 200
    on_disk = json.loads(
        (tmp_path / "shards" / "_manifest.json").read_text())
    assert on_disk == json.loads(json.dumps(man))  # int-key normalize
    assert sorted(on_disk["shards"]) == ["0", "1", "2", "3"]
