"""KMV distinct-count sketch: exactness below k, estimator accuracy,
exact merge associativity, partition independence, grouped sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from dexscraper_spark.operators.sketch import kmv_estimate, kmv_merge, kmv_sketch


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 100).select(F.col("id").cast("string").alias("v"))
    [row] = kmv_sketch(df, cols=["v"], k=256).collect()
    assert row.distinct_est == 100.0
    assert len(row.sketch) == 100


def test_kmv_estimate_accuracy(spark):
    n = 20_000
    df = spark.range(0, n * 3).select(
        (F.col("id") % n).cast("string").alias("v"))  # 3 copies each
    [row] = kmv_sketch(df, cols=["v"], k=256).collect()
    # RSE ≈ 1/sqrt(k-2) ≈ 6.3%; deterministic hashes → fixed estimate.
    assert abs(row.distinct_est - n) / n < 0.2
    assert len(row.sketch) == 256


def test_kmv_merge_equals_sketch_of_union(spark):
    a = spark.range(0, 5000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2500, 9000).select(F.col("id").cast("string").alias("v"))
    k = 128
    [sa] = kmv_sketch(a, cols=["v"], k=k).collect()
    [sb] = kmv_sketch(b, cols=["v"], k=k).collect()
    [su] = kmv_sketch(a.unionAll(b), cols=["v"], k=k).collect()
    merged_df = spark.createDataFrame(
        [(sa.sketch, sb.sketch)], "s1 array<double>, s2 array<double>")
    [m] = merged_df.select(
        kmv_merge(F.col("s1"), F.col("s2"), k=k).alias("m")).collect()
    assert m.m == su.sketch  # merge is EXACTLY the union's sketch
    [est] = merged_df.select(
        kmv_estimate(kmv_merge(F.col("s1"), F.col("s2"), k=k), k=k)
        .alias("e")).collect()
    assert abs(est.e - 9000) / 9000 < 0.25


def test_kmv_partition_independence(spark):
    df = spark.range(0, 8000).select((F.col("id") % 3000).cast("string").alias("v"))
    [s1] = kmv_sketch(df.repartition(2), cols=["v"], k=64).collect()
    [s2] = kmv_sketch(df.repartition(13), cols=["v"], k=64).collect()
    assert s1.sketch == s2.sketch and s1.distinct_est == s2.distinct_est


def test_kmv_grouped(spark):
    df = spark.range(0, 6000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.when(F.col("id") % 2 == 0, (F.col("id") % 50))
         .otherwise(F.col("id")).cast("string").alias("v"))
    rows = {r.g: r for r in kmv_sketch(
        df, cols=["v"], group_by=["g"], k=256).collect()}
    assert rows["0"].distinct_est == 25.0        # 50 values, evens only → 25
    assert abs(rows["1"].distinct_est - 3000) / 3000 < 0.2


def test_kmv_merge_null_input_is_empty(spark):
    df = spark.createDataFrame(
        [([0.1, 0.2], None)], "s1 array<double>, s2 array<double>")
    [row] = df.select(kmv_merge(F.col("s1"), F.col("s2"), k=4).alias("m"),
                      kmv_estimate(kmv_merge(F.col("s1"), F.col("s2"), k=4),
                                   k=4).alias("e")).collect()
    assert row.m == [0.1, 0.2] and row.e == 2.0


def test_local_sketch_one_partial_per_group_across_batches():
    """The mapInPandas generator must accumulate across Arrow batches and
    emit ONE partial per group per partition — per-batch emission makes
    shuffle volume scale with row count."""
    import pandas as pd
    from dexscraper_spark.operators.sketch import _local_sketch_fn
    fn = _local_sketch_fn(["g"], k=8)
    batches = [
        pd.DataFrame({"g": ["a", "a", "b"], "__u": [0.3, 0.1, 0.5]}),
        pd.DataFrame({"g": ["a", "b"], "__u": [0.2, 0.4]}),
        pd.DataFrame({"g": ["a"], "__u": [0.1]}),      # dup fraction
    ]
    out = list(fn(iter(batches)))
    assert len(out) == 1                       # one yield per partition
    rows = {d["g"]: d["__partial"] for d in out[0].to_dict("records")}
    assert rows == {"a": [0.1, 0.2, 0.3], "b": [0.4, 0.5]}
