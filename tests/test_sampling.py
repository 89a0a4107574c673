"""Deterministic sampling: layout independence, exact stratified counts,
hash-order correctness vs a Python reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from dexscraper_spark.operators.sampling import (
    sample_deterministic, stratified_sample_exact)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "lang", "source")


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_sample_deterministic_layout_independent(spark):
    docs = _docs(spark)
    a = _ids(sample_deterministic(docs, 0.3, key_col="doc_id"))
    b = _ids(sample_deterministic(docs.repartition(17), 0.3,
                                  key_col="doc_id"))
    assert a == b and 0 < len(a) < docs.count()
    # rate sanity: binomial(n, .3) within 5 sigma
    n = docs.count()
    assert abs(len(a) - 0.3 * n) < 5 * (n * 0.3 * 0.7) ** 0.5
    # different seeds give different (reproducible) subsets
    c = _ids(sample_deterministic(docs, 0.3, key_col="doc_id", seed=7))
    assert c != a
    # fraction bounds
    assert _ids(sample_deterministic(docs, 1.0, key_col="doc_id")) \
        == _ids(docs)
    assert sample_deterministic(docs, 0.0, key_col="doc_id").count() == 0


def test_sample_deterministic_is_prefix_nested(spark):
    """A smaller fraction's sample is a subset of a larger one (same
    seed): the hash order defines one global priority, so fractions
    nest — the property that makes reproducible scaling-law subsets."""
    docs = _docs(spark)
    small = set(_ids(sample_deterministic(docs, 0.1, key_col="doc_id")))
    big = set(_ids(sample_deterministic(docs, 0.4, key_col="doc_id")))
    assert small <= big


def test_stratified_exact_counts_and_reference_order(spark):
    """Exactly n per stratum (whole stratum when smaller), and the
    chosen rows are precisely the n smallest by the hash order —
    verified against a Python reference over all rows."""
    import pyspark.sql.functions as F2

    docs = _docs(spark)
    n = 7
    out = stratified_sample_exact(
        docs, strata_cols=["lang"], n_per_stratum=n, key_col="doc_id")
    got = {}
    for r in out.collect():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    hashes = {(r["lang"], r["doc_id"]): r["h"] for r in
              docs.select("lang", "doc_id",
                          F2.xxhash64("doc_id", F2.lit(42))
                          .bitwiseXOR(F2.lit(-(1 << 63))).alias("h"))
              .collect()}
    by_lang = {}
    for (lang, did), hv in hashes.items():
        by_lang.setdefault(lang, []).append((hv, did))
    for lang, pairs in by_lang.items():
        want = {d for _, d in sorted(pairs)[:n]}
        assert got.get(lang, set()) == want


def test_stratified_layout_independent_and_small_strata(spark):
    docs = _docs(spark)
    a = sorted(tuple(r) for r in stratified_sample_exact(
        docs, strata_cols=["lang"], n_per_stratum=5,
        key_col="doc_id").collect())
    b = sorted(tuple(r) for r in stratified_sample_exact(
        docs.repartition(13), strata_cols=["lang"], n_per_stratum=5,
        key_col="doc_id").collect())
    assert a == b
    # n larger than every stratum: the sample IS the table
    big = stratified_sample_exact(
        docs, strata_cols=["lang"], n_per_stratum=10 ** 6,
        key_col="doc_id")
    assert big.count() == docs.count()


def test_stratified_schema_passthrough(spark):
    docs = _docs(spark)
    out = stratified_sample_exact(
        docs, strata_cols=["lang", "source"], n_per_stratum=2,
        key_col="doc_id")
    assert set(out.columns) == {"doc_id", "lang", "source"}
    per = out.groupBy("lang", "source").count().collect()
    assert all(r["count"] <= 2 for r in per)


def test_stratified_null_stratum_is_sampled(spark):
    """Regression (r7 review): a NULL stratum is a legitimate group —
    the candidate join must be null-safe, or NULL-keyed rows silently
    vanish and the retry loop dies on a phantom shortfall."""
    docs = _docs(spark).withColumn(
        "lang", F.when(F.col("doc_id") % 4 == 0, None)
        .otherwise(F.col("lang")))
    n_null = docs.filter(F.col("lang").isNull()).count()
    assert n_null > 3
    out = stratified_sample_exact(
        docs, strata_cols=["lang"], n_per_stratum=3, key_col="doc_id")
    assert out.filter(F.col("lang").isNull()).count() == 3
    # and the picked NULL-stratum rows are the hash-order smallest
    got = {r["doc_id"] for r in
           out.filter(F.col("lang").isNull()).collect()}
    ref = sorted(
        (r["h"], r["doc_id"]) for r in
        docs.filter(F.col("lang").isNull())
        .select("doc_id", F.xxhash64("doc_id", F.lit(42))
                .bitwiseXOR(F.lit(-(1 << 63))).alias("h")).collect())
    assert got == {d for _, d in ref[:3]}
