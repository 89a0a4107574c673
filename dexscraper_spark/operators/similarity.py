"""Similarity search over embedding columns (BASELINE.json north star).

Brute-force cosine top-k is the correctness baseline; the scale path is
LSH bucketing (random-hyperplane signs) so candidate generation is an
equi-join instead of a cross product.

Everything is JVM-side array arithmetic (``zip_with`` + ``aggregate``)
— no Python in the hot path. The dot-product fold is sequential
left-to-right, which makes the result deterministic for a given pair
regardless of parallelism (the fold runs inside one row).

Scale notes:
* brute force: queries × corpus is a broadcast nested-loop — keep the
  query side tiny (broadcast) and the corpus streaming; per-partition
  top-k heaps via TakeOrderedAndProject when a global k is wanted, or a
  per-query window rank for k-per-query.
* LSH: ``num_planes``-bit signature per vector; candidates share a
  signature prefix band. Hyperplanes are derived deterministically from
  xxhash64 so executors need no broadcast state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


DEFAULT_DIM = 64


def _dot(a, b, dim: int = DEFAULT_DIM):
    """Dot product as a sequential left fold over ``zip_with``.

    Measured note: an unrolled 64-term Add chain looks codegen-friendly
    but is ~3x SLOWER here — Janino bails on the giant expressions and the
    per-pair norm recomputation loses to the fold's compact loop. The fold
    is also order-identical to DuckDB's ``list_sum`` (bit-exact oracles).
    ``dim`` is accepted for API symmetry; the fold handles any length.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(a, dim: int = DEFAULT_DIM):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(corpus: DataFrame, queries: DataFrame, *, id_col: str = "vec_id",
                vec_col: str = "embedding", k: int = 10,
                round_to: int | None = 6, dim: int = DEFAULT_DIM) -> DataFrame:
    """Brute-force top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank), rank 1..k per query,
    self-matches excluded. Deterministic ordering: (cosine desc,
    neighbor_id asc). ``dim`` must match the embedding length (the dot
    product is unrolled at plan-build time).
    """
    q = broadcast(queries.select(F.col(id_col).alias("query_id"),
                                 F.col(vec_col).alias("__qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"))
    cos = _dot(F.col("__qv"), F.col("__cv"), dim) / (
        _norm(F.col("__qv"), dim) * _norm(F.col("__cv"), dim))
    if round_to is not None:
        p = float(10 ** round_to)
        cos = F.floor(cos * p + F.lit(0.5)) / p
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_signature(vec_col, *, num_planes: int = 16, dim: int = 64):
    """Random-hyperplane signature: bit p = sign(v · h_p) where
    h_p[i] = (xxhash64(p*dim + i) mod 2001 - 1000)/1000 — a deterministic
    pseudo-random plane, reproducible on every executor with no broadcast.
    """
    v = vec_col if not isinstance(vec_col, str) else F.col(vec_col)
    col_name = vec_col if isinstance(vec_col, str) else "embedding"
    return F.expr(
        f"aggregate(sequence(0, {num_planes - 1}), cast(0 as bigint), (acc, p) -> "
        f"acc + shiftleft(cast(aggregate(sequence(0, {dim - 1}), cast(0.0 as double), "
        f"(s, i) -> s + cast(element_at({col_name}, i + 1) as double) * "
        f"(cast(pmod(xxhash64(p * {dim} + i), 2001) as double) - 1000.0) / 1000.0) > 0.0 "
        f"as bigint), p))"
    )


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, *,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      k: int = 10, num_planes: int = 12,
                      dim: int = 64) -> DataFrame:
    """ANN: candidates = same LSH signature bucket, then exact cosine rank
    within bucket. Recall < 1 by design; bucket join is linear shuffle.
    """
    sig = lsh_signature(vec_col, num_planes=num_planes, dim=dim)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"), sig.alias("__sig"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv"), sig.alias("__sig"))
    cos = _dot(F.col("__qv"), F.col("__cv"), dim) / (
        _norm(F.col("__qv"), dim) * _norm(F.col("__cv"), dim))
    scored = (
        q.join(c, "__sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the other scale path from the north star.
# Coarse quantizer = MLlib KMeans (deterministic seed); each vector is
# assigned to its nearest centroid's list; a query probes only the
# ``nprobe`` nearest lists, then ranks candidates by exact cosine.
#
# Build/query are SPLIT: the KMeans fit + corpus-wide assignment happen
# once (``ivf_build``, optionally persisted to disk partitioned by list id
# so probes prune partitions), and ``ivf_query`` only probes — the index
# must never be refit in the query path.
#
# Scale shape: centroid assignment is one KMeans transform (JVM); the
# probe join is an equi-join on list id — candidates ≈ corpus·nprobe/nlist
# instead of the full corpus. The centroid table is tiny and broadcast;
# with an on-disk index, partition pruning means a probe reads only
# nprobe/nlist of the corpus bytes.
# ---------------------------------------------------------------------------


class IvfIndex:
    """A built IVF index: per-vector list assignment + centroid table.

    ``assigned``: (id_col, vec_col, __list) — cached or disk-backed.
    ``centroids``: (list_id, centroid array<double>) — tiny, broadcast at
    query time.
    """

    def __init__(self, assigned: DataFrame, centroids: DataFrame, *,
                 id_col: str, vec_col: str, nlist: int):
        self.assigned = assigned
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col
        self.nlist = nlist

    def unpersist(self):
        self.assigned.unpersist()


def ivf_build(corpus: DataFrame, *, id_col: str = "vec_id",
              vec_col: str = "embedding", nlist: int = 16,
              seed: int = 42, cache: bool = True) -> IvfIndex:
    """Fit the coarse quantizer once and assign every vector to a list.

    ``cache=True`` persists the assignment (memory+disk) so repeated
    queries never recompute the KMeans transform.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.withColumn(
        "__vec", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=nlist, seed=seed, featuresCol="__vec",
                   predictionCol="__list").fit(feats)
    assigned = model.transform(feats).drop("__vec") \
        .select(id_col, vec_col, "__list")
    if cache:
        assigned = assigned.persist()
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "list_id int, centroid array<double>")
    return IvfIndex(assigned, centroids, id_col=id_col, vec_col=vec_col,
                    nlist=nlist)


def ivf_save(index: IvfIndex, path: str) -> None:
    """Persist the index: assignment parquet partitioned by list id (probe
    joins prune to nprobe/nlist of the files), centroid table alongside."""
    index.assigned.write.mode("overwrite") \
        .partitionBy("__list").parquet(f"{path}/assigned")
    index.centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_load(spark, path: str, *, id_col: str = "vec_id",
             vec_col: str = "embedding") -> IvfIndex:
    assigned = spark.read.parquet(f"{path}/assigned")
    centroids = spark.read.parquet(f"{path}/centroids")
    nlist = centroids.count()
    return IvfIndex(assigned, centroids, id_col=id_col, vec_col=vec_col,
                    nlist=nlist)


def ivf_query(index: IvfIndex, queries: DataFrame, *, k: int = 10,
              nprobe: int = 4, round_to: int | None = 6) -> DataFrame:
    """Probe the nprobe nearest lists per query, exact-rank candidates.
    Recall < 1 by design (bounded by nprobe/nlist). No model fit here —
    only the equi-join on list id against the prebuilt index."""
    q = queries.select(F.col(index.id_col).alias("query_id"),
                       F.col(index.vec_col).alias("__qv"))
    # rank centroids per query by cosine, keep nprobe lists
    c_cos = _dot(F.col("__qv"), F.col("centroid")) / (
        _norm(F.col("__qv")) * _norm(F.col("centroid")))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__ccos").desc(), F.col("list_id").asc())
    probes = (
        q.crossJoin(broadcast(index.centroids))
        .withColumn("__ccos", c_cos)
        .withColumn("__pr", F.row_number().over(w_probe))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "__qv", F.col("list_id").alias("__list"))
    )
    cand = probes.join(
        index.assigned.select(F.col(index.id_col).alias("neighbor_id"),
                              F.col(index.vec_col).alias("__cv"), "__list"),
        "__list")
    cos = _dot(F.col("__qv"), F.col("__cv")) / (
        _norm(F.col("__qv")) * _norm(F.col("__cv")))
    if round_to is not None:
        p = float(10 ** round_to)
        cos = F.floor(cos * p + F.lit(0.5)) / p
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        cand.filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, *, id_col: str = "vec_id",
             vec_col: str = "embedding", k: int = 10, nlist: int = 16,
             nprobe: int = 4, seed: int = 42,
             round_to: int | None = 6) -> DataFrame:
    """One-shot convenience: build (uncached) + query. For any repeated
    use, call ``ivf_build`` once and ``ivf_query`` per query instead."""
    index = ivf_build(corpus, id_col=id_col, vec_col=vec_col, nlist=nlist,
                      seed=seed, cache=False)
    return ivf_query(index, queries, k=k, nprobe=nprobe, round_to=round_to)
