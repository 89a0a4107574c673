"""Quality classifier — GPT-3/WebText-style document filtering
(Brown et al. 2020 App. A; Radford et al. 2019 — public methods): a
logistic regression over HASHED word n-gram features, trained on a
bounded positive/negative sample, scoring the whole corpus with one
explode + one equi-join (the fasttext-shaped linear model, Spark-first).

Scale shape:
* **Training** is driver-side over a deterministic hash-ordered bounded
  sample (the ``pq_train`` discipline) — corpus-size independent, no
  MLlib fit whose k-means||-style init would make the model depend on
  partition layout.
* **Scoring** is the ``lm_score`` shape: normalize words map-side, hash
  each 1/2-gram into ``2**bits`` buckets (feature identity = bucket id,
  the hashing trick — Weinberger et al. 2009), ONE explode + ONE
  equi-join against the weight table (≤ 2**bits rows, broadcastable),
  one partial-agg'd groupBy sum, sigmoid. No UDFs in the scoring path.
* **Filtering** reproduces the GPT-3 Pareto rule deterministically:
  keep a doc iff ``prob > 1 - pareto_noise`` where the noise derives
  from ``xxhash64(id, seed)`` — layout-independent, reproducible, and
  it keeps a long tail of lower-quality docs instead of a hard cut
  (the published rationale for the rule).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dexscraper_spark.operators.bpe import norm_words, word_ngrams


@dataclass(frozen=True)
class QcModel:
    """(weights, bias, bits): weights is a (bucket int, weight double)
    DataFrame with only NON-ZERO entries; bucket = pmod(xxhash64(gram),
    2**bits)."""
    weights: DataFrame
    bias: float
    bits: int


def _buckets(text_col: str, bits: int) -> Column:
    """Array of feature buckets for a doc: hashed word 1- and 2-grams.
    The word array is bound to a lambda variable so the normalize
    chain evaluates once per row (the repetition_ratio lesson)."""
    n_buckets = 1 << bits

    def feats(w: Column) -> Column:
        grams = F.concat(word_ngrams(w, 1), word_ngrams(w, 2))
        return F.transform(
            grams, lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets))
            .cast("int"))

    return F.transform(F.array(norm_words(text_col)), feats)[0]


def _featurize_sample(rows: list):
    """Driver-side COO featurization of collected bucket arrays —
    training reuses the SPARK-side featurization (the sample is
    collected WITH its buckets), so there is no Python re-tokenization
    to drift from the JVM path. Returns (row_idx, col_idx, val) with
    per-doc L2-normalized values (doc length must not dominate the
    decision). SPARSE by construction: a dense samples × 2**bits
    matrix is gigabytes at bits=18 and makes the GD loop thrash."""
    import numpy as np

    rs, cs, vs = [], [], []
    for i, buckets in enumerate(rows):
        cnt: dict = {}
        for b in buckets:
            cnt[b] = cnt.get(b, 0) + 1
        nrm = float(np.sqrt(sum(c * c for c in cnt.values())))
        for b, c in cnt.items():
            rs.append(i)
            cs.append(b)
            vs.append(c / nrm)
    return (np.asarray(rs, dtype=np.int64),
            np.asarray(cs, dtype=np.int64),
            np.asarray(vs, dtype=np.float64))


def qc_train(positive: DataFrame, negative: DataFrame, *,
             text_col: str = "text", bits: int = 18,
             sample_n: int = 10_000, iters: int = 300,
             lr: float = 2.0, l2: float = 1e-4,
             seed: int = 42) -> QcModel:
    """Fit the classifier on ≤ ``sample_n`` docs PER CLASS, drawn in
    deterministic hash order (layout-independent — same model on any
    partitioning). Full-batch gradient descent with L2, fixed
    iteration count, all-numpy: bit-reproducible given the same
    sample. Returns only the non-zero weight rows."""
    import numpy as np

    spark = positive.sparkSession

    def sample_of(df):
        return [r["b"] for r in
                (df.select(_buckets(text_col, bits).alias("b"))
                 .filter(F.size("b") > 0)
                 .orderBy(F.xxhash64(F.col("b").cast("array<int>")
                                     .cast("string"), F.lit(seed)))
                 .limit(sample_n).collect())]

    pos, neg = sample_of(positive), sample_of(negative)
    if not pos or not neg:
        raise ValueError(
            f"qc_train: empty class sample (pos={len(pos)}, "
            f"neg={len(neg)}) — both classes need non-empty docs")
    rows, cols, vals = _featurize_sample(pos + neg)
    n = len(pos) + len(neg)
    d = 1 << bits
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    # full-batch GD over the COO triplets via bincount (the C fast
    # path): z = X w, grad = Xᵀ(p − y) — O(nnz) per iteration, never a
    # dense n × 2**bits matrix
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        z = np.bincount(rows, weights=vals * w[cols], minlength=n) + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        gw = np.bincount(cols, weights=vals * g[rows], minlength=d)
        w -= lr * (gw / n + l2 * w)
        b -= lr * float(g.mean())
    nz = np.flatnonzero(w)
    weights = spark.createDataFrame(
        [(int(i), float(w[i])) for i in nz],
        "bucket int, weight double")
    return QcModel(weights=weights, bias=float(b), bits=bits)


def qc_score(docs: DataFrame, model: QcModel, *,
             id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, logit, prob) per doc. One explode + one equi-join against
    the (broadcast) weight table + one partial-agg'd sum — docs whose
    features all miss the weight table (or empty docs) score the bias
    alone, exactly as the trained model would."""
    feats = (docs
             .select(F.col(id_col), F.explode_outer(
                 _buckets(text_col, model.bits)).alias("bucket"))
             # the L2 normalization used in training needs the doc's
             # feature-count vector norm; counts per (doc, bucket):
             .groupBy(id_col, "bucket")
             .agg(F.count(F.lit(1)).alias("cnt")))
    per_doc = (feats
               .join(broadcast(model.weights), "bucket", "left")
               .groupBy(id_col)
               .agg(F.sum(F.col("cnt")
                          * F.coalesce(F.col("weight"), F.lit(0.0)))
                    .alias("__dot"),
                    F.sqrt(F.sum(F.col("cnt") * F.col("cnt")))
                    .alias("__nrm")))
    # explode_outer guarantees one per_doc row per input doc (empty/
    # NULL docs contribute a NULL-bucket row), so no rejoin against
    # docs is needed — that would re-scan the corpus purely to
    # re-attach rows already all present here
    logit = (F.when(F.col("__nrm") > 0,
                    F.col("__dot") / F.col("__nrm"))
             .otherwise(F.lit(0.0)) + F.lit(model.bias))
    return (per_doc
            .select(F.col(id_col), logit.alias("logit"))
            .withColumn("prob", F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-F.col("logit")))))


def qc_filter(docs: DataFrame, model: QcModel, *,
              id_col: str = "doc_id", text_col: str = "text",
              alpha: float = 9.0, seed: int = 42) -> DataFrame:
    """The GPT-3 Pareto keep rule (Brown et al. 2020 App. A, public):
    keep a document iff ``prob > 1 - x`` with ``x ~ Pareto(alpha)``
    (their α=9) — high-quality docs almost always survive, and a thin
    deterministic tail of low-scoring docs is retained so the corpus
    is not homogenized to the classifier's taste. Noise derives from
    ``xxhash64(id, seed)`` via the inverse CDF (x = u^(-1/α) − 1):
    reproducible and layout-independent. Returns the surviving docs
    with ``prob``."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    # decide on the (id, prob) score frame FIRST — the Pareto rule
    # needs only id + prob — then one equi-join attaches the surviving
    # ids back to the full rows: docs is scanned once for features and
    # once here, and the join carries survivors only
    h53 = F.shiftrightunsigned(
        F.xxhash64(F.col(id_col), F.lit(seed)), 11)
    u = (h53.cast("double") + F.lit(1.0)) / F.lit(float((1 << 53) + 2))
    pareto = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    kept = (qc_score(docs, model, id_col=id_col, text_col=text_col)
            .filter(F.col("prob") > F.lit(1.0) - pareto)
            .select(id_col, "prob"))
    return docs.join(kept, id_col)


def qc_save(spark, model: QcModel, path: str) -> None:
    """Persist the classifier: one parquet of the non-zero weight rows
    plus ONE meta row (bucket = −1, weight = 0) carrying the scalar
    (bias, bits) — the pq_save layout discipline (single directory,
    no sidecar files). The meta row, not per-row meta columns, is what
    makes a valid-but-degenerate ALL-ZERO-weights model representable:
    with meta only on weight rows, an empty-weights model would save
    as a zero-row parquet and lose bias/bits entirely."""
    meta = spark.createDataFrame([(-1, 0.0)], "bucket int, weight double")
    (model.weights.unionByName(meta)
     .withColumn("bias", F.lit(model.bias))
     .withColumn("bits", F.lit(model.bits))
     .write.mode("overwrite").parquet(path))


def qc_load(spark, path: str) -> QcModel:
    """Load and VALIDATE a stored classifier: bits/bias must be
    consistent across rows, exactly one meta row present, and buckets
    in range — a partially written or mixed-generation directory would
    otherwise score silently wrong."""
    df = spark.read.parquet(path)
    meta = df.select("bias", "bits").distinct().collect()
    if len(meta) != 1:
        raise ValueError(
            f"classifier at {path} has {len(meta)} distinct "
            "(bias, bits) pairs — mixed or partial write")
    bias, bits = float(meta[0]["bias"]), int(meta[0]["bits"])
    if df.filter(F.col("bucket") == -1).count() != 1:
        raise ValueError(
            f"classifier at {path} lacks exactly one meta row — "
            "partial write or pre-meta-format store")
    # range check BOTH bounds on the raw rows: silently dropping a
    # bucket < -1 row would load a corrupt store as a smaller model
    n_bad = df.filter((F.col("bucket") < -1)
                      | (F.col("bucket") >= (1 << bits))).count()
    if n_bad:
        raise ValueError(
            f"classifier at {path}: {n_bad} rows outside "
            f"{{-1}} ∪ [0, 2**{bits}) — wrong bits or corrupt store")
    weights = df.filter(F.col("bucket") >= 0)
    return QcModel(weights=weights.select("bucket", "weight"),
                   bias=bias, bits=bits)
