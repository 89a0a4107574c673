"""Skew mitigation (SURVEY §4 scale notes): salting for hot keys.

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); these helpers
cover the two patterns AQE can't fix:

* ``salted_agg`` — a hot *aggregation* key: one reducer owns the whole key.
  Two-phase: groupBy(key, salt) partial → groupBy(key) final. Works for any
  algebraic aggregate (sum/count/min/max — pass the merge form).
* ``salted_broadcast_left`` — a hot *join* key against a dim too large to
  broadcast: replicate the dim side per salt so the fact side spreads the
  hot key over ``n_salts`` reducers.

Salt = deterministic hash of a tiebreak column mod n (NOT rand() — rand
breaks retries/exactly-once: a re-run task would re-salt differently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, *, n_salts: int, salt_source: str,
              salt_col: str = "__salt") -> DataFrame:
    # xxhash64(NULL) is a CONSTANT (the seed), so a null-heavy
    # salt_source would put every NULL row on one salt — exactly the
    # hot-partition this operator exists to break. Mix in
    # monotonically_increasing_id for NULLs only: the salt value has no
    # semantic meaning (aggregation re-merges across salts), it only
    # spreads placement, so the non-deterministic id is safe here.
    h = F.when(F.col(salt_source).isNotNull(), F.xxhash64(F.col(salt_source))) \
         .otherwise(F.xxhash64(F.monotonically_increasing_id()))
    return df.withColumn(salt_col, F.pmod(h, F.lit(n_salts)).cast("int"))


def salted_agg(df: DataFrame, *, keys: list[str], n_salts: int,
               salt_source: str, partial_aggs: list[Column],
               final_aggs: list[Column]) -> DataFrame:
    """Two-phase aggregation over (keys, salt) then keys.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` merge partials per
    key (e.g. partial ``sum(x) as s`` → final ``sum(s) as s``). The hot
    key's rows land on ``n_salts`` reducers instead of one.
    """
    salted = with_salt(df, n_salts=n_salts, salt_source=salt_source)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_left(fact: DataFrame, dim: DataFrame, *, key: str,
                          n_salts: int, salt_source: str) -> DataFrame:
    """fact ⋈ dim on ``key`` with the fact side salted and the dim side
    exploded across all salts — the hot key spreads over n_salts tasks.
    Output columns: fact columns + dim non-key columns.
    """
    salted_fact = with_salt(fact, n_salts=n_salts, salt_source=salt_source)
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return salted_fact.join(dim_rep, [key, "__salt"]).drop("__salt")


def skew_report(df: DataFrame, *, keys: list[str], k: int = 32,
                threshold: float = 2.0) -> DataFrame:
    """Pre-flight skew diagnosis for a planned groupBy/join key:
    (item, cnt, share, skewed) — the top-k key values by (lower-bound)
    frequency via the mergeable Misra-Gries sketch, each flagged when
    its share of rows exceeds ``threshold``× the fair 1/k share. ONE
    bounded-shuffle pass (O(partitions × k) rows — never a full exact
    groupBy over a possibly-skewed key, which is itself the skewed job
    this report exists to avoid). Feed flagged keys to salted_agg /
    salted_broadcast_left, or trust AQE for joins.

    cnt is the MG lower bound (within n/(k+1) of truth), so shares are
    conservative: a key flagged here is REALLY hot; a borderline key
    under n/(k+1) can hide.

    The total comes from the SAME scan as the sketch (the local MG pass
    emits per-partition row counts; only the O(partitions × k)-row
    partials frame is persisted) — a separate ``df.count()`` would
    recompute the possibly-expensive upstream plan a second time."""
    from dexscraper_spark.operators.sketch import mg_sketch_and_total

    summary, total = mg_sketch_and_total(df, cols=keys, k=k)
    fair = max(total / k, 1.0)
    return (summary
            .withColumn("share", F.col("cnt") / F.lit(float(total)))
            .withColumn("skewed",
                        F.col("cnt") > F.lit(float(threshold)) * fair)
            .orderBy(F.col("cnt").desc()))
