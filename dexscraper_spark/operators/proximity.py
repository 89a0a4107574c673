"""Proximity (range / nearest / as-of) joins (SURVEY §2.4 J1-J4).

Reference parity: ``_enrich_token_profile`` (dexscraper/scraper.py:345-450)
attaches every metadata entity within |Δposition| <= 1000 of a token (J1),
picks the nearest candidate per token with per-kind distance gates (J2:
protocol <= 220, age <= 180), and assigns address roles in distance order
(J3, scraper.py:369-394).

Scale design — the band-join trick (SURVEY §7.4 risk 5): a naive range join
is O(n·m). We bucket both sides into width-``radius`` bins and equi-join on
(key, bin) with the probe side exploded to {bin-1, bin, bin+1}; every true
|Δ| <= radius pair lands in exactly one shared bin, then an exact filter
refines. Catalyst executes the bin join as a hash shuffle join — linear
shuffle volume, no cross product, AQE-skew-splittable. The 3× explode is on
the (usually smaller) right side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def band_range_join(left: DataFrame, right: DataFrame, *,
                    left_pos: str, right_pos: str, radius: float,
                    keys: list[str] | None = None) -> DataFrame:
    """J1: all (left, right) pairs with |left_pos - right_pos| <= radius,
    optionally also matching equi ``keys`` (same name on both sides).

    Apart from ``keys``, the two sides must have disjoint column names;
    output carries left columns + right non-key columns.
    """
    keys = keys or []
    width = float(radius)
    lb = left.withColumn("__lbin", F.floor(F.col(left_pos) / width))
    rbin = F.floor(F.col(right_pos) / width)
    rb = right.withColumn("__rbin", F.explode(F.array(rbin - 1, rbin, rbin + 1)))
    for k in keys:
        rb = rb.withColumnRenamed(k, f"__rk_{k}")
    cond = F.col("__lbin") == F.col("__rbin")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__rk_{k}"))
    return (
        lb.join(rb, cond)
        .drop("__lbin", "__rbin", *[f"__rk_{k}" for k in keys])
        .filter(F.abs(F.col(left_pos) - F.col(right_pos)) <= F.lit(width))
    )


def nearest_join(left: DataFrame, right: DataFrame, *,
                 left_key: str, left_pos: str, right_pos: str,
                 radius: float, keys: list[str] | None = None,
                 tiebreak: str | None = None) -> DataFrame:
    """J2: for each left row, the single nearest right row within radius.

    Deterministic total order: (|Δ|, right_pos, tiebreak) — the reference's
    arrival-order pick made reproducible (SURVEY §7.4 risk 1).
    """
    joined = band_range_join(left, right, left_pos=left_pos,
                             right_pos=right_pos, radius=radius, keys=keys)
    dist = F.abs(F.col(left_pos) - F.col(right_pos))
    order = [dist.asc(), F.col(right_pos).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(left_key).orderBy(*order)
    return (
        joined.withColumn("distance", dist)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def assign_roles(joined: DataFrame, *, left_key: str, left_pos: str,
                 right_pos: str, value_col: str, type_col: str,
                 quote_type: str = "SOL_token",
                 roles: tuple[str, ...] = ("token_address", "pair_address",
                                           "creator_address")) -> DataFrame:
    """J3: rank candidate addresses per token by (distance, pos, value) and
    pivot rank 1..n onto role columns; rows of ``quote_type`` map to
    ``quote_address`` instead (scraper.py:369-394), deduplicated by value.

    One shuffle AND one pass TOTAL: the explicit repartition on
    ``left_key`` below is the only exchange — every downstream clustering
    requirement (the (key, value) dedup window, the key rank window, and
    the single groupBy) is satisfied by hash(left_key), since rows equal
    on (key, value) are co-located whenever rows equal on key are.
    Without it Catalyst inserts a fresh exchange per step (~5 shuffles of
    the same rows). Role pivot and quote pick are CONDITIONAL aggregates
    of one groupBy rather than two filtered branches full-outer-joined
    back together: the branch form re-evaluates the whole upstream
    subtree per branch (a second decode + band join at scale — Catalyst
    does not share subtrees) and re-shuffles the join output, for three
    exchanges and two subtree copies where one of each suffices. The
    quote rank sorts non-quote rows first (flag 0 < 1) so non-quote rows
    keep ranks 1..m exactly as the filtered ranking produced; rows whose
    ``type_col`` is NULL are dropped by the ``is_quote.isNotNull()``
    filter before ranking/grouping — the same rows the old
    ``~is_quote`` / ``is_quote`` filter pair dropped — so keys with
    ONLY null-type rows never reach the groupBy, keeping the old
    full-outer key set. ``min_by``
    ignores rows whose ordering expression is NULL (probed + pinned by
    test), so the when-wrapped ordering restricts it to quote rows. No
    iterative driver logic; deterministic refinement of the reference's
    first-wins mutation order (SURVEY §7.4 risk 1).
    """
    joined = joined.repartition(F.col(left_key))
    dist = F.abs(F.col(left_pos) - F.col(right_pos))
    dedup_w = Window.partitionBy(left_key, value_col).orderBy(
        dist.asc(), F.col(right_pos).asc())
    uniq = (joined.withColumn("__dup", F.row_number().over(dedup_w))
            .filter(F.col("__dup") == 1).drop("__dup"))
    is_quote = F.col(type_col) == quote_type
    # 0 = role candidate, 1 = quote, NULL type → dropped (matches the
    # former filter pair, where NULL failed both ~is_quote and is_quote)
    flag = F.when(is_quote, 1).otherwise(0)
    uniq = uniq.filter(is_quote.isNotNull()).withColumn("__q", flag)
    rank_w = Window.partitionBy(left_key).orderBy(
        F.col("__q").asc(), dist.asc(), F.col(right_pos).asc(),
        F.col(value_col).asc())
    ranked = uniq.withColumn("__rn", F.row_number().over(rank_w))
    role_cols = [
        F.max(F.when((F.col("__q") == 0) & (F.col("__rn") == i + 1),
                     F.col(value_col))).alias(role)
        for i, role in enumerate(roles)
    ]
    quote_col = F.min_by(
        F.when(F.col("__q") == 1, F.col(value_col)),
        F.when(F.col("__q") == 1, F.struct(dist, F.col(right_pos)))
    ).alias("quote_address")
    return ranked.groupBy(left_key).agg(*role_cols, quote_col)
