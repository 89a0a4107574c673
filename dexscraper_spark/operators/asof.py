"""As-of (point-in-time) join — the time-series companion to the proximity
family (SURVEY §2.4 J1-J4).

Reference parity: the reference keeps only the *latest* snapshot per pair in
its in-process state (``scraper.py`` token-profile upserts keyed by pair
address) and answers "what was the state when X happened" by whatever the
dict held at that moment. This operator is the distributed, reproducible
form of that lookup: for every left row, the most recent right row at or
before its timestamp, per key.

Spark-first design — NO join node at all. A range-band join (proximity.py)
needs a radius; an as-of lookback is unbounded, so banding can't cap the
candidate set. Instead we use the union-window idiom:

    1. tag both sides and union them on (keys, time) — left rows carry NULL
       right-payload;
    2. one spillable sort per key: Window.partitionBy(keys).orderBy(time,
       side) with ``last(payload, ignorenulls=True)`` over the unbounded
       preceding frame — each left row picks up the latest right payload
       seen so far;
    3. keep the left rows, optionally enforce a tolerance on the matched
       right time.

Scale shape: ONE shuffle of |left| + |right| rows on the keys, one external
(spillable) sort per partition, zero candidate blow-up — the same cost
profile as sessionize, and strictly better than any join-based formulation
(there is no candidate pair set to materialize at all). Skewed keys split
under AQE like any other shuffle; the window frame itself is streaming
(running ``last``), so per-row state is O(payload), not O(history).

Ordering semantics: at equal timestamps the right row sorts FIRST (side
tag 0 < 1), so a tick at exactly t is visible to a left event at t —
matching the reference's "state already upserted when the event fires".
Among equal-time right rows the greater ``tiebreak`` wins deterministically
(SURVEY §7.4 risk 1: arrival-order mutation made reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_T = "__asof_t"
_TB = "__asof_tb"
_RT = "__asof_rtime"


def asof_join(left: DataFrame, right: DataFrame, *,
              keys: list[str], left_time: str, right_time: str,
              payload: list[str] | None = None,
              tolerance: float | int | None = None,
              direction: str = "backward",
              tiebreak: str | None = None,
              matched_time_col: str | None = None) -> DataFrame:
    """For each left row, attach the nearest right row's ``payload`` columns
    at-or-before (``backward``) / at-or-after (``forward``) its time, per
    ``keys``. Unmatched left rows keep NULL payload (left-outer semantics,
    as in pandas ``merge_asof``).

    Times must be numeric (the repo convention: epoch seconds/micros/nanos
    BIGINTs — see registry.py determinism conventions).

    * ``payload`` — right columns to carry (default: all non-key,
      non-time right columns). Names must not collide with left columns.
    * ``tolerance`` — max |left_time − matched right_time|; matches farther
      away come back NULL.
    * ``tiebreak`` — right column ordering equal-time right rows; the
      greatest wins.
    * ``matched_time_col`` — when set, also expose the matched right row's
      time under this name.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if payload is None:
        skip = set(keys) | {right_time}
        payload = [c for c in right.columns if c not in skip]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left side: {sorted(overlap)}")

    # forward as-of = backward as-of on negated time
    sign = 1 if direction == "backward" else -1
    carried = list(payload) + [_RT]

    # a right row with NULL time has no position on the timeline and must
    # never match: unfiltered it would get _T=NULL, sort FIRST under the
    # nulls-first asc order, and hand its payload to left rows that have no
    # real earlier snapshot (pandas merge_asof raises on NULL times; we
    # drop the undefined-time rows — same outcome for every defined row)
    r = right.filter(F.col(right_time).isNotNull()).select(
        *keys,
        (F.col(right_time) * sign).alias(_T),
        F.lit(0).alias(_SIDE),
        *[F.col(c) for c in payload],
        F.col(right_time).alias(_RT),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias(_TB),
    )
    l = left.select(
        *left.columns,
        (F.col(left_time) * sign).alias(_T),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in carried],
        F.lit(None).cast(r.schema[_TB].dataType).alias(_TB),
    )
    left_only = [c for c in left.columns if c not in r.columns]
    both = r.select(
        *r.columns,
        *[F.lit(None).cast(l.schema[c].dataType).alias(c) for c in left_only],
    ).unionByName(l.select(*r.columns, *left_only))

    # right rows before left rows at equal time; greater tiebreak later (wins)
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(_T).asc(), F.col(_SIDE).asc(), F.col(_TB).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # the matched row travels as ONE struct: per-column last(ignorenulls)
    # would tear it — a NULL payload value in the true match silently
    # backfills from an older right row, fabricating a composite row that
    # never existed. The struct is non-NULL for every right row (even with
    # all-NULL fields) and NULL for left rows, so last(ignorenulls) picks
    # exactly the newest right ROW.
    snap = F.when(F.col(_SIDE) == 0,
                  F.struct(*[F.col(c) for c in carried]))
    filled = both.select(
        "*", F.last(snap, ignorenulls=True).over(w).alias("__m"),
    ).filter(F.col(_SIDE) == 1)

    matched_t = F.col("__m")[_RT]
    if tolerance is not None:
        within = (F.abs(F.col(left_time) - matched_t) <= F.lit(tolerance))
        sel = [F.when(within, F.col("__m")[c]).otherwise(F.lit(None))
                .alias(c) for c in payload]
        mt = F.when(within, matched_t).otherwise(F.lit(None))
    else:
        sel = [F.col("__m")[c].alias(c) for c in payload]
        mt = matched_t
    out_cols = [F.col(c) for c in left.columns] + sel
    if matched_time_col:
        out_cols.append(mt.alias(matched_time_col))
    return filled.select(*out_cols)
