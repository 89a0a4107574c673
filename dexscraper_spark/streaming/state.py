"""Custom stateful streaming operator (SURVEY §2.9 R7): the reference's
``DataBuffer`` — a bounded circular buffer of the most recent items
(utils.py:472-507, max 1000, never wired into its pipeline) — implemented
properly as ``applyInPandasWithState``.

Per key, state holds the last ``n`` (order_key, value) pairs across
micro-batches; each batch emits one row per key with the refreshed buffer
and summary stats. State size is O(keys × n) and partitioned by key — on a
cluster each executor owns its key range's state, checkpointed with the
query; nothing global, nothing driver-side.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BUFFER_OUTPUT = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("buffer_size", T.IntegerType()),
    T.StructField("recent_values", T.ArrayType(T.DoubleType())),
    T.StructField("recent_min", T.DoubleType()),
    T.StructField("recent_max", T.DoubleType()),
    T.StructField("recent_avg", T.DoubleType()),
])

BUFFER_STATE = T.StructType([
    T.StructField("orders", T.ArrayType(T.LongType())),
    T.StructField("values", T.ArrayType(T.DoubleType())),
])


def recent_buffer_stats(decoded: DataFrame, *, key_col: str,
                        order_col: str, value_col: str,
                        n: int = 1000) -> DataFrame:
    """groupBy(key).applyInPandasWithState keeping the last ``n`` values
    per key (by ``order_col``) across micro-batches."""
    import pandas as pd

    def update(key: tuple, pdfs: Iterator["pd.DataFrame"],
               state: GroupState) -> Iterator["pd.DataFrame"]:
        if state.exists:
            orders, values = state.get
            orders, values = list(orders), list(values)
        else:
            orders, values = [], []
        for pdf in pdfs:
            for o, v in zip(pdf[order_col], pdf[value_col]):
                if v is None:
                    continue
                orders.append(int(o))
                values.append(float(v))
        # keep the n most recent by order key (reference: append + trim head)
        if len(orders) > n:
            idx = sorted(range(len(orders)), key=lambda i: orders[i])[-n:]
            orders = [orders[i] for i in idx]
            values = [values[i] for i in idx]
        state.update((orders, values))
        if values:
            yield pd.DataFrame([{
                "key": str(key[0]),
                "buffer_size": len(values),
                "recent_values": values,
                "recent_min": min(values),
                "recent_max": max(values),
                "recent_avg": sum(values) / len(values),
            }])

    return (
        decoded.groupBy(key_col).applyInPandasWithState(
            update, outputStructType=BUFFER_OUTPUT,
            stateStructType=BUFFER_STATE, outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout)
    )


def streaming_asof_enrich(left: DataFrame, right: DataFrame, *,
                          key_col: str, left_time: str, right_time: str,
                          payload: list[str],
                          matched_time_col: str = "matched_time") -> DataFrame:
    """Streaming twin of ``operators.asof.asof_join``: enrich each left
    event with the latest right snapshot seen at-or-before it, per key,
    with the "latest snapshot" carried ACROSS micro-batches in keyed state.

    This is the reference's live enrichment loop — token profiles upserted
    into a dict, events reading whatever the dict holds
    (scraper.py:345-450) — as a checkpointed, partitioned streaming
    operator: state is O(keys × payload) (ONE snapshot per key, not a
    buffer), sharded by key hash and restored on restart like any
    stateful query.

    Semantics: within a micro-batch, rows order by event time (right
    before left at ties — a snapshot at exactly t is visible to an event
    at t, same as the batch operator). Across batches the kept state is
    the newest-BY-EVENT-TIME snapshot seen so far: a late-arriving older
    snapshot never regresses state (guard below), but it also cannot
    retro-enrich left events already emitted in earlier batches. The
    batch ``asof_join`` is the event-time-exact replay for reprocessing.

    Times must be numeric (epoch longs — registry.py conventions).
    Right rows with NULL ``right_time`` are dropped (no timeline
    position), matching the batch operator. Integer payload columns that
    can be NULL should be declared nullable LongType: a NULL payload in a
    kept snapshot round-trips through pandas as NaN and is restored as
    NULL by the Arrow state codec — but mixing NULLs into non-nullable
    integer output fields raises, by design.
    """
    import pandas as pd

    clash = set(payload) & {f.name for f in left.schema.fields}
    if clash:
        raise ValueError(
            f"payload columns collide with left side: {sorted(clash)}")

    key_field = left.schema[key_col]
    left_fields = [f for f in left.schema.fields if f.name != key_col]
    payload_fields = [right.schema[c] for c in payload]
    out_schema = T.StructType(
        [key_field] + left_fields + payload_fields
        + [T.StructField(matched_time_col, T.LongType())])
    state_schema = T.StructType(
        [T.StructField("__rtime", T.LongType())] + payload_fields)

    from pyspark.sql import functions as F
    left_names = [f.name for f in left_fields]
    # NULL-time snapshots have no timeline position and must never enter
    # state: through pandas a NULL __t becomes NaN, sorts LAST, slips past
    # the regression guard (NaN < cur is False) and would poison the
    # LongType state field. Same contract as the batch asof_join filter.
    r2 = right.filter(F.col(right_time).isNotNull()).select(
        F.col(key_col),
        F.col(right_time).cast("long").alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in payload],
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left_fields],
    )
    l2 = left.select(
        F.col(key_col),
        F.col(left_time).cast("long").alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in payload_fields],
        *[F.col(c) for c in left_names],
    )
    both = r2.unionByName(l2)

    out_cols = ([key_col] + left_names + list(payload) + [matched_time_col])

    def update(key: tuple, pdfs: Iterator["pd.DataFrame"],
               state: GroupState) -> Iterator["pd.DataFrame"]:
        if state.exists:
            cur = list(state.get)          # [rtime, payload...]
        else:
            cur = [None] * (1 + len(payload))
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["__t", "__side"], kind="stable")
            # NOT itertuples: pandas renames leading-underscore columns
            for d in pdf.to_dict("records"):
                if d["__side"] == 0:
                    # keep the newest-by-event-time snapshot: a late
                    # (out-of-order) older snapshot must not regress state
                    if cur[0] is not None and d["__t"] < cur[0]:
                        continue
                    cur = [d["__t"]] + [d[c] for c in payload]
                else:
                    rec = {key_col: key[0]}
                    for c in left_names:
                        rec[c] = d[c]
                    for i, c in enumerate(payload):
                        rec[c] = cur[1 + i]
                    rec[matched_time_col] = cur[0]
                    out.append(rec)
        state.update(tuple(cur))
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return both.groupBy(key_col).applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)
