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
