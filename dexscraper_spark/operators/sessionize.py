"""Sessionization / proximity clustering (SURVEY §2.5 A6, §2.7 W4).

Reference parity: ``cluster_numeric_values`` (dexscraper/utils.py:214-255)
sorts values and starts a new cluster when the relative gap to the previous
value exceeds a tolerance; clusters of >= min_size survive. The reference
does this with a Python loop over a sorted list; here it is the classic
distributed sessionization idiom:

    lag → gap flag → running sum (cluster id) → groupBy(cluster id)

Scale note: the window is partitioned (per key) wherever a key exists, so
state never exceeds one partition's rows. The value-clustering variant is
inherently a global sort — fine for the reference's <=50-value batches; at
scale, partition first (by symbol/field) so each global sort is per-group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, *, partition_cols: list[str], order_col: str,
               gap: Column | float, session_col: str = "session_id") -> DataFrame:
    """Assign session ids: a new session starts when order_col advances more
    than ``gap`` past the previous row in the partition.

    ``gap`` may be a literal (absolute gap) or any boolean-producing Column
    comparison is built from ``delta > gap``.
    """
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    delta = F.col(order_col) - F.lag(order_col).over(w)
    gap_col = F.lit(gap) if not isinstance(gap, Column) else gap
    new_session = F.when(delta.isNull() | (delta > gap_col), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def cluster_values(df: DataFrame, *, value_col: str, tolerance: float = 0.05,
                   min_size: int = 2, partition_cols: list[str] | None = None) -> DataFrame:
    """A6 exactly: sort values; new cluster when relative gap
    (v - prev)/prev > tolerance; keep clusters with >= min_size members.

    Returns one row per cluster: (partition..., cluster_id, cluster_min,
    cluster_max, cluster_avg, cluster_size). Relative-gap guard: prev == 0
    starts a new cluster (reference divides by prev only when prev != 0).
    """
    parts = partition_cols or []
    w = Window.partitionBy(*parts).orderBy(value_col) if parts \
        else Window.orderBy(value_col)
    prev = F.lag(value_col).over(w)
    v = F.col(value_col)
    rel_gap = F.when(prev.isNull() | (prev == 0), F.lit(None)) \
               .otherwise((v - prev) / prev)
    new_cluster = F.when(rel_gap.isNull() | (rel_gap > tolerance), 1).otherwise(0)
    clustered = df.withColumn(
        "cluster_id",
        F.sum(new_cluster).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    from dexscraper_spark.functions.exact import avg_money
    return (
        clustered.groupBy(*parts, "cluster_id")
        .agg(
            F.min(v).alias("cluster_min"),
            F.max(v).alias("cluster_max"),
            avg_money(v, 6).alias("cluster_avg"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .filter(F.col("cluster_size") >= min_size)
    )
