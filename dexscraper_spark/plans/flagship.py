"""Flagship query — "trending top-N with filters" (SURVEY §7.1).

The reference's core user query (README.md:87-105; CLI default path): load
snapshot → range-filter (Filters DSL) → rank by metric desc → limit N →
project display columns. On the driver's TPC-H-ish tables this becomes:
revenue per order over a ship-date window, joined to orders, range-filtered
on order price, top-10 by revenue.

Exercises F1/F2 (filter compiler), T1/T2 (rank+limit), A2 (sum rollup),
and an equi-join in one pipe.

Plan shape at scale (verify with .explain("formatted")):
  * lineitem scan: shipdate predicate + 3-column projection pushed to
    parquet (PushedFilters/ReadSchema) — reads a fraction of the table.
  * partial hash-agg BEFORE the shuffle (map-side combine) — shuffle
    carries one row per (orderkey, partition).
  * join on orderkey: both sides large → sort-merge; AQE converts to
    broadcast automatically when the filtered agg side is small.
  * top-10 = TakeOrderedAndProject, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dexscraper_spark.config import Filters
from dexscraper_spark.functions.exact import sum_money, sum_money_sql

# ONE Filters spec feeds the DataFrame predicate AND the oracle WHERE —
# hand-duplicating the bounds in the SQL invites silent drift.
_ORDER_FILTERS = Filters(liquidity_min=1_000.0, liquidity_max=400_000.0)
_COLUMN_MAP = {"liquidity": "o_totalprice"}

# l_extendedprice (2 dp) × (1 − l_discount) (2 dp) is exact at 4 decimals
# — scale=4 makes the fixed-point sum EXACT, not cent-rounded per row
# (scale=2 injected ≤0.005/row, enough to flip near-ties at the LIMIT).
_REVENUE_SCALE = 4


def flagship_top_revenue(spark: SparkSession, sf_dir: str, n: int = 10) -> DataFrame:
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # Filters-DSL predicate retargeted at TPC-H columns: the same compiler
    # the tokens pipeline uses (config.Filters.to_column).
    order_pred = _ORDER_FILTERS.to_column(column_map=_COLUMN_MAP)

    revenue = (
        lineitem
        .filter(F.col("l_shipdate") >= F.lit("1996-01-01"))
        .filter(F.col("l_shipdate") < F.lit("1997-01-01"))
        .groupBy("l_orderkey")
        .agg(sum_money(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                       _REVENUE_SCALE)
             .alias("revenue"))
    )
    return (
        revenue.join(orders, revenue.l_orderkey == orders.o_orderkey)
        .filter(order_pred)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(n)
    )


def flagship_oracle_sql(n: int = 10) -> str:
    rev = sum_money_sql("l_extendedprice * (1.0 - l_discount)",
                        _REVENUE_SCALE)
    where = _ORDER_FILTERS.to_sql(column_map=_COLUMN_MAP)
    return f"""
        SELECT o_orderkey AS orderkey,
               o_orderpriority AS priority,
               o_totalprice AS totalprice,
               r.revenue AS revenue
        FROM (
            SELECT l_orderkey, {rev} AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_orderkey
        ) r
        JOIN orders ON r.l_orderkey = o_orderkey
        WHERE {where}
        ORDER BY revenue DESC, orderkey ASC
        LIMIT {n}
    """
