"""Catalog of registered queries: one entry per implemented SURVEY §2 operator.

Each registration pairs an idiomatic-Spark DataFrame builder with its ANSI
SQL oracle (run by the driver on DuckDB over the same parquet). See
registry.py for the determinism conventions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dexscraper_spark.functions.exact import (
    avg_money, avg_money_sql, sum_money, sum_money_sql,
)
from dexscraper_spark.plans.flagship import flagship_oracle_sql, flagship_top_revenue
from dexscraper_spark.plans.registry import register
from dexscraper_spark.session import tune_session


def _t(spark, sf_dir: str, name: str):
    from dexscraper_spark.sources.tables import load_table
    tune_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship (SURVEY §7.1): filter DSL + join + agg + top-k in one pipe.
# ---------------------------------------------------------------------------

register("flagship_topk_revenue", flagship_oracle_sql(),
         survey_ref="F1,F2,T1,T2,A2,J5")(flagship_top_revenue)


# ---------------------------------------------------------------------------
# A1/A2 — batch stats & rollups (models.py:369-375, cli.py:458-471), in
# TPC-H Q1 shape: grouped sums/avgs/conditional counts over lineitem.
# ---------------------------------------------------------------------------

@register(
    "agg_pricing_summary",
    f"""
    SELECT l_returnflag,
           l_linestatus,
           {sum_money_sql('l_quantity', 2, 'sum_qty')},
           {sum_money_sql('l_extendedprice', 2, 'sum_base_price')},
           {sum_money_sql('l_extendedprice * (1.0 - l_discount)', 2, 'sum_disc_price')},
           {sum_money_sql('(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)', 2, 'sum_charge')},
           {avg_money_sql('l_quantity', 2, 'avg_qty')},
           {avg_money_sql('l_extendedprice', 2, 'avg_price')},
           {avg_money_sql('l_discount', 4, 'avg_disc')},
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    survey_ref="A1,A2",
)
def agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    disc_price = price * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_money(F.col("l_quantity")).alias("sum_qty"),
            sum_money(price).alias("sum_base_price"),
            sum_money(disc_price).alias("sum_disc_price"),
            sum_money(charge).alias("sum_charge"),
            avg_money(F.col("l_quantity")).alias("avg_qty"),
            avg_money(price).alias("avg_price"),
            avg_money(F.col("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# A3 — frequency count + top-k (scraper.py:570-584): symbol occurrence
# counts sorted desc, top 20. On events.event_type.
# ---------------------------------------------------------------------------

@register(
    "agg_frequency_topk",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS occurrences
    FROM events
    GROUP BY event_type
    ORDER BY occurrences DESC, event_type ASC
    LIMIT 20
    """,
    survey_ref="A3,T3",
)
def agg_frequency_topk(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.col("occurrences").desc(), F.col("event_type").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# A5 — true windowed OHLC over the events stream table: 1-hour tumbling
# windows per event_type (ts returned as epoch seconds).
# ---------------------------------------------------------------------------

@register(
    "ohlc_1h",
    """
    SELECT event_type AS symbol,
           CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_ts,
           arg_min(value, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, event_id) AS close,
           """ + sum_money_sql("value", 6, "volume") + """,
           CAST(COUNT(*) AS BIGINT) AS trades
    FROM events
    GROUP BY 1, 2
    """,
    survey_ref="A5,R5",
)
def ohlc_1h(spark, sf_dir):
    from dexscraper_spark.operators.ohlc import ohlc_windowed
    ev = _t(spark, sf_dir, "events")
    bars = ohlc_windowed(
        ev, symbol_col="event_type", ts_col="ts", price_col="value",
        qty_col="value", order_col="event_id", duration="1 hour",
    )
    return bars.withColumn("bucket_ts", F.col("bucket_ts").cast("long"))
