"""Exporters (SURVEY §2.2 K1-K11), Spark-first.

Two shapes, matching how each format scales:

* **Row-line formats** (CSV OHLCV/OHLCVT K3/K4, MT5 K5, Excel CSV K10,
  JSONL K2) — one output line per row → a ``line`` Column +
  ``df.write.text/csv/json``. Fully distributed; at 100 TB these write in
  parallel from every executor, no driver involvement.
* **Batch-document formats** (TradingView K6, Binance klines K7, CoinGecko
  K8, PancakeSwap K9, enhanced-JSON K1, Prometheus K11) — the reference
  emits ONE document per micro-batch (<=50 rows by construction), so the
  Spark form is an aggregation to a single JSON string: ``collect_list``
  over an explicitly ordered projection. These are driver-bound by design —
  they model an API response, not a data lake write; the cap that makes
  this safe is the same top-k/limit the reference applies first.

All numeric formatting is done with JVM-side ``format_string`` so golden
strings match the reference bit-for-bit (tests/test_models.py:28-62).

Reference parity (file:line into /root/reference/dexscraper/):
  K2 JsonLinesExporter          models.py:665-698
  K3/K4/K5 OHLC line formats    models.py:61-77, 396-460
  K6 TradingViewExporter        models.py:463-488
  K7 BinanceExporter            models.py:491-524
  K8 CoinGeckoExporter          models.py:527-569
  K9 PancakeSwapExporter        models.py:572-600
  K10 ExcelExporter             models.py:603-662
  K11 PrometheusExporter        models.py:701-752
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _f8(c: Column) -> Column:
    return F.format_string("%.8f", c)


def _iso8601(ts) -> str | None:
    """models.py:562: datetime.fromtimestamp(ts).isoformat(); pinned to UTC
    so output is host-TZ-independent."""
    from datetime import datetime, timezone
    if ts is None:
        return None
    return (datetime.fromtimestamp(int(ts), tz=timezone.utc)
            .isoformat().replace("+00:00", ""))


def _dt(ts: Column, fmt: str) -> Column:
    return F.date_format(F.to_timestamp(ts.cast("long")), fmt)


# ---------------------------------------------------------------------------
# Row-line formats (distributed writes)
# ---------------------------------------------------------------------------

def mt5_line() -> Column:
    """K5 line Column: 'YYYY.MM.DD HH:MM:SS,O,H,L,C,intV' (models.py:61-64)."""
    return F.concat_ws(
        ",",
        _dt(F.col("ts"), "yyyy.MM.dd HH:mm:ss"),
        _f8(F.col("open")), _f8(F.col("high")), _f8(F.col("low")),
        _f8(F.col("close")),
        F.col("volume").cast("long").cast("string"),
    )


def mt5_lines(bars: DataFrame) -> DataFrame:
    """K5: no header; one line per bar — distributed write."""
    return bars.select(mt5_line().alias("line"))


def csv_ohlcv_line() -> Column:
    """K3 line Column: 'YYYY-MM-DD HH:MM:SS,O,H,L,C,V(.2f)' (models.py:66-69)."""
    return F.concat_ws(
        ",",
        _dt(F.col("ts"), "yyyy-MM-dd HH:mm:ss"),
        _f8(F.col("open")), _f8(F.col("high")), _f8(F.col("low")),
        _f8(F.col("close")),
        F.format_string("%.2f", F.col("volume")),
    )


def csv_ohlcv_lines(bars: DataFrame) -> DataFrame:
    """K3; header 'DateTime,Open,High,Low,Close,Volume' added by the writer."""
    return bars.select(csv_ohlcv_line().alias("line"))


def csv_ohlcvt_line() -> Column:
    """K4 line Column: OHLCV + trades; trades null → int(volume/1000)
    (models.py:71-77)."""
    trades = F.coalesce(F.col("trades"),
                        F.floor(F.col("volume") / 1000.0).cast("long"))
    return F.concat_ws(
        ",",
        _dt(F.col("ts"), "yyyy-MM-dd HH:mm:ss"),
        _f8(F.col("open")), _f8(F.col("high")), _f8(F.col("low")),
        _f8(F.col("close")),
        F.format_string("%.2f", F.col("volume")),
        trades.cast("string"),
    )


def csv_ohlcvt_lines(bars: DataFrame) -> DataFrame:
    return bars.select(csv_ohlcvt_line().alias("line"))


def jsonl_rows(df: DataFrame) -> DataFrame:
    """K2: one compact JSON object per row (write.json is native JSONL;
    this variant returns the strings for golden-testing)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("line"))


EXCEL_COLUMNS = (
    "symbol", "token_name", "chain", "protocol", "price", "volume_24h",
    "txns_24h", "makers", "liquidity", "market_cap", "confidence_score",
    "field_count", "ts",
)


def excel_rows(tokens: DataFrame) -> DataFrame:
    """K10: 13-column per-token CSV projection with formatted timestamp
    (models.py:603-662) → write.csv(header=True)."""
    cols = [F.col(c) for c in EXCEL_COLUMNS[:-1]]
    cols.append(_dt(F.col("ts"), "yyyy-MM-dd HH:mm:ss").alias("timestamp"))
    return tokens.select(*cols)


# ---------------------------------------------------------------------------
# Batch-document formats (one JSON string per batch).
#
# Every document is BOUNDED before any global aggregation: a top-N
# (TakeOrderedAndProject — per-partition heaps, no global sort) caps what
# reaches the single collect step. The formats model a bounded API
# response (the reference emits <=50-row batches), so the cap is inherent
# to the format; the bound makes handing these a 100 TB frame safe rather
# than a single-task funnel.
# ---------------------------------------------------------------------------

def bounded_latest(bars: DataFrame, *, order_col: str, top_n: int) -> DataFrame:
    """The latest ``top_n`` rows by ``order_col`` with a total-order
    tiebreak over the remaining columns — compiles to
    TakeOrderedAndProject, never an unbounded global collect."""
    keys = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in bars.columns if c != order_col]
    return bars.orderBy(*keys).limit(top_n)


def tradingview_document(bars: DataFrame, *, order_col: str = "ts",
                         top_n: int = 500) -> str:
    """K6: columnar {"s":"ok","t":[...],"o":[...],...} (models.py:463-488)
    over the latest ``top_n`` bars, arrays time-ascending.

    collect_list has no ordering guarantee, so arrays are built by sorting
    one collected struct array — deterministic at any parallelism.
    """
    row = (
        bounded_latest(bars, order_col=order_col, top_n=top_n)
        .select(F.struct(F.col(order_col).alias("__o"),
                         F.col("ts"), F.col("open"), F.col("high"),
                         F.col("low"), F.col("close"), F.col("volume"))
                .alias("s"))
        .agg(F.sort_array(F.collect_list("s")).alias("arr"))
        .select(
            F.transform("arr", lambda x: x["ts"].cast("long")).alias("t"),
            F.transform("arr", lambda x: x["open"]).alias("o"),
            F.transform("arr", lambda x: x["high"]).alias("h"),
            F.transform("arr", lambda x: x["low"]).alias("l"),
            F.transform("arr", lambda x: x["close"]).alias("c"),
            F.transform("arr", lambda x: x["volume"]).alias("v"),
        )
        .collect()[0]
    )
    doc = {"s": "ok", "t": row["t"], "o": row["o"], "h": row["h"],
           "l": row["l"], "c": row["c"], "v": row["v"]}
    return json.dumps(doc, separators=(",", ":"))


def binance_klines_document(bars: DataFrame, *, order_col: str = "ts",
                            top_n: int = 500) -> str:
    """K7: array-of-arrays klines over the latest ``top_n`` bars: ms
    timestamps, close=open+60000, taker volume = 0.6·V, trades null → 1
    (models.py:491-524)."""
    kline = F.array(
        (F.col("ts").cast("long") * 1000).cast("string"),
        _f8(F.col("open")), _f8(F.col("high")), _f8(F.col("low")),
        _f8(F.col("close")), _f8(F.col("volume")),
        (F.col("ts").cast("long") * 1000 + 60000).cast("string"),
        _f8(F.col("volume")),
        # falsy, not null-only: the reference's `ohlc.trades if ohlc.trades
        # else 1` maps trades=0 to 1 too (models.py:516)
        F.when(F.col("trades").isNotNull() & (F.col("trades") != 0),
               F.col("trades")).otherwise(F.lit(1)).cast("string"),
        _f8(F.col("volume") * 0.6), _f8(F.col("volume") * 0.6),
        F.lit("0"),
    )
    rows = (
        bounded_latest(bars, order_col=order_col, top_n=top_n)
        .select(F.struct(F.col(order_col).alias("__o"), kline.alias("k")).alias("s"))
        .agg(F.sort_array(F.collect_list("s")).alias("arr"))
        .select(F.transform("arr", lambda x: x["k"]).alias("klines"))
        .collect()[0]["klines"]
    )
    # numeric fields that JSON renders bare (ints), string fields quoted:
    out = []
    for k in rows:
        out.append([
            int(k[0]), k[1], k[2], k[3], k[4], k[5], int(k[6]), k[7],
            int(k[8]), k[9], k[10], k[11],
        ])
    return json.dumps(out, separators=(",", ":"))


def coingecko_document(tokens: DataFrame, *, order_col: str = "market_cap",
                       top_n: int = 100) -> str:
    """K8: ranked market entries for the top ``top_n`` by ``order_col``;
    rank = position in ranked order, ath = 1.2·price, ath_change = -16.67
    (models.py:527-569). The rank window runs AFTER the top-N cap, so it
    never funnels the full frame through one partition."""
    from pyspark.sql import Window
    order = [F.col(order_col).desc_nulls_last(),
             F.col("symbol").asc_nulls_last()]
    bounded = (
        tokens.filter(F.col("price").isNotNull() & (F.col("price") != 0))
        .orderBy(*order).limit(top_n)
    )
    w = Window.orderBy(*order)
    rows = (
        bounded.withColumn("__rank", F.row_number().over(w))
        .select(F.struct(
            F.col("__rank").alias("rank"), F.col("symbol"),
            F.col("token_name"), F.col("price"), F.col("market_cap"),
            F.col("volume_24h"), F.col("change_24h"), F.col("change_1h"),
            F.col("ts"),
        ).alias("s"))
        .agg(F.sort_array(F.collect_list("s")).alias("arr"))
        .collect()[0]["arr"]
    )
    out = []
    for r in rows:
        i = r["rank"] - 1
        out.append({
            "id": f"token-{i}",
            "symbol": r["symbol"] or f"token{i}",
            "name": r["token_name"] or r["symbol"] or f"Token {i}",
            "current_price": r["price"],
            "market_cap": r["market_cap"],
            "total_volume": r["volume_24h"],
            "price_change_percentage_24h": r["change_24h"],
            "price_change_percentage_1h_in_currency": r["change_1h"],
            "price_change_percentage_24h_in_currency": r["change_24h"],
            "market_cap_rank": r["rank"],
            "circulating_supply": None,
            "total_supply": None,
            "max_supply": None,
            "ath": r["price"] * 1.2,
            "ath_change_percentage": -16.67,
            # models.py:562-565: ISO-8601 of token.timestamp
            "last_updated": _iso8601(r["ts"]),
        })
    return json.dumps(out, separators=(",", ":"), default=str)


def pancakeswap_document(tokens: DataFrame, *, top_n: int = 500) -> str:
    """K9: JSON object keyed by token_address; price_BNB = 0.002·price
    (models.py:572-600). Built with map_from_entries JVM-side over the
    first ``top_n`` addresses (total order on token_address)."""
    entries = (
        tokens.filter(F.col("token_address").isNotNull()
                      & F.col("price").isNotNull() & (F.col("price") != 0))
        .orderBy(F.col("token_address").asc()).limit(top_n)
        .select(F.struct(
            F.col("token_address"),
            F.struct(
                # falsy-or, matching `token.token_name or token.symbol`
                # (models.py:592): an EMPTY name falls back to the symbol
                F.when(F.col("token_name").isNotNull()
                       & (F.col("token_name") != ""), F.col("token_name"))
                 .otherwise(F.col("symbol")).alias("name"),
                F.col("symbol").alias("symbol"),
                F.col("price").cast("string").alias("price"),
                (F.col("price") * 0.002).cast("string").alias("price_BNB"),
                # deliberate deviation from models.py:597 (`ts or
                # time.time()`): NULL, not wall clock — the engine's
                # determinism conventions forbid run-dependent output
                F.col("ts").cast("long").alias("updated_at"),
            ).alias("v"),
        ).alias("s"))
        .agg(F.sort_array(F.collect_list("s")).alias("arr"))
        .select(F.map_from_entries("arr").alias("m"))
        .select(F.to_json("m").alias("j"))
        .collect()[0]["j"]
    )
    return entries or "{}"


def enhanced_json_document(tokens: DataFrame, *, extraction_ts: int,
                           top_n: int = 50,
                           tiebreak: str | None = None) -> str:
    """K1: {"type":"enhanced_tokens", stats, tokens:[...]} — batch stats +
    null-free token payloads (cli.py:627-699; models.py:307-344).

    Two jobs: one full-frame stats aggregate (partial-aggregatable) and one
    bounded top-N whose JSON array is rendered JVM-side with ``to_json``
    over a sorted struct array — the driver parses ONE array string, never
    per-row JSON round trips.
    """
    from dexscraper_spark.functions.cleaning import null_free
    from dexscraper_spark.operators.topk import top_tokens
    stats_row = tokens.agg(
        F.count(F.lit(1)).alias("total_extracted"),
        F.sum(F.when(F.col("confidence_score") >= 0.7, 1).otherwise(0))
        .alias("high_confidence_count"),
        F.sum(F.when((F.col("field_count") >= 5)
                     & (F.col("confidence_score") >= 0.3), 1).otherwise(0))
        .alias("complete_profiles_count"),
    ).collect()[0]
    top = null_free(top_tokens(tokens, top_n, tiebreak=tiebreak))
    payload_struct = F.struct(*[F.col(c) for c in top.columns])
    arr_json = (
        top.select(F.struct(
            F.col("confidence_score").alias("__c"),
            F.col("field_count").alias("__f"),
            payload_struct.alias("p")).alias("s"))
        .agg(F.sort_array(F.collect_list("s"), asc=False).alias("arr"))
        .select(F.to_json(F.transform("arr", lambda x: x["p"])).alias("j"))
        .collect()[0]["j"]
    )
    doc = {
        "type": "enhanced_tokens",
        "extraction_timestamp": extraction_ts,
        "total_extracted": stats_row["total_extracted"],
        "high_confidence_count": stats_row["high_confidence_count"] or 0,
        "complete_profiles_count": stats_row["complete_profiles_count"] or 0,
        "tokens": json.loads(arr_json) if arr_json else [],
    }
    return json.dumps(doc, separators=(",", ":"))


def prometheus_text(tokens: DataFrame, *, extraction_ts: int, top_n: int = 10,
                    tiebreak: str | None = None) -> str:
    """K11: counters/gauges; batch-level + per-token for the top-N
    (models.py:701-752)."""
    from dexscraper_spark.operators.topk import top_tokens
    stats = tokens.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("confidence_score") >= 0.7, 1).otherwise(0)).alias("high"),
    ).collect()[0]
    lines = [
        "# HELP dexscraper_tokens_extracted_total Total tokens extracted",
        "# TYPE dexscraper_tokens_extracted_total counter",
        f"dexscraper_tokens_extracted_total {stats['total']}",
        "# HELP dexscraper_tokens_high_confidence High confidence tokens",
        "# TYPE dexscraper_tokens_high_confidence gauge",
        f"dexscraper_tokens_high_confidence {stats['high'] or 0}",
        "# HELP dexscraper_extraction_timestamp Last extraction timestamp",
        "# TYPE dexscraper_extraction_timestamp gauge",
        f"dexscraper_extraction_timestamp {extraction_ts}",
        "# HELP dexscraper_token_price_usd Token price in USD",
        "# TYPE dexscraper_token_price_usd gauge",
        "# HELP dexscraper_token_volume_24h_usd Token 24h volume in USD",
        "# TYPE dexscraper_token_volume_24h_usd gauge",
    ]
    for r in top_tokens(tokens, top_n, tiebreak=tiebreak).collect():
        sym = (r["symbol"] or "UNKNOWN").replace('"', "")
        # falsy (`if token.price:`, models.py:740) — 0.0 emits no line
        if r["price"]:
            lines.append(f'dexscraper_token_price_usd{{symbol="{sym}"}} {r["price"]}')
        if r["volume_24h"]:
            lines.append(
                f'dexscraper_token_volume_24h_usd{{symbol="{sym}"}} {r["volume_24h"]}')
    return "\n".join(lines) + "\n"
