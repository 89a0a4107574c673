"""Golden-string sink tests, pinned to the reference's expectations
(/root/reference/tests/test_models.py:28-62). The canonical bar is the
conftest fixture; expected strings must match bit-for-bit (UTC session)."""

from __future__ import annotations

import json
from datetime import datetime, timezone

TS = 1756793176
DT = datetime.fromtimestamp(TS, tz=timezone.utc)


def test_mt5_golden(sample_ohlc):
    from dexscraper_spark.sinks.exporters import mt5_lines
    line = mt5_lines(sample_ohlc).collect()[0]["line"]
    expected = (f"{DT.strftime('%Y.%m.%d %H:%M:%S')},"
                "0.00012300,0.00012700,0.00011900,0.00012500,1000000")
    assert line == expected


def test_csv_ohlcv_golden(sample_ohlc):
    from dexscraper_spark.sinks.exporters import csv_ohlcv_lines
    line = csv_ohlcv_lines(sample_ohlc).collect()[0]["line"]
    expected = (f"{DT.strftime('%Y-%m-%d %H:%M:%S')},"
                "0.00012300,0.00012700,0.00011900,0.00012500,1000000.50")
    assert line == expected


def test_csv_ohlcvt_golden(sample_ohlc):
    from dexscraper_spark.sinks.exporters import csv_ohlcvt_lines
    line = csv_ohlcvt_lines(sample_ohlc).collect()[0]["line"]
    expected = (f"{DT.strftime('%Y-%m-%d %H:%M:%S')},"
                "0.00012300,0.00012700,0.00011900,0.00012500,1000000.50,150")
    assert line == expected


def test_csv_ohlcvt_estimates_trades(spark):
    """trades NULL → int(volume/1000) (models.py:74-77)."""
    from dexscraper_spark.schemas import OHLC
    from dexscraper_spark.sinks.exporters import csv_ohlcvt_lines
    bar = spark.createDataFrame(
        [("TEST", TS, 0.000123, 0.000127, 0.000119, 0.000125, 1_000_000.50, None)],
        schema=OHLC)
    line = csv_ohlcvt_lines(bar).collect()[0]["line"]
    assert line.endswith(",1000000.50,1000")


def test_tradingview_document(sample_ohlc):
    from dexscraper_spark.sinks.exporters import tradingview_document
    doc = json.loads(tradingview_document(sample_ohlc))
    assert doc["s"] == "ok"
    assert doc["t"] == [TS]
    assert doc["o"] == [0.000123]
    assert doc["h"] == [0.000127]
    assert doc["l"] == [0.000119]
    assert doc["c"] == [0.000125]
    assert doc["v"] == [1_000_000.50]


def test_binance_klines_document(sample_ohlc):
    from dexscraper_spark.sinks.exporters import binance_klines_document
    klines = json.loads(binance_klines_document(sample_ohlc))
    assert len(klines) == 1
    k = klines[0]
    assert k[0] == TS * 1000
    assert k[1] == "0.00012300"
    assert k[6] == TS * 1000 + 60000
    assert k[8] == 150
    assert k[9] == f"{1_000_000.50 * 0.6:.8f}"
    assert k[11] == "0"


def test_coingecko_document(sample_token):
    from dexscraper_spark.sinks.exporters import coingecko_document
    data = json.loads(coingecko_document(sample_token))
    assert len(data) == 1
    e = data[0]
    assert e["symbol"] == "TEST"
    assert e["market_cap_rank"] == 1
    assert abs(e["ath"] - 0.000123 * 1.2) < 1e-18
    assert e["ath_change_percentage"] == -16.67
    # models.py:562-565: ISO-8601 of token.timestamp (UTC-pinned here)
    assert e["last_updated"] == DT.strftime("%Y-%m-%dT%H:%M:%S")


def test_pancakeswap_document(spark, sample_token):
    from pyspark.sql import functions as F
    from dexscraper_spark.sinks.exporters import pancakeswap_document
    tok = sample_token.withColumn("token_address", F.lit("So1abcdef"))
    data = json.loads(pancakeswap_document(tok))
    assert "So1abcdef" in data
    entry = data["So1abcdef"]
    assert entry["symbol"] == "TEST"
    assert float(entry["price_BNB"]) == 0.000123 * 0.002


def test_enhanced_json_document(sample_token):
    from dexscraper_spark.sinks.exporters import enhanced_json_document
    doc = json.loads(enhanced_json_document(sample_token, extraction_ts=TS))
    assert doc["type"] == "enhanced_tokens"
    assert doc["total_extracted"] == 1
    assert doc["high_confidence_count"] == 1   # 0.85 >= 0.7
    assert doc["complete_profiles_count"] == 1  # 8 fields, 0.85 conf
    assert doc["tokens"][0]["symbol"] == "TEST"


def test_prometheus_text(sample_token):
    from dexscraper_spark.sinks.exporters import prometheus_text
    text = prometheus_text(sample_token, extraction_ts=TS)
    assert "dexscraper_tokens_extracted_total 1" in text
    assert 'dexscraper_token_price_usd{symbol="TEST"} 0.000123' in text


def test_excel_rows(sample_token):
    from dexscraper_spark.sinks.exporters import excel_rows
    row = excel_rows(sample_token).collect()[0]
    assert row["symbol"] == "TEST"
    assert row["timestamp"] == DT.strftime("%Y-%m-%d %H:%M:%S")
    assert len(row) == 13


def test_csv_export_file_roundtrip(spark, sample_ohlc, tmp_path):
    """K3 file export round-trip (reference test_models.py:210-243):
    distributed write.csv with header, read back identical."""
    from pyspark.sql import functions as F
    from dexscraper_spark.sinks.exporters import csv_ohlcv_lines
    out = str(tmp_path / "ohlcv_csv")
    lines = csv_ohlcv_lines(sample_ohlc)
    lines.coalesce(1).write.mode("overwrite").text(out)
    back = spark.read.text(out).collect()
    assert len(back) == 1
    assert back[0]["value"] == lines.collect()[0]["line"]


def test_jsonl_export_file_roundtrip(spark, sample_token, tmp_path):
    """K2: write.json is native JSONL; nulls dropped; read-back preserves
    the populated fields."""
    out = str(tmp_path / "tokens_jsonl")
    sample_token.coalesce(1).write.mode("overwrite").json(out)
    back = spark.read.json(out)
    row = back.collect()[0]
    assert row["symbol"] == "TEST"
    assert row["price"] == 0.000123
    assert row["field_count"] == 8


def test_format_price_and_fixed8(spark):
    from pyspark.sql import functions as F
    from dexscraper_spark.functions.formatting import fixed8, format_price
    df = spark.createDataFrame(
        [(0.000123,), (1234567.89,), (None,)], "v double")
    rows = df.select(format_price(F.col("v")).alias("p"),
                     fixed8(F.col("v")).alias("f8")).collect()
    assert rows[0]["p"] == "0.000123"          # trailing zeros stripped
    assert rows[0]["f8"] == "0.00012300"       # strict sink format
    assert rows[1]["p"] == "1,234,567.89"      # thousands separators
    assert rows[2]["p"] == "N/A"
