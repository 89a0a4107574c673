"""Shared fixtures: one SparkSession per test session + the reference's
canonical sample rows (mirrors /root/reference/tests/conftest.py:19-45
values — fixture data only, no code)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dexscraper_spark.session import get_spark
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def sample_token(spark):
    """Canonical sample token (reference tests/conftest.py:19-31)."""
    from dexscraper_spark.schemas import TOKENS
    row = {f.name: None for f in TOKENS.fields}
    row.update(
        symbol="TEST", token_name="Test Token", chain="solana",
        protocol="pumpfun", price=0.000123, volume_24h=1_000_000.5,
        txns_24h=500, makers=25, liquidity=50_000.0, market_cap=5_000_000.0,
        confidence_score=0.85, field_count=8, ts=1756793176,
    )
    return spark.createDataFrame([row], schema=TOKENS)


@pytest.fixture()
def sample_ohlc(spark):
    """Canonical OHLC bar (reference tests/conftest.py:34-45)."""
    from dexscraper_spark.schemas import OHLC
    return spark.createDataFrame(
        [("TEST", 1756793176, 0.000123, 0.000127, 0.000119, 0.000125,
          1_000_000.50, 150)],
        schema=OHLC,
    )
