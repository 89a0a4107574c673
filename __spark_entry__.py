"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``dexscraper_spark.plans.registry``: every implemented
operator from SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame builder
plus (when SQL-expressible) a DuckDB oracle SQL string in
``dexscraper_spark/plans/catalog.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dexscraper_spark.plans import registry as _registry  # noqa: E402
from dexscraper_spark.plans.flagship import flagship_top_revenue  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_top_revenue(spark, "/root/testdata/sf0.001", n=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
