"""Query registry — the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 that is implemented registers here with a
(spark, sf_dir) -> DataFrame builder and (when SQL-expressible) a DuckDB
oracle SQL string. ``__spark_entry__.py`` re-exports this registry.

Conventions that keep the cross-engine value-hash stable:
  * every computed column is aliased identically in Spark and SQL;
  * double aggregations use the fixed-point helpers in functions.exact so
    results are order-independent and bit-identical across engines;
  * timestamps are returned as epoch-second BIGINTs (no tz ambiguity);
  * every LIMIT has a total-order ORDER BY (unique tiebreak column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, None → rows-only check
    survey_ref: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, survey_ref: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, survey_ref=survey_ref)
        return fn
    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that register queries.
    from dexscraper_spark.plans import (  # noqa: F401
        catalog, scalars_catalog, sinks_catalog,
    )
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}


def evict_other_apps(cache: dict, app_id: str) -> None:
    """Session-cache hygiene: drop entries keyed to OTHER (stopped)
    SparkContexts. The (appId, ...)-keyed module caches are otherwise
    unbounded across a process that creates several sessions — dead
    entries pin DataFrames/indexes that can never be reused. Entries
    expose ``unpersist`` (DataFrame or IvfIndex); failures are ignored
    because the owning context is already gone."""
    for k in [k for k in cache if k[0] != app_id]:
        entry = cache.pop(k)
        try:
            entry.unpersist()
        except Exception:
            pass
