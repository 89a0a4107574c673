"""SQL API surface: the engine's tables as temp views + `spark.sql`.

Everything in the catalog is DataFrame-built; this module shows the same
plans are reachable through pure SQL (`spark.sql`), which matters for
users porting from the reference's exported JSON into SQL tooling. The
Filters DSL compiles to a WHERE clause via ``Filters.to_sql`` — one
compiler feeds the DataFrame API, the SQL API, and the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dexscraper_spark import TABLES
from dexscraper_spark.config import ScrapingConfig
from dexscraper_spark.sources.tables import load_table


def register_views(spark: SparkSession, sf_dir: str,
                   names=TABLES) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql_trending(spark: SparkSession, cfg: ScrapingConfig, *,
                 table: str = "tokens", rank_column: str | None = None,
                 column_map: dict[str, str] | None = None) -> DataFrame:
    """The flagship 'trending top-N with filters' as one SQL statement."""
    rank = rank_column or cfg.rank_column()
    direction = "DESC" if cfg.order.value == "desc" else "ASC"
    return spark.sql(f"""
        SELECT * FROM {table}
        WHERE {cfg.filters.to_sql(column_map)}
        ORDER BY {rank} {direction} NULLS LAST
        LIMIT {cfg.limit}
    """)
