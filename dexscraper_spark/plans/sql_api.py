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
    """The flagship 'trending top-N with filters' as one SQL statement —
    same semantics as ``ScrapingConfig.apply``: bounds on columns the
    table lacks are skipped (the reference drops unknown URL params), and
    a missing ``trending_score`` rank column is derived in a subquery
    with the identical arithmetic as ``functions.scoring.trending_score``."""
    available = set(spark.table(table).columns)
    rank = rank_column or cfg.rank_column()
    direction = "DESC" if cfg.order.value == "desc" else "ASC"
    src = table
    if rank == "trending_score" and "trending_score" not in available:
        from dexscraper_spark.config import TRENDING_CHANGE_COLUMN
        from dexscraper_spark.functions.scoring import trending_score_sql
        change_col = TRENDING_CHANGE_COLUMN.get(cfg.rank_by)
        if change_col is None:
            raise ValueError(
                f"rank 'trending_score' needs a trendingScore* rank_by, "
                f"got {cfg.rank_by}")
        src = (f"(SELECT *, {trending_score_sql('volume_24h', change_col, 'txns_24h')} "
               f"AS trending_score FROM {table})")
        available = available | {"trending_score"}
    return spark.sql(f"""
        SELECT * FROM {src}
        WHERE {cfg.filters.to_sql(column_map, available_columns=available)}
        ORDER BY {rank} {direction} NULLS LAST
        LIMIT {cfg.limit}
    """)
