"""dexscraper_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``vincentkoc/dexscraper``.

This is NOT a port of the reference implementation. The reference is a
single-process Python scraper/decoder (see /root/reference); this package
re-expresses every one of its operators (filters, ranking, proximity joins,
OHLC aggregation, sessionization, exporters, streaming loop) as idiomatic
Spark DataFrame / SQL / Structured Streaming plans, designed to run on a
multi-executor cluster against ~100 TB of data.

Layout:
    config        — the declarative Filters/RankBy DSL (reference config.py)
                    compiled into Catalyst ``Column`` predicates
    schemas       — canonical StructTypes (tokens / pairs / ohlc / metadata)
    functions/    — scalar Column-builder library (validity, cleaning,
                    classification, scoring, formatting, text stats)
    operators/    — relational operators (top-k, OHLC, sessionize, proximity
                    join, dedup, similarity, rollups)
    sources/      — binary decode kernel (pandas UDF) + synthetic generators
    sinks/        — exporters (JSON/CSV/MT5/TradingView/klines/Prometheus...)
    streaming/    — Structured Streaming wrap (micro-batch loop semantics)
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark, sf_dir: str, names=TABLES):
    """Load the driver parquet tables as a dict of DataFrames.

    Scale note: ``spark.read.parquet`` uses the vectorized columnar reader;
    filters/projections applied downstream are pushed into the scan by
    Catalyst (verify with ``.explain`` → PushedFilters / ReadSchema).
    """
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}
