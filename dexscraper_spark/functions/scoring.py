"""Confidence scoring and field-count derivation (SURVEY §2.5 A7, A9).

Reference parity:
  A7 confidence scoring — dexscraper/utils.py:258-286 (weighted completeness),
     dexscraper/scraper.py:670 (0.7 + 0.05·fields cap 0.95),
     dexscraper/scraper.py:1371-1392 (cluster score).
  A9 field_count — dexscraper/scraper.py:1466-1478 (non-null among key fields).

Pure column arithmetic (least/when/+) — codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def confidence_score(field_count: Column, numeric_clusters: Column,
                     metadata_count: Column) -> Column:
    """A7: fields/10 (cap .5) + clusters/10 (cap .3) + metadata/5 (cap .2)
    + 0.1 completeness bonus (fields>=5 & clusters>=3 & metadata>=1), cap 1.0."""
    field_score = F.least(field_count.cast("double") / 10.0, F.lit(0.5))
    cluster_score = F.least(numeric_clusters.cast("double") / 10.0, F.lit(0.3))
    metadata_score = F.least(metadata_count.cast("double") / 5.0, F.lit(0.2))
    bonus = F.when(
        (field_count >= 5) & (numeric_clusters >= 3) & (metadata_count >= 1), 0.1
    ).otherwise(0.0)
    return F.least(field_score + cluster_score + metadata_score + bonus, F.lit(1.0))


def record_confidence(field_count: Column) -> Column:
    """A7 alt (scraper.py:670): 0.7 + 0.05·fields, cap 0.95."""
    return F.least(F.lit(0.7) + 0.05 * field_count.cast("double"), F.lit(0.95))


def cluster_confidence(field_types: Column, metadata_count: Column) -> Column:
    """A7 cluster variant (scraper.py:1371-1392):
    (min(types·10, 60) + 10·metadata) / 100, cap 1.0."""
    base = F.least(field_types.cast("double") * 10.0, F.lit(60.0))
    return F.least((base + 10.0 * metadata_count.cast("double")) / 100.0, F.lit(1.0))


def field_count(*cols: Column) -> Column:
    """A9: count of non-null among the given columns (one codegen'd sum)."""
    return sum(
        (F.when(c.isNotNull(), 1).otherwise(0) for c in cols), start=F.lit(0)
    ).cast("int")
