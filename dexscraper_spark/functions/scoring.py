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
    # NULL counts contribute 0, as in the reference (its counters are
    # plain ints defaulting to 0). Without the coalesce, F.least SKIPS
    # NULLs, so a NULL count would contribute its CAP: confidence_score
    # (NULL, NULL, NULL) scored a perfect 1.0 and junk rows outranked
    # real tokens in every confidence-ordered top-k.
    fc = F.coalesce(field_count.cast("double"), F.lit(0.0))
    nc = F.coalesce(numeric_clusters.cast("double"), F.lit(0.0))
    mc = F.coalesce(metadata_count.cast("double"), F.lit(0.0))
    field_score = F.least(fc / 10.0, F.lit(0.5))
    cluster_score = F.least(nc / 10.0, F.lit(0.3))
    metadata_score = F.least(mc / 5.0, F.lit(0.2))
    bonus = F.when(
        (field_count >= 5) & (numeric_clusters >= 3) & (metadata_count >= 1), 0.1
    ).otherwise(0.0)
    return F.least(field_score + cluster_score + metadata_score + bonus, F.lit(1.0))


def record_confidence(field_count: Column) -> Column:
    """A7 alt (scraper.py:670): 0.7 + 0.05·fields, cap 0.95."""
    fc = F.coalesce(field_count.cast("double"), F.lit(0.0))
    return F.least(F.lit(0.7) + 0.05 * fc, F.lit(0.95))


def cluster_confidence(field_types: Column, metadata_count: Column) -> Column:
    """A7 cluster variant (scraper.py:1371-1392):
    (min(types·10, 60) + 10·metadata) / 100, cap 1.0."""
    ft = F.coalesce(field_types.cast("double"), F.lit(0.0))
    mc = F.coalesce(metadata_count.cast("double"), F.lit(0.0))
    base = F.least(ft * 10.0, F.lit(60.0))
    return F.least((base + 10.0 * mc) / 100.0, F.lit(1.0))


def field_count(*cols: Column) -> Column:
    """A9: count of non-null among the given columns (one codegen'd sum)."""
    return sum(
        (F.when(c.isNotNull(), 1).otherwise(0) for c in cols), start=F.lit(0)
    ).cast("int")


def trending_score(volume: Column, change: Column, txns: Column) -> Column:
    """Derived trending metric replacing the server-computed trendingScore*
    the reference can only request, never compute (config.py:30-45).

    Saturating rational blend — volume momentum, price change, activity:
        0.5·v/(v+1e5) + 0.3·clamp(change/100, [-1, 1]) + 0.2·t/(t+1000)
    Pure arithmetic (no ln/exp): bit-identical across engines and at any
    parallelism; each term is bounded so no single metric dominates.
    NULL metrics contribute 0.
    """
    v = F.coalesce(volume.cast("double"), F.lit(0.0))
    c = F.coalesce(change.cast("double"), F.lit(0.0))
    t = F.coalesce(txns.cast("double"), F.lit(0.0))
    vol_term = F.when(v > 0, v / (v + F.lit(100_000.0))).otherwise(F.lit(0.0))
    chg_term = F.greatest(F.least(c / F.lit(100.0), F.lit(1.0)), F.lit(-1.0))
    txn_term = F.when(t > 0, t / (t + F.lit(1000.0))).otherwise(F.lit(0.0))
    return (F.lit(0.5) * vol_term + F.lit(0.3) * chg_term
            + F.lit(0.2) * txn_term)


def trending_score_sql(volume: str, change: str, txns: str) -> str:
    """DuckDB rendering of ``trending_score`` (same bits)."""
    v = f"COALESCE(CAST({volume} AS DOUBLE), 0.0)"
    c = f"COALESCE(CAST({change} AS DOUBLE), 0.0)"
    t = f"COALESCE(CAST({txns} AS DOUBLE), 0.0)"
    return (
        f"(0.5 * (CASE WHEN {v} > 0 THEN {v} / ({v} + 100000.0) ELSE 0.0 END)"
        f" + 0.3 * greatest(least({c} / 100.0, 1.0), -1.0)"
        f" + 0.2 * (CASE WHEN {t} > 0 THEN {t} / ({t} + 1000.0) ELSE 0.0 END))"
    )
