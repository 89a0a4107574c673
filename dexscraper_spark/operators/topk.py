"""Top-k / ranking operators (SURVEY §2.6 T1-T4).

Reference parity: get_top_tokens (dexscraper/models.py:377-381) sorts by
(confidence_score desc, field_count desc) and takes N; RankBy/Order source
ranking (dexscraper/config.py:30-51, 268-271); result caps
(dexscraper/protocol.py:352 etc.).

Scale note: ``orderBy(...).limit(n)`` compiles to ``TakeOrderedAndProject``
— each partition keeps an n-element heap and the driver merges
n·numPartitions rows. No global sort, no full shuffle; this is the plan you
want at 100 TB and Catalyst picks it automatically from the declarative
form. Never implement top-k as sort-then-head over a collected result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(df: DataFrame, n: int, *order_cols: Column | str,
          descending: bool = True) -> DataFrame:
    """Generic top-k. String keys get desc/asc nulls-last ordering per
    ``descending``; Column keys are used as-is (pass ``.desc()``/``.asc()``
    yourself for mixed-direction ordering)."""
    cols = []
    for c in order_cols:
        if isinstance(c, str):
            col = F.col(c)
            cols.append(col.desc_nulls_last() if descending else col.asc_nulls_last())
        else:
            cols.append(c)
    return df.orderBy(*cols).limit(n)


def top_tokens(tokens: DataFrame, n: int = 10,
               tiebreak: str | None = None) -> DataFrame:
    """T1: the reference's exact tie-breaking — (confidence_score,
    field_count) both descending (models.py:379-381). The reference keeps
    arrival order among full ties; pass ``tiebreak`` (a unique column) for
    a deterministic total order instead — required for reproducible LIMITs
    under distributed execution."""
    order = [
        F.col("confidence_score").desc_nulls_last(),
        F.col("field_count").desc_nulls_last(),
    ]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return tokens.orderBy(*order).limit(n)
