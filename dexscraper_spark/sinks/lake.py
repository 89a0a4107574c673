"""Data-lake layout writers — how the engine's tables persist at 100 TB.

The reference writes flat files per batch; at scale the layout IS the
performance model:

* ``write_tokens``: partition by ``chain`` (low-cardinality, the dominant
  filter dimension — partition pruning turns chain-scoped queries into
  directory listings), sort within files by ``confidence_score`` so
  top-k scans stop early under parquet min/max stats.
* ``write_ohlc``: partition by ``symbol_bucket`` (hash of symbol mod N —
  bounded directory fan-out even with millions of symbols) + ``bar_date``;
  time-range queries prune to day directories.
* ``write_bucketed``: saveAsTable with ``bucketBy(key)`` — repeated joins
  on the key (the orders⋈lineitem pattern) become shuffle-free, both
  sides pre-clustered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tokens(tokens: DataFrame, path: str, *,
                 files_per_chain: int = 16, mode: str = "overwrite") -> None:
    # salt the repartition: a bare repartition("chain") funnels each
    # chain (≤ a handful of values, one dominant) through ONE task — the
    # exact hot-key straggler/OOM skew.py exists to prevent. Two past
    # failure modes shape this:
    #   * the salt must come from a HIGH-CARDINALITY column —
    #     confidence_score collapses to ~6 discrete values here
    #     (record_confidence caps at 0.95), reaching at most 6 buckets
    #     and leaving the dominant capped value on one task;
    #   * the partition COUNT must be explicit — an unnumbered
    #     repartition is an AQE coalescing target, which merges the
    #     write back into one task on small batches.
    # Each of the ``files_per_chain`` tasks holds a uniform row sample of
    # every chain; the dynamic-partition writer splits it per chain
    # directory, so each chain writes files_per_chain sorted files (the
    # knob is simultaneously the write parallelism). Rows are sorted
    # (chain, confidence desc) within tasks so min/max early-stop still
    # holds per file.
    salt_cols = [c for c in ("token_address", "msg_id") if c in tokens.columns]
    if not salt_cols:
        # no id-like column: hash the whole row — minus MapType columns
        # (at any nesting), which xxhash64 rejects at analysis time
        from pyspark.sql.types import ArrayType, MapType, StructType

        def hashable(dt) -> bool:
            if isinstance(dt, MapType):
                return False
            if isinstance(dt, ArrayType):
                return hashable(dt.elementType)
            if isinstance(dt, StructType):
                return all(hashable(f.dataType) for f in dt.fields)
            return True

        salt_cols = [f.name for f in tokens.schema.fields
                     if hashable(f.dataType)]
        if not salt_cols:
            raise ValueError(
                "write_tokens: no hashable column to salt the repartition "
                "— add an id column (token_address / msg_id)")
    salt = F.xxhash64(*[F.col(c) for c in salt_cols], F.lit(7))
    (tokens
     .repartition(files_per_chain, salt)
     .sortWithinPartitions(F.col("chain"),
                           F.col("confidence_score").desc_nulls_last())
     .write.mode(mode).partitionBy("chain").parquet(path))


def write_ohlc(bars: DataFrame, path: str, *, n_symbol_buckets: int = 64,
               ts_col: str = "bucket_ts", mode: str = "overwrite") -> None:
    out = (bars
           .withColumn("symbol_bucket",
                       F.pmod(F.xxhash64("symbol"), F.lit(n_symbol_buckets)))
           .withColumn("bar_date", F.to_date(F.col(ts_col).cast("timestamp"))))
    (out.repartition("symbol_bucket", "bar_date")
     .write.mode(mode).partitionBy("symbol_bucket", "bar_date").parquet(path))


def write_bucketed(df: DataFrame, table: str, *, key: str,
                   n_buckets: int = 32, mode: str = "overwrite") -> None:
    (df.write.mode(mode)
     .bucketBy(n_buckets, key).sortBy(key)
     .format("parquet").saveAsTable(table))
