"""S1/S2 — the pushdown-capable Python DataSource (sources/frame_source).

Covers: filter pushdown visible in the physical plan and honored inside
the scan, partial pushdown (unsupported filters handed back to Spark),
the frames_dir file mode, and equality with the mapInPandas decode
kernel on identical frames."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    jqe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(jqe, "formatted")


def _source(spark):
    from dexscraper_spark.sources.frame_source import register_frame_source
    register_frame_source(spark)
    return spark.read.format("dexframes")


def test_pushdown_reaches_scan(spark):
    df = (_source(spark).option("n_frames", 8).load()
          .filter((F.col("chain") == "solana")
                  & (F.col("liquidity_usd") >= 51000.0)))
    plan = _plan(df)
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "EqualTo(chain,solana)" in pushed
    assert "GreaterThanOrEqual(liquidity_usd,51000.0)" in pushed
    rows = df.collect()
    # only pair j=2 (solana, liquidity 52000) survives per frame
    assert len(rows) == 8
    assert all(r["chain"] == "solana" and r["liquidity_usd"] >= 51000.0
               for r in rows)


def test_partial_pushdown_keeps_results_correct(spark):
    """A contains() filter is not in the supported set — the reader hands
    it back and Spark re-applies it post-scan; results stay correct."""
    df = (_source(spark).option("n_frames", 8).load()
          .filter(F.col("protocol").contains("ray")
                  & (F.col("chain") == "base")))
    rows = df.collect()
    assert len(rows) == 8   # pair j=1: base/raydium
    assert all(r["protocol"] == "raydium" for r in rows)
    plan = _plan(df)
    assert "EqualTo(chain,base)" in plan  # equality still pushed


def test_frames_dir_mode_roundtrip(spark, tmp_path):
    from dexscraper_spark.sources.binary import make_frame, sample_pairs
    for i in range(4):
        (tmp_path / f"frame_{i:03d}.bin").write_bytes(
            make_frame(sample_pairs(4, seed=i)))
    df = _source(spark).option("frames_dir", str(tmp_path)).load()
    assert df.count() == 16  # 4 frames x 4 pairs, no filters
    assert df.select("pair_address").distinct().count() > 4


def test_source_matches_decode_kernel(spark):
    """Same frames through the DataSource and through decode_messages
    (mapInPandas) must produce identical rows."""
    import pandas as pd
    from dexscraper_spark.sources.binary import make_frame, sample_pairs
    from dexscraper_spark.sources.decode import decode_messages
    pdf = pd.DataFrame({
        "msg_id": range(8),
        "payload": [make_frame(sample_pairs(4, seed=i % 13)) for i in range(8)],
    })
    kernel = decode_messages(spark.createDataFrame(pdf))
    src = _source(spark).option("n_frames", 8).load()
    cols = sorted(kernel.columns)
    a = sorted(tuple(r) for r in kernel.select(*cols).collect())
    b = sorted(tuple(r) for r in src.select(*cols).collect())
    assert a == b
