"""Property-based tests (hypothesis): decode round-trips arbitrary valid
pair values; the band join is exactly the naive range join; clean_string
matches its reference model on arbitrary strings."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# -- decode round-trip (pure Python, fast, many examples) -------------------

metric = st.floats(min_value=1e-9, max_value=1e12, allow_nan=False,
                   allow_infinity=False)
symbol = st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ", min_size=2, max_size=8)


@given(price=metric, vol=metric, liq=metric, sym=symbol,
       ts=st.integers(min_value=1, max_value=4102444799))
@settings(max_examples=200, deadline=None)
def test_decode_roundtrip_property(price, vol, liq, sym, ts):
    from dexscraper_spark.sources.binary import make_frame
    from dexscraper_spark.sources.decode import parse_frame
    pair = {
        "chain": "solana", "protocol": "pumpfun",
        "pair_address": "PAIRXXXXXXXXXXXXXXXXXXXXXXXXXXXXX",
        "base_token_name": "Name", "base_token_symbol": sym,
        "base_token_address": "MINTXXXXXXXXXXXXXXXXXXXXXXXXXXXXX",
        "price": price, "price_usd": price, "price_change_h24": 1.5,
        "liquidity_usd": liq, "volume_h24": vol, "fdv": liq * 2,
        "created_at": float(ts),
    }
    rows = parse_frame(make_frame([pair]))
    assert len(rows) == 1
    r = rows[0]
    assert r["price"] == price            # exact f64 round-trip
    assert r["volume_h24"] == vol
    assert r["liquidity_usd"] == liq
    assert r["created_at"] == ts
    assert r["base_token_symbol"] == sym


@given(noise=st.binary(min_size=0, max_size=2048))
@settings(max_examples=200, deadline=None)
def test_decode_never_crashes_on_garbage(noise):
    from dexscraper_spark.sources.decode import parse_frame
    rows = parse_frame(noise)           # must not raise, ever
    assert isinstance(rows, list)


# -- clean_string reference model over arbitrary strings --------------------

def _clean_model(s: str | None) -> str:
    if not s:
        return ""
    cleaned = "".join(ch for ch in s if 32 <= ord(ch) < 127 or ord(ch) == 9)
    if "@" in cleaned or "\\" in cleaned:
        return cleaned.split("@")[0].split("\\")[0]
    return cleaned.strip()


@given(st.lists(st.text(max_size=40), min_size=1, max_size=24))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_clean_string_matches_model(spark, texts):
    from pyspark.sql import functions as F
    from dexscraper_spark.functions.cleaning import clean_string
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [r["o"] for r in df.select(clean_string(F.col("s")).alias("o")).collect()]
    assert got == [_clean_model(t) for t in texts]


# -- band join == naive range join on random positions ----------------------

@given(
    lpos=st.lists(st.integers(min_value=-10_000, max_value=10_000),
                  min_size=1, max_size=30),
    rpos=st.lists(st.integers(min_value=-10_000, max_value=10_000),
                  min_size=1, max_size=30),
    radius=st.integers(min_value=1, max_value=5_000),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_band_join_equals_naive_property(spark, lpos, rpos, radius):
    from pyspark.sql import functions as F
    from dexscraper_spark.operators.proximity import band_range_join
    left = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(lpos)], "lid int, lp double")
    right = spark.createDataFrame(
        [(j, float(p)) for j, p in enumerate(rpos)], "rid int, rp double")
    banded = band_range_join(left, right, left_pos="lp", right_pos="rp",
                             radius=float(radius))
    got = sorted((r["lid"], r["rid"]) for r in banded.collect())
    want = sorted((i, j) for i, lp in enumerate(lpos)
                  for j, rp in enumerate(rpos) if abs(lp - rp) <= radius)
    assert got == want


@given(seeds=st.lists(st.integers(min_value=0, max_value=1000),
                      min_size=1, max_size=6))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_spark_decode_equals_python_decode(spark, seeds):
    """The mapInPandas kernel must produce exactly parse_frame's rows —
    the Arrow crossing adds/loses nothing."""
    import pandas as pd
    from dexscraper_spark.sources.binary import make_frame, sample_pairs
    from dexscraper_spark.sources.decode import decode_messages, parse_frame
    frames = [make_frame(sample_pairs(3, seed=s)) for s in seeds]
    pdf = pd.DataFrame({"msg_id": range(len(frames)), "payload": frames})
    out = decode_messages(spark.createDataFrame(pdf).coalesce(1)).collect()
    got = sorted(
        (r["msg_id"], r["record_position"], r["base_token_symbol"], r["price"])
        for r in out)
    want = []
    for i, f in enumerate(frames):
        for rec in parse_frame(f):
            want.append((i, rec["record_position"],
                         rec.get("base_token_symbol"), rec.get("price")))
    assert got == sorted(want)
