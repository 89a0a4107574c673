"""End-to-end tokens pipeline test: decode → enrich → score → top-k,
asserting the enrichment picked the record-local addresses and roles."""

from __future__ import annotations


def test_e2e_enrichment_roles_and_ranking(spark):
    from dexscraper_spark.plans.tokens_pipeline import trending_top_tokens
    rows = trending_top_tokens(spark, n_frames=4, limit=16).collect()
    assert len(rows) == 16  # 4 frames × 4 pairs
    for r in rows:
        # roles must come from the same record window (positions 40/120 of
        # the record's 512-byte slot → MINTADDR/PAIRADDR of that record)
        assert r["token_address"].startswith("MINTADDR")
        assert r["pair_address"].startswith("PAIRADDR")
        assert r["quote_address"].startswith("So1111")
        assert r["field_count"] >= 8
        assert 0.7 <= r["confidence_score"] <= 0.95
    # ranking: confidence desc then field_count desc — stable, no nulls
    confs = [r["confidence_score"] for r in rows]
    assert confs == sorted(confs, reverse=True)


def test_e2e_role_positions_match_record(spark):
    """The MINTADDRxxyy suffix encodes (msg, record) — enrichment must bind
    each token to ITS record's addresses, not a neighbor's."""
    from dexscraper_spark.plans.tokens_pipeline import (
        extract_tokens, synthetic_metadata)
    import pandas as pd
    from dexscraper_spark.sources.binary import make_frame, sample_pairs
    pdf = pd.DataFrame({
        "msg_id": range(2),
        "payload": [make_frame(sample_pairs(4, seed=i)) for i in range(2)],
    })
    raw = spark.createDataFrame(pdf).coalesce(1)
    out = extract_tokens(raw, synthetic_metadata(spark, 2)).collect()
    for r in out:
        msg, rec = r["msg_id"], r["tpos"] // 512
        assert r["token_address"] == f"MINTADDR{msg:02d}{rec:02d}" + "m" * 24
        assert r["pair_address"] == f"PAIRADDR{msg:02d}{rec:02d}" + "p" * 24
