"""Physical-plan audits: the scale claims in the operator docstrings must
be visible in the executed plans — pushdown reaches the scan, small dims
broadcast, top-k compiles to TakeOrderedAndProject, aggregates are
partial (map-side combine), and the band range join never degenerates
into a nested-loop/cartesian product."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    jqe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(jqe, mode)


def test_flagship_pushdown_and_topk(spark):
    from dexscraper_spark.plans.flagship import flagship_top_revenue
    plan = plan_of(flagship_top_revenue(spark, SF_DIR))
    # shipdate predicate must reach the parquet scan
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    # column pruning: the lineitem scan reads only the 4 needed columns
    read_schemas = [seg[:300] for seg in plan.split("ReadSchema: ")[1:]]
    lineitem_schema = next(s for s in read_schemas if "l_orderkey" in s)
    assert "l_comment" not in lineitem_schema and "l_tax" not in lineitem_schema
    # top-10 is a TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_broadcast_join_on_dims(spark):
    from dexscraper_spark.plans.registry import queries
    plan = plan_of(queries()["join_revenue_by_nation"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_customers_take_ordered(spark):
    from dexscraper_spark.plans.registry import queries
    plan = plan_of(queries()["topk_customers"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_partial_aggregation(spark):
    """groupBy aggs must show partial + final HashAggregate (map-side
    combine → shuffle carries one row per group per partition)."""
    from dexscraper_spark.plans.registry import queries
    plan = plan_of(queries()["agg_pricing_summary"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_band_join_is_hash_join(spark):
    """The range join must execute as an equi hash/sort-merge join on the
    band key — never a nested-loop over the cross product."""
    from dexscraper_spark.plans.registry import queries
    plan = plan_of(queries()["join_range_proximity"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) \
        or ("BroadcastHashJoin" in plan)


def test_filter_dsl_pushdown(spark):
    from dexscraper_spark.plans.registry import queries
    plan = plan_of(queries()["filter_range_dsl"](spark, SF_DIR))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:500]
    assert "l_extendedprice" in pushed and "l_quantity" in pushed


def test_whole_stage_codegen_scalars(spark):
    """Scalar pipelines (classification CASE etc.) stay inside
    WholeStageCodegen — no Python evaluation nodes."""
    from dexscraper_spark.plans.registry import queries
    plan = plan_of(queries()["filter_suite"](spark, SF_DIR))
    assert "codegen id" in plan  # formatted mode's WholeStageCodegen marker
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decode_is_single_python_stage(spark):
    """The decode kernel is the engine's only Python stage: exactly one
    MapInPandas node, and downstream aggregation is JVM-side."""
    from dexscraper_spark.plans.registry import queries
    plan = plan_of(queries()["decode_binary_pipeline"](spark, SF_DIR))
    # exactly one numbered MapInPandas node (the tree echo prints it twice)
    assert sum(1 for line in plan.splitlines()
               if line.strip().startswith("(") and "MapInPandas" in line) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_document_exporters_bounded_before_collect(spark):
    """K6-K9 document builders must cap input with TakeOrderedAndProject
    (per-partition heaps) before any global collect_list — no unbounded
    single-partition aggregation over the full frame."""
    from pyspark.sql import functions as F
    from dexscraper_spark.sinks.exporters import bounded_latest
    ev = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("ts"),
        F.col("o_totalprice").alias("open"),
        F.col("o_totalprice").alias("high"),
        F.col("o_totalprice").alias("low"),
        F.col("o_totalprice").alias("close"),
        F.col("o_totalprice").alias("volume"),
    )
    bounded = bounded_latest(ev, order_col="ts", top_n=50)
    doc_plan = plan_of(
        bounded.select(F.struct("ts", "open").alias("s"))
        .agg(F.sort_array(F.collect_list("s")).alias("arr")))
    assert "TakeOrderedAndProject" in doc_plan
    # the collect_list agg consumes the bounded side, not the raw scan:
    # TakeOrdered appears below the ObjectHashAggregate in the tree
    agg_pos = doc_plan.find("ObjectHashAggregate")
    take_pos = doc_plan.find("TakeOrderedAndProject")
    assert agg_pos != -1 and take_pos != -1


def test_streaming_demo_source_no_row_udf(spark):
    """The rate-source frame generator must be an Arrow-batched
    mapInPandas stage (like decode), never a row-at-a-time Python UDF
    (BatchEvalPython)."""
    from dexscraper_spark.streaming.pipeline import rate_frame_stream
    raw = rate_frame_stream(spark, rows_per_second=1, pairs_per_frame=2)
    plan = plan_of(raw, mode="extended")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_percentiles_no_object_hash_aggregate(spark):
    """agg_percentiles must stay on the sort-based two-pass plan — a
    spillable WindowExec + codegen'd HashAggregate — never the
    ObjectHashAggregate full-group buffer F.percentile compiles to."""
    from dexscraper_spark.plans.registry import queries
    plan = plan_of(queries()["agg_percentiles"](spark, SF_DIR))
    assert "ObjectHashAggregate" not in plan
    assert "Window" in plan
    assert "HashAggregate" in plan and "partial_" in plan


def test_percentiles_keep_all_null_groups(spark, tmp_path):
    """quantile_cont semantics: NULL values are ignored inside a group,
    but a group whose values are ALL NULL stays in the result with NULL
    percentiles — the sort-based rewrite must not pre-filter it away."""
    import datetime

    import duckdb
    t0 = datetime.datetime(2025, 1, 1)
    rows = [(i, t0, i, et, v, "{}") for i, (et, v) in enumerate(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", None), ("b", None)])]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]) \
        .write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    # reuse the registered builder against the synthetic table dir
    from dexscraper_spark.plans.registry import all_queries
    q = all_queries()["agg_percentiles"]
    got = {r.event_type: (r.p50, r.p95, r.p99)
           for r in q.build(spark, str(tmp_path)).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet/*.parquet')")
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(q.oracle).fetchall()}
    assert got == want
    assert got["b"] == (None, None, None)


def test_exact_cosine_pairs_plan_shape(spark):
    """BLAS-filter cosine dedup: exactly one Python stage (the per-block
    Gram candidate generator) and equi-joins for the verify step — never
    a cartesian pair product."""
    from dexscraper_spark.plans.registry import queries
    df = queries()["dedup_embedding_cosine"](spark, SF_DIR)
    assert plan_of(df, "simple").count("FlatMapGroupsInPandas") == 1
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_multiprobe_plan_is_equi_join(spark):
    """Multiprobe expands only the query side; candidate generation must
    stay an equi-join on (band, bits) with no nested-loop fallback."""
    from dexscraper_spark.plans.registry import queries
    plan = plan_of(queries()["similarity_lsh_bucketed"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) \
        or ("BroadcastHashJoin" in plan)


def test_prepared_plan_cache_is_a_plan_not_a_result(spark, tmp_path):
    """The registry's prepared-plan cache caches RESOLUTION, not results:
    each call re-executes (a shared executed DataFrame would replay
    AQE-materialized shuffle stages), the builder runs once, and a
    replaced source fails LOUDLY with Spark's own stale-listing error —
    catalog semantics, with clear_plan_cache() as the REFRESH."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from dexscraper_spark.plans import registry as R

    calls = {"n": 0}
    path = str(tmp_path / "fresh.parquet")
    spark.range(5).write.mode("overwrite").parquet(path)

    @R.register("___cache_probe", None)
    def ___cache_probe(sp, sf_dir):
        calls["n"] += 1
        return sp.read.parquet(path).groupBy().count()

    try:
        build = R.all_queries()["___cache_probe"].build
        assert build(spark, "x").collect()[0][0] == 5
        assert build(spark, "x").collect()[0][0] == 5  # re-executes fine
        assert calls["n"] == 1  # resolved once
        spark.range(9).write.mode("overwrite").parquet(path)
        # stale file listing is LOUD (never silently wrong)...
        with pytest.raises(Py4JJavaError, match="FILE_NOT_EXIST|does not exist"):
            build(spark, "x").collect()
        # ...and clear_plan_cache() is the REFRESH
        R.clear_plan_cache()
        assert build(spark, "x").collect()[0][0] == 9
        assert calls["n"] == 2
    finally:
        R._REGISTRY.pop("___cache_probe", None)
        R.clear_plan_cache()


def test_no_rdd_access_in_engine():
    """The engine is pure-DataFrame: no `.rdd` access anywhere (the RDD
    API bypasses Catalyst and its lineage construction is not free)."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[1] / "dexscraper_spark"
    hits = []
    for py in pkg.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if re.search(r"\.rdd\b", line):
                hits.append(f"{py.name}:{i}: {line.strip()}")
    assert not hits, f"RDD API access in engine code: {hits}"


def test_clear_plan_cache_clears_table_cache(spark, tmp_path):
    """REFRESH coherence: clear_plan_cache() also drops the table-
    resolution cache, so a rebuilt plan re-resolves its tables against
    current files instead of silently reusing a stale listing."""
    from dexscraper_spark.plans import registry as R
    from dexscraper_spark.sources import tables as T

    sf_dir = str(tmp_path)
    spark.range(4).write.mode("overwrite").parquet(f"{sf_dir}/part.parquet")
    df1 = T.load_table(spark, sf_dir, "part")
    assert T.load_table(spark, sf_dir, "part") is df1  # memoized
    R.clear_plan_cache()
    df2 = T.load_table(spark, sf_dir, "part")
    assert df2 is not df1  # re-resolved after REFRESH


def test_tune_session_reasserts_utc_on_memo_hit(spark):
    """The memoized tune_session still re-pins the session timezone:
    external code flipping it must not silently skew catalog epoch math."""
    from dexscraper_spark.session import tune_session
    tune_session(spark)  # ensure memoized
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    tune_session(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_chunk_token_stream_plan_one_range_shuffle_no_window(spark):
    """The distributed prefix sum must cost ONE range shuffle: the
    partition-local cumsum is an Arrow map (MapInPandas), never a
    Window.partitionBy(pid) — which would hash-shuffle the whole table
    a second time — and the offsets table joins back broadcast."""
    from pyspark.sql import functions as F

    import dexscraper_spark.persist as P
    from dexscraper_spark.functions.textstats import token_count
    from dexscraper_spark.operators.packing import chunk_token_stream

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", token_count(F.col("text"))
                    .cast("long").alias("n_tokens")))
    plan = plan_of(chunk_token_stream(docs, max_tokens=512,
                                      num_partitions=8))
    # (the cached cumsum branch appears twice in the formatted plan —
    # once as the InMemoryRelation's stored build plan — so assert on
    # operator PRESENCE, not counts)
    assert "Window" not in plan
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "rangepartitioning" in plan
    assert "Exchange hashpartitioning" not in plan
    P.release_tracked()


def test_stratified_sample_plan_broadcast_no_data_shuffle(spark):
    """The per-stratum counts join back BROADCAST; the sampled table
    itself is never hash-shuffled for the join (the only exchange the
    candidates pay is the window rank over the ~n-per-stratum candidate
    set)."""
    from dexscraper_spark.operators.sampling import stratified_sample_exact
    import dexscraper_spark.persist as P

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "lang")
    out = stratified_sample_exact(docs, strata_cols=["lang"],
                                  n_per_stratum=3, key_col="doc_id")
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    P.release_tracked()


def test_semantic_dedup_plan_no_cartesian(spark):
    """Semantic dedup's survivor frame: the only pair generation is the
    per-cluster Gram kernel (one Python stage) and the anti-join is an
    equi-join — never a cartesian product over the corpus. (The
    centroid fit is driver-side on a bounded sample, so nothing here
    depends on an MLlib transform plan.)"""
    from dexscraper_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    out = semantic_dedup(emb, nlist=4, threshold=0.4)
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # survivors = corpus LEFT ANTI losers-artifact-scan
    assert "LeftAnti" in plan


def test_importance_resample_plan_shapes(spark):
    """The selection plan: no cartesian pair products anywhere, and the
    final draw is TakeOrderedAndProject (per-partition heaps) — the
    only Window nodes are lm_score's two lag windows (one per LM side,
    documented design); the draw itself must not add a ranking
    window."""
    from pyspark.sql import functions as F

    from dexscraper_spark.operators.lm import lm_train
    from dexscraper_spark.operators.sampling import importance_resample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "lang", "text").filter(F.col("doc_id") < 300)
    target = lm_train(docs.filter(F.col("lang") == "en")
                      .select("text"), n=2)
    raw = lm_train(docs.select("text"), n=2)
    out = importance_resample(docs, target, raw, n=20, lm_order=2)
    plan = plan_of(out)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert plan_of(out, "simple").count("Window") == 2


def test_assign_roles_single_pass(spark):
    """r12 optimization: the role pivot + quote pick must be ONE
    aggregation over ONE copy of the upstream subtree — the former
    two-branch form full-outer-joined two filtered aggregates, which
    re-evaluated the whole decode + band join per branch (two MapInPandas
    decodes and three Exchanges where one of each suffices)."""
    from dexscraper_spark.operators.proximity import assign_roles
    joined = spark.createDataFrame(
        [(1, 100.0, 130.0, "AAA", "potential_contract"),
         (1, 100.0, 105.0, "So1", "SOL_token"),
         (2, 50.0, 60.0, "BBB", None)],  # NULL type: dropped, key 2 gone
        "tok int, tpos double, mpos double, addr string, atype string")
    out = assign_roles(joined, left_key="tok", left_pos="tpos",
                       right_pos="mpos", value_col="addr", type_col="atype",
                       quote_type="SOL_token")
    plan = plan_of(out)
    # single aggregation pass: no join between role and quote branches
    assert "Join" not in plan
    # one exchange total (the explicit left_key repartition)
    assert plan_of(out, "simple").count("Exchange") == 1
    rows = {r["tok"]: r for r in out.collect()}
    assert set(rows) == {1}  # key 2 had only a NULL-type row -> dropped
    assert rows[1]["token_address"] == "AAA"
    assert rows[1]["quote_address"] == "So1"
    assert rows[1]["pair_address"] is None


def test_min_by_ignores_null_ordering(spark):
    """Pin the Spark semantic the single-pass assign_roles relies on:
    min_by skips rows whose ORDERING expression is NULL, so a
    when-wrapped ordering restricts the aggregate to the quote subset."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", None)], "k int, v string, o double")
    out = df.groupBy("k").agg(
        F.min_by(F.when(F.col("o") > 2, F.col("v")),
                 F.when(F.col("o") > 2, F.col("o"))).alias("m")).collect()
    assert out[0]["m"] == "a"


def test_tokens_pipeline_decodes_frames_once(spark):
    """r12 optimization: the decoded token projection is persisted, so
    the band-join lane and the enrichment lane share ONE MapInPandas
    decode (Catalyst shares no subtrees — without the persist each lane
    re-ran the whole frame decode)."""
    import re

    from dexscraper_spark.persist import release_tracked
    from dexscraper_spark.plans.tokens_pipeline import trending_top_tokens
    try:
        out = trending_top_tokens(spark, n_frames=2, limit=3,
                                  tiebreak="token_address")
        plan = plan_of(out)
        # exactly one decode NODE in the numbered operator details
        # (the cached subtree is scanned by both lanes)
        assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
        assert plan.count("InMemoryTableScan") >= 2
        assert out.count() == 3  # the persisted form still computes
    finally:
        release_tracked()


def test_multimodal_pipeline_single_payload_pass(spark):
    """r12 optimization: multimodal_pipeline runs the fused
    meta+features kernel — ONE MapInPandas over the payloads and one
    grouped aggregation, no join of separate meta/feature aggregates."""
    import re

    from dexscraper_spark.plans.registry import queries
    df = queries()["multimodal_pipeline"](spark, SF_DIR)
    plan = plan_of(df)
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "Join" not in plan


def test_curation_gate_single_arrow_pass(spark):
    """r12 change #8: the curation gate computes its three metrics in
    ONE MapInArrow node (no Generate explode barrier, no HOF metric
    forest) and the gate predicates stay JVM filters above it."""
    import re

    from dexscraper_spark.plans.curation import CurationConfig, _gate
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(_gate(docs, "doc_id", "text", CurationConfig()))
    assert len(re.findall(r"\(\d+\) MapInArrow", plan)) == 1
    assert "Generate" not in plan
    assert "Filter" in plan  # gate predicates still JVM-side


def test_text_metrics_single_arrow_pass(spark):
    """r12 change #9: the registered text_metrics row is ONE MapInArrow
    pass (metrics-only output, no payload re-emitted, no HOF folds)."""
    import re

    from dexscraper_spark.plans.registry import queries
    plan = plan_of(queries()["text_metrics"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) MapInArrow", plan)) == 1
    assert "aggregate(" not in plan  # no HOF token folds remain
