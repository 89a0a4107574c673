"""Differential test harness — the oracle gate on an ADVERSARIAL corpus.

`tools/check_oracle.py` proves Spark ≡ DuckDB on the driver's generated
testdata; this harness re-runs the same cross-check on a synthetic corpus
full of edge inputs the generated data never exercises — unicode, empty
and whitespace-only text, duplicate documents, extreme magnitudes,
grid-tie values, NULL-bearing nullable columns, missing JSON keys — so a
latent engine-semantics divergence (regex unicode classes, printf
rounding, NULL propagation) surfaces here instead of in production.

The corpus stays INSIDE the table contract (TESTDATA.md): columns that
the generated data never leaves NULL (event value, document text) stay
non-NULL here too; adversarial ≠ impossible.

Usage: python tools/difftest.py [query ...]
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose inputs are only events/documents (the two synthesized
# tables) and whose semantics are deterministic row/group-local.
DEFAULT_QUERIES = [
    "agg_event_stats", "agg_percentiles", "ohlc_bars", "filter_suite",
    "scalar_events_suite", "scalar_docs_suite", "set_ops",
    "sessionize_users", "window_moving_sum", "window_first_wins",
    "text_metrics", "text_lang", "text_fingerprint_dups",
    "dedup_exact_docs", "dedup_simhash", "rank_trending",
    "sink_csv_lines", "sink_bar_rows",
    "sink_excel", "sink_document_rows", "sink_text_lines",
    "sketch_kmv_distinct",
    "similarity_topk", "embedding_norms", "dedup_embedding_cosine",
    "similarity_ivf_full_probe", "similarity_lsh_bucketed",
    "join_range_proximity", "join_nearest_click", "join_asof_click",
    "window_ordinal_pivot",
    "scoring_confidence", "fallback_prefer_first", "ohlc_snapshot_compat",
    "symbols_blacklist_topk", "scan_metadata_patterns", "dedup_minhash_lsh",
    "topk_customers", "scalar_misc_suite", "curation_pipeline",
    "agg_pricing_summary",
    "agg_rollup", "filter_range_dsl", "flagship_topk_revenue",
    "join_revenue_by_nation",
]

T0 = datetime.datetime(2025, 3, 1, 0, 0, 0)


def adversarial_events():
    """Edge-value events: extremes, grid ties, dense duplicates, sparse
    users/types, NULL props — value stays non-NULL per the contract."""
    rows = []
    # NOT included, deliberately (documented engine-vs-DuckDB printf
    # divergences, out of the generated-data contract):
    #  * exact X.XX5 printf ties (e.g. 2.675, 1.005) — Java HALF_UP vs
    #    C half-even disagree at the tie, see scalars_catalog docstring;
    #  * magnitudes > ~4.5e7 through %.8f lanes — Java pads the shortest
    #    decimal repr while C expands exact binary, diverging once
    #    ulp(v) exceeds the printed precision.
    values = [
        0.5, 1.5, 2.0, 100.0, 99.999999, 1e-6, 9.99e-2, 0.1, 10.0,
        49999.0, 50000.0, 50001.0, 1e5, 1e7, 1e4, 1e6, -100.0,
        1000.0, 1000.5, -99.5, 9.9e6, 1.1e-14, 123456.789, 0.005,
        2.67, 1.013, 0.125, 3.0, 7.0,
    ]
    props = ['{"k": 1}', '{"k": 42}', '{"nope": 1}', "{}", None,
             '{"k": null}', '{"k": 7}']
    types = ["click", "purchase", "error", "view"]
    for i, v in enumerate(values):
        rows.append((
            i,
            T0 + datetime.timedelta(minutes=7 * i, seconds=i % 50),
            i % 5,
            types[i % len(types)],
            v,
            props[i % len(props)],
        ))
    # a user with a single event (sessionize edge) and one far-future
    # event (gap > session timeout, new session)
    rows.append((100, T0 + datetime.timedelta(days=2), 99, "click", 2.5,
                 '{"k": 3}'))
    rows.append((101, T0 + datetime.timedelta(days=2, hours=3), 99,
                 "purchase", 3.5, '{"k": 4}'))
    return rows


def adversarial_documents():
    """Edge-text documents: unicode, empty, whitespace, punctuation-only,
    exact duplicates, shared 30-char prefixes, long repetitive text."""
    texts = [
        "",                                   # empty
        "   \t  ",                            # whitespace only
        "!!! ??? ;;; ///",                    # punctuation only
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",   # exact dup
        "ümlaut Ärger straße çédille ñandú",  # unicode
        "el rápido zorro marrón salta sobre el perro perezoso",
        "le renard brun rapide saute par dessus le chien paresseux",
        "der schnelle braune fuchs springt über den faulen hund",
        "a" * 500,                            # long single-token
        ("word " * 200).strip(),              # long many-token
        "the quick brown fox jumps differently this time entirely",
        "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",    # case variant
        "12345 67890 numbers only 54321",
        "mixed ünïcode and ascii tökens here",
    ]
    langs = ["en", "es", "fr", "de", "en"]
    sources = ["web", None, "", "Wiki-Source!", "x" * 40]
    return [
        (i, t, langs[i % len(langs)], sources[i % len(sources)], len(t))
        for i, t in enumerate(texts)
    ]


def adversarial_embeddings():
    """Edge vectors: near-zero norm, exact duplicates, orthogonal pairs,
    negated pairs, one-hot, constant — the cases cosine math trips on."""
    import math
    dim = 64
    def vec(f):
        return [float(f(i)) for i in range(dim)]
    vecs = [
        vec(lambda i: 1.0 if i == 0 else 0.0),          # one-hot e0
        vec(lambda i: 1.0 if i == 1 else 0.0),          # one-hot e1 (orthogonal)
        vec(lambda i: -1.0 if i == 0 else 0.0),         # -e0 (cosine -1 with e0)
        vec(lambda i: 0.5),                             # constant
        vec(lambda i: 0.5),                             # exact duplicate
        vec(lambda i: 1e-6),                            # near-zero norm
        vec(lambda i: 0.0),                             # exact zero (0/0 cosine)
        vec(lambda i: math.sin(i + 1)),                 # generic
        vec(lambda i: math.sin(i + 1)),                 # duplicate of generic
        vec(lambda i: math.cos(i + 1)),
        vec(lambda i: (i % 5) - 2.0),
        vec(lambda i: (-1) ** i * (i + 1) / dim),
        vec(lambda i: 1.0 / (i + 1)),
    ]
    return [(i, v, i % 3) for i, v in enumerate(vecs)]


def adversarial_tpch():
    """Tiny relational tables with the classic edge rows: tie balances,
    NULL-able columns left NULL, boundary dates/discounts, one-row
    groups, dangling foreign keys."""
    import datetime as dt
    region = [(0, "AMERICA"), (1, "ASIA")]
    nation = [(0, "BRAZIL", 0), (1, "CANADA", 0), (2, "JAPAN", 1),
              (3, "INDIA", 1)]
    customer = [
        (1, "cust one", 0, 100.0, "BUILDING"),
        (2, "cust two", 1, 100.0, "AUTOMOBILE"),   # tie with 1
        (3, "cust three", 2, -5.5, "BUILDING"),    # negative balance
        (4, "cust four", 3, 0.0, "MACHINERY"),
        (5, "cust five", 0, None, "BUILDING"),     # NULL balance
        (6, "cust six", 1, 100.0, "FURNITURE"),    # triple tie
    ]
    d = dt.datetime
    orders = [
        (10, 1, "O", 1000.0, d(1996, 12, 31, 23, 59, 59), "1-URGENT"),
        (11, 2, "F", 2000.0, d(1997, 1, 1, 0, 0, 0), "2-HIGH"),   # boundary in
        (12, 3, "O", 2000.0, d(1997, 3, 31, 23, 59, 59), "3-MEDIUM"),
        (13, 4, "F", 500.0, d(1997, 4, 1, 0, 0, 0), "4-NOT SPEC"),  # boundary out
        (14, 5, "O", 750.0, d(1995, 6, 15, 12, 0, 0), "5-LOW"),
        (15, 1, "O", 750.0, d(1997, 2, 2, 2, 2, 2), "1-URGENT"),
    ]
    lineitem = [
        # orderkey, partkey, suppkey, linenum, qty, extprice, discount,
        # tax, returnflag, linestatus, shipdate
        (10, 1, 1, 1, 5.0, 1000.0, 0.0, 0.0, "N", "O", d(1996, 1, 10)),
        (10, 2, 1, 2, 10.0, 2000.0, 0.1, 0.05, "N", "O", d(1996, 2, 10)),
        (11, 3, 2, 1, 45.0, 45000.0, 0.05, 0.08, "R", "F", d(1995, 3, 1)),
        (12, 1, 2, 1, 50.0, 500.0, 1.0, 0.0, "A", "F", d(1994, 12, 31)),  # 100% discount
        (13, 2, 3, 1, 1.0, 0.01, 0.0, 0.0, "R", "O", d(1997, 6, 1)),      # one-row group
        (14, 3, 3, 1, 30.0, 30000.0, 0.02, 0.01, "N", "F", d(1996, 7, 4)),
        (15, 1, 1, 1, 25.0, 12500.0, 0.04, 0.02, "N", "O", d(1996, 8, 8)),
    ]
    return region, nation, customer, orders, lineitem


def build_corpus(spark, out_dir: str) -> None:
    region, nation, customer, orders, lineitem = adversarial_tpch()
    spark.createDataFrame(region, "r_regionkey int, r_name string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/region.parquet")
    spark.createDataFrame(
        nation, "n_nationkey int, n_name string, n_regionkey int") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/nation.parquet")
    spark.createDataFrame(
        customer, "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    spark.createDataFrame(
        adversarial_events(),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    spark.createDataFrame(
        adversarial_documents(),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents.parquet")
    spark.createDataFrame(
        adversarial_embeddings(),
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite") \
        .parquet(f"{out_dir}/embeddings.parquet")


def run(queries=None, out=print) -> int:
    import duckdb

    from dexscraper_spark.plans.registry import all_queries
    from dexscraper_spark.session import get_spark
    from tools.check_oracle import normalize, values_equal

    spark = get_spark("difftest")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    names = queries or DEFAULT_QUERIES
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; "
                         f"valid: {sorted(reg)}")
    failures = 0
    with tempfile.TemporaryDirectory() as d:
        build_corpus(spark, d)
        con = duckdb.connect()
        for t in ("events", "documents", "embeddings", "region", "nation",
                  "customer", "orders", "lineitem"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{d}/{t}.parquet/*.parquet')")
        for name in names:
            q = reg[name]
            if q.oracle is None:
                continue
            try:
                sdf = q.build(spark, d)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
                res = con.execute(q.oracle)
                dcols = [c[0] for c in res.description]
                drows = res.fetchall()
            except Exception as e:  # noqa: BLE001
                out(f"[ERR ] {name}: {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:150]}")
                failures += 1
                continue
            if sorted(scols) != sorted(dcols):
                out(f"[COLS] {name}: spark={sorted(scols)} "
                    f"duck={sorted(dcols)}")
                failures += 1
                continue
            a, _ = normalize(srows, scols)
            b, _ = normalize(drows, dcols)

            def rows_eq(x, y):
                return len(x) == len(y) and all(
                    values_equal(u, v) for u, v in zip(x, y))

            if len(a) != len(b):
                out(f"[ROWS] {name}: spark={len(a)} duck={len(b)}")
                failures += 1
            elif not all(rows_eq(x, y) for x, y in zip(a, b)):
                diff = next(i for i, (x, y) in enumerate(zip(a, b))
                            if not rows_eq(x, y))
                out(f"[VALS] {name}: first diff at row {diff}:")
                out(f"        spark={a[diff]}")
                out(f"        duck ={b[diff]}")
                failures += 1
            else:
                out(f"[OK  ] {name} rows={len(a)}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if run(sys.argv[1:] or None) else 0)
