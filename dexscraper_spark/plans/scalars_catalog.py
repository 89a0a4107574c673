"""Oracle-checked scalar gates (SURVEY §2.3/§2.10), consolidated into two
wide suite queries so every scalar keeps a driver CORRECTNESS row inside
the 50-query cap: F3 NaN/Inf scrub, F6 meaningful-row, F11 clean_string,
F14 null-free projection, F15 URL cleanup/validity, D3/D6 normalization,
D4 safe_divide, D5 formatting family.

The testdata is clean, so each lane synthesizes its dirty input
deterministically inside the query — NaN/Inf via CAST('NaN' AS DOUBLE)
(identical in Spark and DuckDB), control characters via chr(n), nulls and
garbage via modular arithmetic on the row id — then applies the engine's
scalar function with a hand-mirrored ANSI-SQL oracle.

Reference parity:
  F3  protocol.py:13-20 handle_double      F6  protocol.py:188-196
  F11 protocol.py:23-39 clean_string       F14 models.py:307-344
  F15 utils.py:171-211 clean/validate URL  D4  utils.py:374-388
  D5  utils.py:305-358 format_* family     D3/D6 utils.py symbol/md5 ids
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dexscraper_spark.plans.registry import register
from dexscraper_spark.session import tune_session


def _t(spark, sf_dir: str, name: str):
    from dexscraper_spark.sources.tables import load_table
    tune_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Events-keyed scalar suite: F3 scrub, F14 null-free, D4 safe_divide,
# D5 formatting, F6 meaningful-row — one scan, one wide codegen'd
# projection, every lane a separately-aliased oracle-checked column.
#
# D5 notes: format_price is exercised on the <1 branch (fractional part of
# value: exact in both engines, never a printf tie); the thousands-
# separator branch stays pytest-pinned (DuckDB printf has no grouped-double
# directive). Percentage input is pre-rounded to 3 decimals so ·100 lands
# on a 0.1 grid — no %.1f ties. vol_b uses 9999991 (not 1e7): event values
# sit on a 0.5 grid, and a clean power-of-ten multiplier lands v/1e9
# exactly on X.XX5 printf ties where Java HALF_UP and C half-even disagree.
# ---------------------------------------------------------------------------

@register(
    "scalar_events_suite",
    r"""
    WITH base AS (
        SELECT event_id, value, event_type, user_id,
               CASE WHEN event_id % 7 = 0 THEN CAST('NaN' AS DOUBLE)
                    WHEN event_id % 11 = 0 THEN CAST('Infinity' AS DOUBLE)
                    WHEN event_id % 13 = 0 THEN CAST('-Infinity' AS DOUBLE)
                    WHEN event_id % 17 = 0 THEN NULL
                    ELSE value END AS v,
               CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END AS chain0,
               CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS price0,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS txns0,
               value - FLOOR(value) AS frac,
               FLOOR((value - FLOOR(value)) * 1000.0 + 0.5) / 1000.0 AS pct_in,
               value * 1000.0 AS vol_k,
               value * 9999991.0 AS vol_b,
               CASE WHEN event_id % 3 = 0 THEN 0.0 ELSE value END AS m1,
               CASE WHEN event_id % 5 = 0 THEN NULL ELSE value * 2.0 END AS m2,
               CASE WHEN event_id % 2 = 0 THEN event_type ELSE '' END AS s1,
               CASE WHEN event_id % 4 = 0 THEN NULL
                    ELSE 'U' || CAST(user_id AS VARCHAR) END AS s2
        FROM events
    )
    SELECT event_id,
           CASE WHEN v IS NOT NULL AND NOT isnan(v) AND NOT isinf(v)
                THEN v ELSE 0.0 END AS scrubbed,
           COALESCE(chain0, 'unknown') AS chain,
           COALESCE(price0, 0.0) AS price,
           CAST(COALESCE(txns0, 0) AS BIGINT) AS txns,
           COALESCE(CASE WHEN (CAST(event_id % 7 AS DOUBLE) - 3.0) != 0.0
                THEN value / (CAST(event_id % 7 AS DOUBLE) - 3.0)
                ELSE 0.0 END, 0.0) AS ratio,
           CASE WHEN frac IS NULL THEN 'N/A'
                ELSE regexp_replace(regexp_replace(printf('%.8f', frac),
                                                   '0+$', ''), '\.$', '')
                END AS price_s,
           CASE WHEN pct_in IS NULL THEN 'N/A'
                ELSE printf('%.1f', pct_in * 100.0) || '%' END AS pct_s,
           CASE WHEN vol_k IS NULL THEN 'N/A'
                WHEN abs(vol_k) >= 1e9 THEN '$' || printf('%.2f', vol_k / 1e9) || 'B'
                WHEN abs(vol_k) >= 1e6 THEN '$' || printf('%.2f', vol_k / 1e6) || 'M'
                WHEN abs(vol_k) >= 1e3 THEN '$' || printf('%.2f', vol_k / 1e3) || 'K'
                ELSE '$' || printf('%.2f', vol_k) END AS vol_k_s,
           CASE WHEN vol_b IS NULL THEN 'N/A'
                WHEN abs(vol_b) >= 1e9 THEN printf('%.2f', vol_b / 1e9) || 'B'
                WHEN abs(vol_b) >= 1e6 THEN printf('%.2f', vol_b / 1e6) || 'M'
                WHEN abs(vol_b) >= 1e3 THEN printf('%.2f', vol_b / 1e3) || 'K'
                ELSE printf('%.2f', vol_b) END AS vol_b_s,
           CAST(CASE WHEN COALESCE(m1, 0.0) != 0.0 OR COALESCE(m2, 0.0) != 0.0
                          OR ((CASE WHEN s1 IS NOT NULL AND length(s1) > 0
                                    THEN 1 ELSE 0 END)
                              + (CASE WHEN s2 IS NOT NULL AND length(s2) > 0
                                      THEN 1 ELSE 0 END)
                              + 1) >= 3
                THEN 1 ELSE 0 END AS INT) AS meaningful
    FROM base
    """,
    survey_ref="F3,F6,F14,D4,D5",
)
def scalar_events_suite(spark, sf_dir):
    from dexscraper_spark.functions.cleaning import null_free, safe_divide
    from dexscraper_spark.functions.exact import round_half_up
    from dexscraper_spark.functions.formatting import (
        format_large_number, format_percentage, format_price, format_volume,
    )
    from dexscraper_spark.functions.validity import (
        is_meaningful_row, scrub_nonfinite)
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")

    staged = ev.select(
        "event_id", "value", "event_type", "user_id",
        F.when(eid % 3 == 0, F.lit(None).cast("string"))
         .otherwise(F.col("event_type")).alias("chain"),
        F.when(eid % 5 == 0, F.lit(None).cast("double"))
         .otherwise(F.col("value")).alias("price"),
        F.when(eid % 7 == 0, F.lit(None).cast("long"))
         .otherwise(F.col("user_id")).alias("txns"),
    )
    # F14: per-dtype defaults (chain → 'unknown') on the payload columns
    # ONLY — the raw value/event_type/user_id carried for the other lanes
    # must keep their NULLs, or the lanes diverge from the oracle (which
    # reads the raw columns) on NULL-bearing inputs.
    nf = null_free(staged, columns=["chain", "price", "txns"])

    v = (F.when(eid % 7 == 0, F.lit(float("nan")))
          .when(eid % 11 == 0, F.lit(float("inf")))
          .when(eid % 13 == 0, F.lit(float("-inf")))
          .when(eid % 17 == 0, F.lit(None).cast("double"))
          .otherwise(F.col("value")))
    denom = (eid % 7).cast("double") - F.lit(3.0)
    val = F.col("value")
    frac = val - F.floor(val)
    m1 = F.when(eid % 3 == 0, F.lit(0.0)).otherwise(val)
    m2 = F.when(eid % 5 == 0, F.lit(None).cast("double")).otherwise(val * 2.0)
    s1 = F.when(eid % 2 == 0, F.col("event_type")).otherwise(F.lit(""))
    s2 = F.when(eid % 4 == 0, F.lit(None).cast("string")) \
          .otherwise(F.concat(F.lit("U"), F.col("user_id").cast("string")))

    return nf.select(
        "event_id",
        scrub_nonfinite(v).alias("scrubbed"),
        "chain", "price", "txns",
        safe_divide(val, denom).alias("ratio"),
        format_price(frac).alias("price_s"),
        format_percentage(round_half_up(frac, 3)).alias("pct_s"),
        format_volume(val * 1000.0).alias("vol_k_s"),
        format_large_number(val * 9999991.0).alias("vol_b_s"),
        is_meaningful_row(m1, m2, F.lit(0.0), strings=[s1, s2, F.lit("x")])
        .cast("int").alias("meaningful"),
    )


# ---------------------------------------------------------------------------
# Documents-keyed scalar suite: F11 clean_string over corrupted prefixes,
# F15 URL cleanup/validity over synthesized URLs, D3/D6 symbol
# normalization + md5 content id — one scan of documents.
# ---------------------------------------------------------------------------

@register(
    "scalar_docs_suite",
    r"""
    WITH corrupted AS (
        SELECT doc_id, text, source,
               concat(substr(text, 1, 40), chr(7), '  tail', chr(9),
                      CASE WHEN doc_id % 3 = 0 THEN '@garbage@more'
                           WHEN doc_id % 3 = 1 THEN '\pathy\bits'
                           ELSE '' END) AS raw,
               concat('https://ex',
                      CASE CAST(doc_id % 4 AS INT)
                           WHEN 0 THEN 'ample.com' WHEN 1 THEN 'ample.org'
                           WHEN 2 THEN 'ample.xyz' ELSE 'a.io' END,
                      '/p/', CAST(doc_id AS VARCHAR),
                      CASE WHEN doc_id % 2 = 0 THEN '>>>' ELSE '' END,
                      CASE WHEN doc_id % 5 = 0 THEN chr(1) ELSE '' END) AS rawurl
        FROM documents
    ), staged AS (
        SELECT doc_id, text, source, raw, rawurl,
               regexp_replace(raw, '[^\x20-\x7e\t]', '', 'g') AS printable,
               regexp_replace(
                   regexp_replace(rawurl,
                       '[^\w\-_.~:/?#\[\]@!$&''()*+,;=%]+$', ''),
                   '[\x00-\x1f]', '', 'g') AS url
        FROM corrupted
    )
    SELECT doc_id,
           CASE WHEN raw IS NULL OR length(raw) = 0 THEN ''
                WHEN contains(printable, '@') OR contains(printable, '\')
                THEN split_part(split_part(printable, '@', 1), '\', 1)
                ELSE regexp_replace(printable, '^[ \t]+|[ \t]+$', '', 'g')
                END AS cleaned,
           url,
           CAST(CASE WHEN url IS NOT NULL
                          AND length(url) BETWEEN 10 AND 200
                          AND (contains(lower(url), '.com')
                               OR contains(lower(url), '.org')
                               OR contains(lower(url), '.net')
                               OR contains(lower(url), '.io')
                               OR contains(lower(url), '.me'))
                          AND NOT regexp_matches(url, '[\x00-\x05]')
                THEN 1 ELSE 0 END AS INT) AS valid,
           CASE WHEN source IS NULL
                     OR length(substr(regexp_replace(upper(source), '[^A-Z0-9]', '', 'g'), 1, 10)) = 0
                THEN 'UNK'
                ELSE substr(regexp_replace(upper(source), '[^A-Z0-9]', '', 'g'), 1, 10)
           END AS sym_norm,
           md5(text) AS content_md5,
           CASE WHEN hb < 80 THEN 'train'
                WHEN hb < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM (
        SELECT *,
               -- signed two's-complement view of md5_number_lower, then
               -- positive mod — matches Spark pmod(md5_le64(key), 100)
               ((((CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) >= 9223372036854775808
                        THEN CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT) - 18446744073709551616
                        ELSE CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT) END)
                  % 100) + 100) % 100) AS hb
        FROM staged
    )
    """,
    survey_ref="F11,F15,D3,D6,northstar-split",
)
def scalar_docs_suite(spark, sf_dir):
    from dexscraper_spark.functions.cleaning import (
        clean_string, clean_url, is_valid_url, normalize_symbol)
    from dexscraper_spark.operators.dedup import split_assignment
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    raw = F.concat(
        F.substring(F.col("text"), 1, 40), F.expr("char(7)"),
        F.lit("  tail"), F.lit("\t"),
        F.when(did % 3 == 0, F.lit("@garbage@more"))
         .when(did % 3 == 1, F.lit("\\pathy\\bits"))
         .otherwise(F.lit("")),
    )
    rawurl = F.concat(
        F.lit("https://ex"),
        F.when(did % 4 == 0, F.lit("ample.com"))
         .when(did % 4 == 1, F.lit("ample.org"))
         .when(did % 4 == 2, F.lit("ample.xyz"))
         .otherwise(F.lit("a.io")),
        F.lit("/p/"), did.cast("string"),
        F.when(did % 2 == 0, F.lit(">>>")).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.expr("char(1)")).otherwise(F.lit("")),
    )
    url = clean_url(rawurl)
    return docs.select(
        "doc_id",
        clean_string(raw).alias("cleaned"),
        url.alias("url"),
        is_valid_url(url).cast("int").alias("valid"),
        normalize_symbol(F.col("source")).alias("sym_norm"),
        F.md5(F.col("text")).alias("content_md5"),
        split_assignment(F.col("doc_id")).alias("split"),
    )


# ---------------------------------------------------------------------------
# Derived trending score (RankBy.TRENDING_*): the volume×change×activity
# blend the reference can only request server-side (config.py:30-45).
# Tokens derived per user from events: volume = fixed-point day sum,
# change = (last-first)/first·100 on the event_id order, txns = count.
# ---------------------------------------------------------------------------

def _register_rank_trending():
    from dexscraper_spark.functions.exact import sum_money_sql
    from dexscraper_spark.functions.scoring import trending_score_sql
    sql = f"""
    WITH tokens AS (
        SELECT user_id,
               {sum_money_sql('value', 2)} AS volume_24h,
               arg_min(value, event_id) AS first_v,
               arg_max(value, event_id) AS last_v,
               CAST(COUNT(*) AS BIGINT) AS txns_24h
        FROM events GROUP BY user_id
    ), scored AS (
        SELECT user_id, volume_24h, txns_24h,
               CASE WHEN first_v != 0.0
                    THEN (last_v - first_v) / first_v * 100.0
                    ELSE 0.0 END AS change_24h
        FROM tokens
    )
    SELECT user_id, volume_24h, change_24h, txns_24h,
           {trending_score_sql('volume_24h', 'change_24h', 'txns_24h')}
               AS trending_score
    FROM scored
    ORDER BY trending_score DESC, user_id ASC
    LIMIT 20
    """

    @register("rank_trending", sql, survey_ref="T2,A7,config-trending")
    def rank_trending(spark, sf_dir):
        from dexscraper_spark.functions.exact import sum_money
        from dexscraper_spark.functions.scoring import trending_score
        ev = _t(spark, sf_dir, "events")
        tokens = ev.groupBy("user_id").agg(
            sum_money(F.col("value"), 2).alias("volume_24h"),
            F.min_by(F.col("value"), F.col("event_id")).alias("first_v"),
            F.max_by(F.col("value"), F.col("event_id")).alias("last_v"),
            F.count(F.lit(1)).alias("txns_24h"),
        )
        scored = tokens.select(
            "user_id", "volume_24h", "txns_24h",
            F.when(F.col("first_v") != 0.0,
                   (F.col("last_v") - F.col("first_v")) / F.col("first_v")
                   * 100.0)
             .otherwise(F.lit(0.0)).alias("change_24h"),
        )
        return (
            scored.select(
                "user_id", "volume_24h", "change_24h", "txns_24h",
                trending_score(F.col("volume_24h"), F.col("change_24h"),
                               F.col("txns_24h")).alias("trending_score"))
            .orderBy(F.col("trending_score").desc(), F.col("user_id").asc())
            .limit(20)
        )


_register_rank_trending()
