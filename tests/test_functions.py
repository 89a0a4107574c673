"""Scalar function library tests, pinned to the reference's edge values
(FIXTURES.md §7; /root/reference/tests/test_edge_cases.py:37-53,
test_decode_pair.py:16-23, utils.py:85-108)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _eval(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


def test_is_valid_float_edges(spark):
    """NaN/Inf/0/±1/1e20/1e-20 invalid; 0.000123/45.67/1e6 valid."""
    from dexscraper_spark.functions.validity import is_valid_float
    vals = [float("nan"), float("inf"), float("-inf"), 0.0, 1.0, -1.0,
            1e20, 1e-20, 0.000123, 45.67, 1_000_000.0]
    out = _eval(spark, is_valid_float(F.col("v")),
                [(v,) for v in vals], "v double")
    assert out == [False, False, False, False, False, False,
                   False, False, True, True, True]


def test_scrub_nonfinite(spark):
    from dexscraper_spark.functions.validity import scrub_nonfinite
    out = _eval(spark, scrub_nonfinite(F.col("v")),
                [(float("nan"),), (float("inf"),), (2.5,), (None,)], "v double")
    assert out == [0.0, 0.0, 2.5, 0.0]


def test_classify_value_priority(spark):
    """price beats percentage for 0.01; txns beats volume for ints in range."""
    from dexscraper_spark.functions.validity import classify_value
    cases = [
        (0.001, "price"),       # in [1e-6, 0.1]
        (500.0, "txns"),        # integral, in [10, 5e4] — txns wins over makers
        (500.5, "percentage"),  # non-integral → falls to percentage range
        (2_000_000.0, "volume"),
        (50_000.0, "liquidity"),  # 5e4: integral but > 5e4? no — in txns range? 50000 <= 50000 → txns
        (20_000_000.0, "market_cap"),
        (-50.0, "percentage"),
        (1e9, "other"),
    ]
    out = _eval(spark, classify_value(F.col("v")),
                [(v,) for v, _ in cases], "v double")
    expected = [e for _, e in cases]
    expected[4] = "txns"  # 50000 is integral and <= 50000 → txns by priority
    assert out == expected


def test_clean_string_reference_cases(spark):
    """tests/test_decode_pair.py:16-23 golden cases."""
    from dexscraper_spark.functions.cleaning import clean_string
    cases = [
        ("foo\x00bar\nbaz\tqux\r", "foobarbaz\tqux"),
        ("hello@world", "hello"),
        ("test\\path", "test"),
        ("", ""),
        (None, ""),
        ("  spaced  ", "spaced"),
    ]
    out = _eval(spark, clean_string(F.col("s")),
                [(s,) for s, _ in cases], "s string")
    assert out == [e for _, e in cases]


def test_normalize_symbol(spark):
    from dexscraper_spark.functions.cleaning import normalize_symbol
    cases = [("sol!", "SOL"), ("pepe-coin", "PEPECOIN"),
             ("verylongsymbolname", "VERYLONGSY"), ("", "UNK"),
             (None, "UNK"), ("$$$", "UNK")]
    out = _eval(spark, normalize_symbol(F.col("s")),
                [(s,) for s, _ in cases], "s string")
    assert out == [e for _, e in cases]


def test_url_validity(spark):
    from dexscraper_spark.functions.cleaning import is_valid_url
    cases = [("https://example.com/x", True),
             ("http://t.me/chat", False),     # .me but len<10? len=16 → has .me → True
             ("short.io", False),             # len 8 < 10
             ("https://nodomain/xyz", False)]
    out = _eval(spark, is_valid_url(F.col("u")),
                [(u,) for u, _ in cases], "u string")
    assert out[0] is True
    assert out[1] is True  # corrected: 16 chars, contains .me
    assert out[2] is False
    assert out[3] is False


def test_confidence_score(spark):
    """utils.py:258-286 semantics incl. completeness bonus and caps."""
    from dexscraper_spark.functions.scoring import confidence_score
    out = _eval(
        spark,
        confidence_score(F.col("f"), F.col("c"), F.col("m")),
        [(8, 3, 1), (2, 1, 0), (10, 10, 10)],
        "f int, c int, m int")
    assert out[0] == 1.0  # 0.5+0.3+0.2 + 0.1 bonus = 1.1 → capped at 1.0
    assert math.isclose(out[1], 0.2 + 0.1 + 0.0)
    assert out[2] == 1.0


def test_field_count(spark):
    from dexscraper_spark.functions.scoring import field_count
    df = spark.createDataFrame([(1.0, None, "x"), (None, None, None)],
                               "a double, b double, c string")
    out = [r["n"] for r in df.select(
        field_count(F.col("a"), F.col("b"), F.col("c")).alias("n")).collect()]
    assert out == [2, 0]


def test_safe_divide(spark):
    from dexscraper_spark.functions.cleaning import safe_divide
    out = _eval(spark, safe_divide(F.col("n"), F.col("d")),
                [(10.0, 2.0), (1.0, 0.0)], "n double, d double")
    assert out == [5.0, 0.0]


def test_format_volume_tiers(spark):
    from dexscraper_spark.functions.formatting import format_volume
    cases = [(2_500_000_000.0, "$2.50B"), (5_300_000.0, "$5.30M"),
             (1_500.0, "$1.50K"), (42.0, "$42.00"), (None, "N/A")]
    out = _eval(spark, format_volume(F.col("v")),
                [(v,) for v, _ in cases], "v double")
    assert out == [e for _, e in cases]


def test_format_percentage(spark):
    from dexscraper_spark.functions.formatting import format_percentage
    out = _eval(spark, format_percentage(F.col("v")),
                [(0.05,), (None,)], "v double")
    assert out == ["5.0%", "N/A"]


def test_exact_sum_order_independence(spark):
    """sum_money must not depend on partitioning/order."""
    from dexscraper_spark.functions.exact import sum_money
    vals = [(i * 0.01 + 0.001,) for i in range(1000)]
    df1 = spark.createDataFrame(vals, "v double").repartition(1)
    df8 = spark.createDataFrame(list(reversed(vals)), "v double").repartition(8)
    s1 = df1.agg(sum_money(F.col("v")).alias("s")).collect()[0]["s"]
    s8 = df8.agg(sum_money(F.col("v")).alias("s")).collect()[0]["s"]
    assert s1 == s8  # bit-identical, not approximately


def test_lang_id_and_quality(spark):
    from dexscraper_spark.functions.textstats import lang_id, quality_score, token_count
    df = spark.createDataFrame(
        [("the cat sat on the mat and it is fine",),
         ("el perro es un animal que no habla",),
         ("zzz qqq www",)],
        "text string")
    out = df.select(lang_id(F.col("text")).alias("l"),
                    token_count(F.col("text")).alias("n"),
                    quality_score(F.col("text")).alias("q")).collect()
    assert [r["l"] for r in out] == ["en", "es", "und"]
    assert out[0]["n"] == 10
    assert all(0.0 <= r["q"] <= 1.0 for r in out)


def test_text_metrics_arrow_matches_exprs(spark):
    """The r12 Arrow text_metrics kernel (textstats.text_metrics_arrow,
    the registered row's implementation) must be BIT-identical to the
    layered expression form (catalog._text_metrics_exprs, the pinned
    reference) — every double compared by raw IEEE bits — on the same
    engine-semantics edge corpus the gate-kernel test uses: Java-\\s vs
    unicode whitespace, astral-plane code points, control chars,
    empty/whitespace/punctuation-only, 20k-boundary lengths, NULL."""
    import struct as _struct

    from dexscraper_spark.functions import textstats as tx
    from dexscraper_spark.plans.catalog import _text_metrics_exprs

    texts = [
        None, "", " ", "\t\n\x0b\x0c\r", "\xa0", "the\xa0la",
        "!!! ??? ;;; ///", "the quick brown fox jumps over the lazy dog",
        "İstanbul the the", "ΜΑΣ the ΑΣ", "𝄞😀𝐀 the of and", "a" * 500,
        ("word " * 200).strip(), "supercalifragilistic expialidocious",
        "\x0bthe\x0cof\rand\tto\nin", "\x00\x1f\x7f the of",
        "12 345 67890", "　the　of　", "x" * 19999 + " y", "z " * 10001,
    ]
    docs = spark.createDataFrame(
        [(i, t, len(t) if t else 0) for i, t in enumerate(texts)],
        "doc_id long, text string, n_chars long")

    def rows(df):
        cols = ("doc_id", "n_chars", "measured_chars", "n_tokens",
                "n_bpe_tokens")
        dbls = ("avg_token_len", "punct_ratio", "quality")
        return sorted(
            tuple(r[c] for c in cols)
            + tuple(_struct.pack("d", r[c]) for c in dbls)
            for r in df.collect())

    assert rows(tx.text_metrics_arrow(docs)) == rows(
        _text_metrics_exprs(docs))


def test_textstats_batch_kernels_doc_boundaries():
    """The r13 byte-level batch kernels (_batch_int_metrics/_batch_lang)
    index token boundaries via document-start offsets; an empty or NULL
    document at the batch edge has an offset equal to the data-buffer
    length (or 0), and clipping it onto a real byte split/truncated a
    neighboring doc's token (regression: difftest curation ValueError,
    shapes (210,) vs (209,)). Pin the masked-indexing fix against the
    scalar twins, including sliced (non-zero-offset) arrays."""
    import struct as _struct

    import pyarrow as pa

    from dexscraper_spark.functions import textstats as tx

    cases = [
        ["hello world", ""], ["hello", None], ["ab cd", "", None],
        [None, "abc def"], ["", "abc"], [None, None], ["", ""],
        ["token", "", "", None, "x yz"],
        ["the and of in le la el un", "", None, "İN THE end"],
    ]
    for texts in cases:
        arr = pa.array(texts, pa.string())
        for a in {0: arr, 1: arr.slice(1)}.values():
            valid, n, c, sl, p, bpe = tx._batch_int_metrics(a)
            atl, pr, q = tx._batch_quality(valid, n, c, sl, p)
            langs = tx._batch_lang(a, valid)
            for i, s in enumerate(a.to_pylist()):
                mc, nt, al2, prr, nb, qq = tx._doc_text_metrics(s)
                lang, _, _ = tx._doc_gate_metrics(s)
                assert langs[i] == lang, (s, langs[i], lang)
                assert n[i] == (mc or 0) and c[i] == (nt or 0), (s,)
                if s is not None:
                    assert int(bpe[i] + p[i]) == nb, (s,)
                    for got, want in ((atl[i], al2), (pr[i], prr),
                                      (q[i], qq)):
                        assert (_struct.pack("d", got)
                                == _struct.pack("d", want)), (s,)


def test_base58_address_validation(spark):
    """F13/D2: rlike pre-filter + decode-length confirmation."""
    from dexscraper_spark.functions.lookups import (
        base58_decodes_to_32_bytes, is_probable_base58_address)
    sol = "So11111111111111111111111111111111111111112"
    cases = [sol, "0OIl" + "a" * 40, "short", "J" * 43]
    df = spark.createDataFrame([(c,) for c in cases], "addr string")
    pre = [r["p"] for r in df.select(
        is_probable_base58_address(F.col("addr")).alias("p")).collect()]
    assert pre == [True, False, False, True]
    confirmed = [r["c"] for r in df.select(
        base58_decodes_to_32_bytes(F.col("addr")).alias("c")).collect()]
    assert confirmed[0] is True      # the real SOL mint decodes to 32 bytes
    assert confirmed[2] is False


def test_blacklist_predicates(spark):
    from dexscraper_spark.functions.lookups import (
        is_known_symbol, not_blacklisted, not_english_word)
    df = spark.createDataFrame(
        [("SOL",), ("HTTP",), ("PEPE",), ("The",)], "s string")
    rows = df.select(
        F.col("s"), not_blacklisted(F.col("s")).alias("nb"),
        not_english_word(F.col("s")).alias("ne"),
        is_known_symbol(F.col("s")).alias("k")).collect()
    got = {r["s"]: (r["nb"], r["ne"], r["k"]) for r in rows}
    assert got["SOL"] == (True, True, True)
    assert got["HTTP"] == (False, True, False)
    assert got["PEPE"] == (True, True, True)
    assert got["The"] == (True, False, False)


def test_cluster_confidence_and_record_confidence(spark):
    """A7 variants: cluster score (types·10 cap 60 + 10·meta)/100 cap 1;
    record score 0.7 + 0.05·fields cap 0.95 (scraper.py:670,1371-1392)."""
    from dexscraper_spark.functions.scoring import (
        cluster_confidence, record_confidence)
    out = _eval(spark, cluster_confidence(F.col("t"), F.col("m")),
                [(3, 1), (8, 5), (0, 0)], "t int, m int")
    assert out == [(30.0 + 10.0) / 100.0, 1.0, 0.0]
    out2 = _eval(spark, record_confidence(F.col("f")),
                 [(2,), (9,)], "f int")
    assert abs(out2[0] - 0.8) < 1e-12 and out2[1] == 0.95


def test_meaningful_row_and_printable(spark):
    from dexscraper_spark.functions.validity import is_meaningful_row
    from dexscraper_spark.functions.cleaning import printable_projection
    df = spark.createDataFrame(
        [(0.0, 0.0, "a", "b", "c"), (1.5, 0.0, None, None, None),
         (0.0, 0.0, None, None, None)],
        "p double, v double, s1 string, s2 string, s3 string")
    pred = is_meaningful_row(
        F.col("p"), F.col("v"),
        strings=[F.col("s1"), F.col("s2"), F.col("s3")], min_strings=3)
    out = [r["m"] for r in df.select(pred.alias("m")).collect()]
    assert out == [True, True, False]
    pp = _eval(spark, printable_projection(F.col("s1")),
               [("ab\x01cd",)], "s1 string")
    assert pp == ["ab cd"]


def test_clean_url_strips_garbage(spark):
    from dexscraper_spark.functions.cleaning import clean_url
    out = _eval(spark, clean_url(F.col("u")),
                [("https://x.com/path>>>",), ("https://y.io/a\x00b",)],
                "u string")
    assert out[0] == "https://x.com/path"
    assert "\x00" not in out[1]


def test_filters_launchpad_progress():
    from dexscraper_spark.config import Filters
    f = Filters(max_launchpad_progress=95.0)
    assert "launchpad_progress <= 95.0" in f.to_sql()


def test_md5_le64_matches_duckdb_md5_number_lower(spark):
    """The portable simhash shingle hash must equal DuckDB's
    md5_number_lower bit-for-bit (signed two's-complement view) — this is
    the cross-engine contract dedup_simhash's oracle stands on."""
    import duckdb
    from dexscraper_spark.operators.dedup import md5_le64

    samples = ["", "a", "abc", "hello world", "ρython unicode ☃",
               "tab\tnewline\n", " " * 50, "0123456789" * 30,
               "ümlaut-Ärger", "\x01\x02", "the quick brown fox"]
    got = [r.h for r in spark.createDataFrame(
        [(s,) for s in samples], ["s"]).select(
        md5_le64(__import__("pyspark.sql.functions", fromlist=["col"])
                 .col("s")).alias("h")).collect()]
    con = duckdb.connect()
    want = []
    for s in samples:
        (u,) = con.execute("SELECT md5_number_lower(?)", [s]).fetchone()
        want.append(u - (1 << 64) if u >= (1 << 63) else u)
    assert got == want


def test_sum_money_survives_int64_overflow_scale(spark):
    """The fixed-point accumulator must be 128-bit: a group whose 6-dp
    cents sum exceeds int64 (the 100 TB regime) must aggregate without
    overflow instead of throwing/wrapping."""
    from pyspark.sql import functions as F
    from dexscraper_spark.functions.exact import sum_money
    # 2000 rows x 9e12 -> 1.8e16 money -> 1.8e22 cents at scale 6 >> 2^63
    df = spark.range(2000).select(F.lit(9e12).alias("v"))
    (total,) = df.agg(sum_money(F.col("v"), 6).alias("s")).collect()[0]
    assert total == 2000 * 9e12
    # and the PER-ROW wide branch: one value whose scaled cents exceed
    # int64 must not saturate inside the floor
    one = spark.range(1).select(F.lit(1e15).alias("v"))
    (t1,) = one.agg(sum_money(F.col("v"), 6).alias("s")).collect()[0]
    assert t1 == 1e15


def test_difftest_adversarial_corpus_is_clean(spark):
    """The differential harness (edge-input corpus, Spark vs DuckDB) must
    report zero divergences — guards the oracle parity beyond the
    generated testdata."""
    from tools.difftest import run
    lines: list[str] = []
    assert run(out=lines.append) == 0, "\n".join(lines)


def test_quality_score_null_text_scores_zero(spark):
    from pyspark.sql import functions as F
    from dexscraper_spark.functions.textstats import quality_score
    rows = spark.createDataFrame(
        [(None,), ("short real text here",)], "text string"
    ).select(quality_score(F.col("text")).alias("q")).collect()
    assert rows[0].q == 0.0 and rows[1].q > 0.0


def test_round_half_up_no_int64_saturation(spark):
    from pyspark.sql import functions as F
    from dexscraper_spark.functions.exact import round_half_up
    [r] = spark.createDataFrame([(1e17, 1.005)], "big double, small double") \
        .select(round_half_up(F.col("big"), 2).alias("b"),
                round_half_up(F.col("small"), 2).alias("s")).collect()
    assert r.b == 1e17          # pass-through, not floor saturation ~9.2e16
    assert abs(r.s - 1.0) <= 0.01


def test_confidence_score_null_counts_score_zero_not_cap(spark):
    from pyspark.sql import functions as F
    from dexscraper_spark.functions.scoring import (
        cluster_confidence, confidence_score, record_confidence)
    [r] = spark.createDataFrame([(None, None, None)],
                                "fc int, nc int, mc int").select(
        confidence_score(F.col("fc"), F.col("nc"), F.col("mc")).alias("c"),
        record_confidence(F.col("fc")).alias("rc"),
        cluster_confidence(F.col("nc"), F.col("mc")).alias("cc"),
    ).collect()
    assert r.c == 0.0 and r.rc == 0.7 and r.cc == 0.0


def test_safe_divide_null_numerator_hits_default(spark):
    from pyspark.sql import functions as F
    from dexscraper_spark.functions.cleaning import safe_divide
    [r] = spark.createDataFrame([(None, 2.0)], "n double, d double").select(
        safe_divide(F.col("n"), F.col("d")).alias("q")).collect()
    assert r.q == 0.0


# --------------------- repetition ratio + PII redaction ----------------------


def test_repetition_ratio(spark):
    from pyspark.sql import functions as F

    from dexscraper_spark.functions.textstats import repetition_ratio

    df = spark.createDataFrame(
        [(0, "the cat sat on the mat while the dog slept outside"),
         (1, "buy now buy now buy now buy now buy now buy now"),
         (2, "too short"),
         (3, "a b c a b c a b c a b c")],
        "i long, text string")
    out = {r.i: r.rr for r in df.select(
        "i", repetition_ratio(F.col("text")).alias("rr")).collect()}
    assert out[0] == 0.0                 # natural prose: distinct 3-grams
    assert out[1] > 0.7                  # repeated phrase
    assert out[2] == 0.0                 # < n+1 words
    # "a b c" x4: 10 trigrams, 3 distinct -> 7/10
    assert abs(out[3] - 0.7) < 1e-9


def test_redact_pii(spark):
    from pyspark.sql import functions as F

    from dexscraper_spark.functions.cleaning import redact_pii

    rows = [
        (0, "contact john.doe+spam@example.co.uk for info",
            "contact <EMAIL> for info"),
        (1, "call +1 (415) 555-0134 or 020 7946 0958 now",
            "call <PHONE> or <PHONE> now"),
        (2, "server at 192.168.10.255 responded",
            "server at <IP> responded"),
        (3, "card 4111 1111 1111 1111 declined",
            "card <NUMBER> declined"),
        (4, "order id ABC123 qty 7 price 19.99 unchanged",
            "order id ABC123 qty 7 price 19.99 unchanged"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in rows],
                               "i long, text string")
    out = {r.i: r.red for r in df.select(
        "i", redact_pii(F.col("text")).alias("red")).collect()}
    for i, _, want in rows:
        assert out[i] == want, (i, out[i], want)
