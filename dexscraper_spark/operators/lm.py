"""N-gram language model — distributed train, distributed scoring.

Public techniques: "stupid backoff" smoothing (Brants et al., "Large
Language Models in Machine Translation", EMNLP 2007 — designed
precisely for distributed corpus-count LMs) and LM-based corpus quality
filtering (Wenzek et al., "CCNet", 2020: score each document's
per-token log-probability under an in-domain LM; gibberish, boilerplate
and wrong-language text score low). The reference engine has no text
modeling at all; this is the quality-filter tier of the training-data
extension family.

Scale shape:

* ``lm_train`` — pure partial-agg'd groupBys: one pass explodes every
  order-1..n gram to (hash, count) rows (contexts need no rows of
  their own — an order-o context IS an order-(o−1) gram). Shuffle
  volume is distinct-gram counts, never corpus size. The LM
  IS a DataFrame — store it as parquet, no driver materialization.
* ``lm_score`` — each position carries its n suffix-gram keys
  (orders 1..n); contexts need NO extra keys — an order-(o−1) context
  is the order-(o−1) gram ending one position earlier, recovered with
  a window lag. So: ONE explode (n keys/position), ONE equi-join
  against the LM table, one role pivot, one lag window — all linear
  in corpus token count, join count independent of n.

Backoff math (per position i, longest available order o*):
S(w|ctx_o) = cnt(gram_o)/cnt(ctx_o) when cnt(gram_o) > 0, else
alpha * S(w|ctx_{o-1}); S(w) = cnt(w)/total at order 1, with OOV
floored to alpha/total (one unseen-token pseudo-count). Scores are NOT
normalized probabilities (Brants' point: ranking quality, not exact
perplexity) — higher per-token log10 score = more in-domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dexscraper_spark.operators.bpe import norm_words

_TOTAL_KEY_ORDER = 0  # reserved order id for the corpus-total row


def _gram_key(order: int, gram_str):
    """One stable 8-byte key space for all orders: hash(order, gram)."""
    return F.xxhash64(F.lit(order), gram_str)


def _order_grams(words, order: int):
    """Array of this order's gram strings across the doc (empty when
    the doc is shorter than ``order``) — the shared constructor."""
    from dexscraper_spark.operators.bpe import word_ngrams
    return word_ngrams(words, order)


def lm_train(docs: DataFrame, *, n: int = 3,
             text_col: str = "text") -> DataFrame:
    """(key, cnt): counts for every order-1..n gram, keyed by
    hash(order, gram); plus the corpus token total under the reserved
    order-0 key. Contexts need no separate rows — an order-o context IS
    an order-(o-1) gram. ONE corpus scan: per-order key arrays concat
    map-side, one explode, one partial-agg'd groupBy."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # materialize the word array as a COLUMN first: referencing the
    # norm_words HOF expression inside the gram transforms re-evaluates
    # the whole filter chain per slice — O(len^2) per doc, measured
    # 6.6x slower at sf0.1
    src = docs.select(norm_words(text_col).alias("__w"))
    words = F.col("__w")
    # ONE corpus scan for every order: hash each order's grams map-side,
    # concat the per-order key arrays, one explode + one partial-agg'd
    # groupBy (a per-order pass re-reads the text column n times)
    def _keyed(o: int):
        # factory, NOT a default-arg lambda: F.transform treats a
        # two-parameter lambda as (element, index) — `lambda g, o=o:`
        # silently receives the array INDEX as o
        return F.transform(_order_grams(words, o),
                           lambda g: _gram_key(o, g))

    all_keys = F.concat(*[_keyed(o) for o in range(1, n + 1)])
    out = (src
           .select(F.explode(all_keys).alias("key"))
           .groupBy("key").agg(F.count(F.lit(1)).alias("cnt")))
    total = (src
             .select(F.size(words).alias("m"))
             .agg(F.sum("m").alias("cnt"))
             .select(_gram_key(_TOTAL_KEY_ORDER, F.lit("")).alias("key"),
                     F.col("cnt")))
    return out.unionByName(total)


def lm_score(docs: DataFrame, lm: DataFrame, *, n: int = 3,
             id_col: str = "doc_id", text_col: str = "text",
             alpha: float = 0.4) -> DataFrame:
    """(doc_id, n_tokens, logp_per_token): mean per-token log10 stupid-
    backoff score. Higher = more in-domain; use as the CCNet-style
    quality column (filter or stratify on it). Empty docs score NULL.

    Plan: positions → explode (n suffix-gram keys each; contexts are
    recovered by a lag, not extra keys) → ONE equi-join with the LM →
    pivot roles per position → lag window → score expression → per-doc
    mean. No UDFs, no per-order join chain."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    words = norm_words(text_col)

    # one row per token position, carrying the doc's word array
    pos = (docs
           .select(F.col(id_col), words.alias("__w"))
           .select(id_col, "__w",
                   F.posexplode(F.col("__w")).alias("__i", "__tok"))
           .drop("__tok"))  # 0-based position

    # role → key: gram of order o ending at position i exists when
    # i+1 >= o; its words are slice(w, i-o+2, o) (1-based slice start)
    roles = []
    for o in range(1, n + 1):
        gram = F.array_join(
            F.slice(F.col("__w"), F.col("__i") - (o - 2), o), " ")
        roles.append((f"g{o}", o,
                      F.when(F.col("__i") + 1 >= o, _gram_key(o, gram))))
    role_struct = F.array(*[
        F.struct(F.lit(name).alias("role"), key.alias("key"))
        for name, _, key in roles])
    keyed = (pos
             .select(id_col, "__i",
                     F.explode(role_struct).alias("rk"))
             .select(id_col, "__i", F.col("rk.role").alias("role"),
                     F.col("rk.key").alias("key"))
             .filter(F.col("key").isNotNull()))

    joined = keyed.join(lm, "key", "left")
    piv = (joined.groupBy(id_col, "__i")
           .agg(*[F.max(F.when(F.col("role") == f"g{o}", F.col("cnt")))
                  .alias(f"c{o}") for o in range(1, n + 1)]))

    # corpus total as a literal scalar — and a LOUD check: an lm frame
    # that was filtered/re-aggregated and lost the reserved total row
    # would otherwise crossJoin-annihilate every scored document
    totals = lm.filter(
        F.col("key") == _gram_key(_TOTAL_KEY_ORDER, F.lit(""))) \
        .select("cnt").collect()
    if not totals:
        raise ValueError(
            "lm_score: the LM table has no corpus-total row (reserved "
            "order-0 key) — was it filtered or re-aggregated after "
            "lm_train?")
    piv = piv.withColumn("__total",
                         F.lit(float(totals[0][0])))

    # stupid backoff, longest order first: S_o = c_o(i) / ctx where
    # ctx = count of the order-(o-1) CONTEXT gram words[i-o+1..i-1] —
    # which is exactly the order-(o-1) gram ending at position i-1,
    # i.e. lag(c_{o-1}) over the doc's position order. The lag is
    # EXACT (no extra explode or join): whenever c_o exists the
    # previous position exists and carries the context's count; a NULL
    # lag means the context is unseen, which (count(ctx) >= count(gram))
    # implies c_o = 0 too, so the backoff branch is taken consistently.
    from pyspark.sql import Window
    w_prev = Window.partitionBy(id_col).orderBy("__i")
    score = None
    for o in range(1, n + 1):
        if o == 1:
            s = F.coalesce(
                F.when(F.col("c1") > 0, F.col("c1") / F.col("__total")),
                F.lit(alpha) / F.col("__total"))
        else:
            ctx = F.lag(f"c{o - 1}", 1).over(w_prev)
            # alpha penalizes backing off from an UNSEEN gram only;
            # positions with fewer than o-1 predecessors start at the
            # shorter order unpenalized (standard scoring: the top
            # order is min(i+1, n))
            s = F.when(F.col("__i") + 1 < o, score) \
                .when((F.col(f"c{o}") > 0) & (ctx > 0),
                      F.col(f"c{o}") / ctx) \
                .otherwise(F.lit(alpha) * score)
        score = s
    scored = piv.select(id_col, F.log10(score).alias("__lp"))
    out = (scored.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_tokens"),
                F.avg("__lp").alias("logp_per_token")))
    # keep empty docs visible with NULL scores
    # NULL text yields a NULL word array: size() is NULL, posexplode
    # emits nothing — catch both empty and NULL or those docs vanish
    # from the output entirely
    empties = (docs.select(F.col(id_col), F.size(words).alias("__m"))
               .filter((F.col("__m") == 0) | F.col("__m").isNull())
               .select(id_col, F.lit(0).cast("long").alias("n_tokens"),
                       F.lit(None).cast("double")
                       .alias("logp_per_token")))
    return out.unionByName(empties)
