"""Lookup-list filters (SURVEY §2.3 F10, §2.8 U3, §2.4 J5) and address
validation (F13/D2).

The reference filters candidate symbols through blacklists/whitelists with
Python ``set`` membership (scraper.py:478-568, 977-1058). Spark-first this
is a broadcast anti/semi join against tiny lookup DataFrames — at 100 TB
the lookup side broadcasts once per executor and the big side never
shuffles. For short closed lists an ``isin`` literal predicate compiles to
a codegen'd hash set and is equally scan-local; both forms are provided.

Lists are data (cited constants, reference scraper.py:479-508, 520-561,
1036-1058), not code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scraper.py:479-508 — protocol/format words that can't be token symbols.
SYMBOL_BLACKLIST = (
    "HTTP", "HTTPS", "GET", "POST", "PUT", "DELETE", "JSON", "XML", "HTML",
    "CSS", "JS", "API", "URL", "URI", "TCP", "UDP", "DNS", "SSL", "TLS",
    "UTF", "ASCII", "BASE", "TRUE", "FALSE", "NULL", "VOID", "INT", "FLOAT",
    "DOUBLE",
)

# scraper.py:520-561 — common English words excluded from mixed-case names.
ENGLISH_WORDS = (
    "The", "And", "For", "Are", "But", "Not", "You", "All", "Can", "Had",
    "Her", "Was", "One", "Our", "Out", "Day", "Get", "Has", "Him", "His",
    "How", "Its", "May", "New", "Now", "Old", "See", "Two", "Way", "Who",
    "Boy", "Did", "Http", "Https", "Json", "Server", "Client", "Request",
    "Response", "Error", "Success", "Failed", "Retry",
)

# scraper.py:1036-1058 — known-good symbols boosted during extraction.
KNOWN_SYMBOLS = (
    "SOL", "USDC", "USDT", "BTC", "ETH", "BNB", "PEPE", "BONK", "WIF",
    "JUP", "RAY", "ORCA",
)

SOL_MINT = "So11111111111111111111111111111111111111112"

_BASE58_CHARS = "123456789ABCDEFGHJKMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def not_blacklisted(symbol: Column) -> Column:
    """F10 predicate form: scan-local codegen'd hash-set membership.
    NULL symbols are KEPT — matching both the left-anti join form
    (``anti_join_blacklist``: NULL matches nothing) and the reference's
    ``match not in blacklist`` (None is never in the set); a bare
    ``~isin`` would silently drop NULL rows and make the two forms
    disagree on row counts."""
    return symbol.isNull() | ~symbol.isin(*SYMBOL_BLACKLIST)


def not_english_word(name: Column) -> Column:
    return ~name.isin(*ENGLISH_WORDS)


def is_known_symbol(symbol: Column) -> Column:
    return symbol.isin(*KNOWN_SYMBOLS)


def lookup_df(spark, values: tuple[str, ...], col_name: str = "value") -> DataFrame:
    """Lookup list as a broadcastable single-column DataFrame (join form —
    use when the list is dynamic or too large for a literal predicate)."""
    return spark.createDataFrame([(v,) for v in values], f"{col_name} string")


def anti_join_blacklist(df: DataFrame, *, symbol_col: str = "symbol",
                        blacklist: DataFrame | None = None) -> DataFrame:
    """U3: df minus blacklist via broadcast left-anti join."""
    bl = blacklist if blacklist is not None else lookup_df(
        df.sparkSession, SYMBOL_BLACKLIST, symbol_col)
    return df.join(F.broadcast(bl), symbol_col, "left_anti")


def is_probable_base58_address(c: Column, *, min_len: int = 32,
                               max_len: int = 44) -> Column:
    """F13 pre-filter (pure Column): base58 charset + Solana length range
    (reference regex gate, utils.py:111-136). The full decode-to-32-bytes
    confirmation is ``base58_decodes_to_32_bytes``."""
    return (
        c.isNotNull()
        & (F.length(c) >= min_len) & (F.length(c) <= max_len)
        & c.rlike(f"^[{_BASE58_CHARS}]+$")
    )


def base58_decodes_to_32_bytes(c: Column) -> Column:
    """F13/D2 confirmation: actual base58 decode length check
    (scraper.py:925-946) — an Arrow-batched pandas UDF, applied AFTER the
    cheap rlike pre-filter so at scale it sees only candidates."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    index = {ch: i for i, ch in enumerate(_BASE58_CHARS)}
    Series = pd.Series  # real type object: `from __future__ import
    # annotations` stringizes inline hints, breaking eval-type inference

    def decode_len_ok(s: str) -> bool:
        if not s:
            return False
        n = 0
        for ch in s:
            d = index.get(ch)
            if d is None:
                return False
            n = n * 58 + d
        raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
        # leading '1's encode leading zero bytes
        pad = len(s) - len(s.lstrip("1"))
        return pad + len(raw) == 32

    def _check_fn(col):
        return col.map(lambda s: decode_len_ok(s) if s is not None else False)

    _check_fn.__annotations__ = {"col": Series, "return": Series}
    _check = pandas_udf(_check_fn, BooleanType())
    return _check(c)
