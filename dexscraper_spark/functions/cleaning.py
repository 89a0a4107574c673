"""String/URL cleaning, normalization, null-coalescing (SURVEY §2.3, §2.11).

Reference parity:
  F11 clean_string       — dexscraper/protocol.py:23-39
  F12 printable projection — dexscraper/protocol.py:88,207 etc.
  F14 null-free output   — dexscraper/models.py:307-344 (to_output_dict)
  F15 url cleanup/validity — dexscraper/utils.py:171-211
  D4  safe_divide        — dexscraper/utils.py:374-388
  D6  normalize_symbol   — dexscraper/utils.py:391-409

All built-in regexp/string expressions — no UDFs, so these fuse into the
scan stage under whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_string(c: Column) -> Column:
    """F11: keep printable ASCII (32-126) + tab; truncate at '@' or '\\';
    trim (trim only when no truncation happened, matching the reference)."""
    printable = F.regexp_replace(c, r"[^\x20-\x7e\t]", "")
    truncated = F.split(F.split(printable, "@").getItem(0), r"\\").getItem(0)
    has_garbage = printable.contains("@") | printable.contains("\\")
    # Python str.strip() also removes tabs; Spark trim() is space-only
    stripped = F.regexp_replace(printable, r"^[ \t]+|[ \t]+$", "")
    return F.when(c.isNull() | (F.length(c) == 0), F.lit("")) \
            .when(has_garbage, truncated) \
            .otherwise(stripped)


def printable_projection(c: Column) -> Column:
    """F12: binary/string → text with non-printables replaced by spaces."""
    as_str = c.cast("string")
    return F.regexp_replace(as_str, r"[^\x20-\x7e]", " ")


def clean_url(c: Column) -> Column:
    """F15a: strip trailing non-URL garbage and control chars."""
    stripped = F.regexp_replace(c, r"[^\w\-_.~:/?#\[\]@!$&'()*+,;=%]+$", "")
    return F.regexp_replace(stripped, r"[\x00-\x1f]", "")


def is_valid_url(c: Column) -> Column:
    """F15b: length 10-200, known TLD substring, no control bytes."""
    lower = F.lower(c)
    has_tld = (
        lower.contains(".com") | lower.contains(".org") | lower.contains(".net")
        | lower.contains(".io") | lower.contains(".me")
    )
    no_ctl = ~c.rlike(r"[\x00-\x05]")
    return c.isNotNull() & (F.length(c) >= 10) & (F.length(c) <= 200) & has_tld & no_ctl


def normalize_symbol(c: Column) -> Column:
    """D6: uppercase, strip non-[A-Z0-9], cap 10 chars, fallback 'UNK'."""
    norm = F.substring(F.regexp_replace(F.upper(c), "[^A-Z0-9]", ""), 1, 10)
    return F.when(c.isNull() | (F.length(norm) == 0), F.lit("UNK")).otherwise(norm)


def safe_divide(numerator: Column, denominator: Column, default: float = 0.0) -> Column:
    """D4: n/d with 0-denominator OR NULL inputs → default (never
    NULL/Inf — a NULL numerator previously leaked NULL through the
    denominator-only guard, breaking the documented contract)."""
    return F.coalesce(
        F.when(denominator != 0, numerator / denominator), F.lit(default))


# Typed defaults of to_output_dict (models.py:307-344): strings → "" (chain/
# protocol → "unknown"), counts → 0, floats → 0.0.
_STRING_DEFAULTS = {"chain": "unknown", "protocol": "unknown"}


def null_free(df, string_default: str = "", numeric_default: float = 0.0,
              columns: list[str] | None = None):
    """F14: null-coalescing projection — no NULLs reach user payloads.

    Applies per-dtype ``coalesce`` defaults; one pass, no shuffle.
    With ``columns``, only the named columns are rewritten — the rest pass
    through untouched (so raw inputs carried alongside a payload
    projection keep their NULLs).
    """
    exprs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        dt = f.dataType.simpleString()
        if columns is not None and f.name not in columns:
            exprs.append(c)
            continue
        if dt == "string":
            default = _STRING_DEFAULTS.get(f.name, string_default)
            exprs.append(F.coalesce(c, F.lit(default)).alias(f.name))
        elif dt in ("double", "float"):
            # cast(dt) keeps FloatType frames FloatType (a bare
            # coalesce with a double literal silently widens the schema)
            exprs.append(F.coalesce(c, F.lit(numeric_default)).cast(dt)
                         .alias(f.name))
        elif dt in ("bigint", "int", "smallint", "tinyint"):
            exprs.append(F.coalesce(c, F.lit(0)).cast(dt).alias(f.name))
        elif dt == "boolean":
            exprs.append(F.coalesce(c, F.lit(False)).alias(f.name))
        elif dt.startswith("decimal"):
            exprs.append(F.coalesce(c, F.lit(0).cast(dt)).alias(f.name))
        elif dt in ("date", "timestamp", "timestamp_ntz"):
            # no sane sentinel instant exists — documented passthrough
            exprs.append(c)
        else:
            exprs.append(c)
    return df.select(*exprs)


# --- PII redaction -----------------------------------------------------------
# Training corpora must not memorize contact details; redaction patterns
# are the standard public ones (emails, E.164-ish phones, IPv4, 13-19
# digit card numbers). Pure regexp_replace chain: map-side, codegen'd,
# no UDF. Order matters twice: emails before phones (an email's digits
# must not be half-eaten as a phone number), and IPv4 before phones
# (the phone pattern's dotted-separator form would otherwise eat
# dotted quads).

_PII_PATTERNS = (
    # email: local@domain.tld (conservative: no quoted locals)
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IPv4
    (r"(?<![0-9])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9])", "<IP>"),
    # card-ish: 13-19 digits with optional space/dash separators, only
    # when delimited (lookarounds keep longer ids intact)
    (r"(?<![0-9])(?:[0-9][ \-]?){12,18}[0-9](?![0-9])", "<NUMBER>"),
    # phone: +country / (area) forms, 7-15 digits total
    (r"(?<![0-9A-Za-z])\+?[0-9]{1,3}[ \-.]?\(?[0-9]{2,4}\)?"
     r"(?:[ \-.]?[0-9]{2,4}){1,3}(?![0-9])", "<PHONE>"),
)


def redact_pii(c: Column) -> Column:
    """Replace emails, card-like digit runs, phone numbers, and IPv4
    addresses with typed placeholders. Deliberately recall-leaning: a
    training pipeline prefers over-redacting a rare product code to
    leaking a real person's number (tune _PII_PATTERNS per corpus)."""
    out = c
    for pat, repl in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
