"""Column-builder scalar function library.

Everything here returns a Catalyst ``Column`` (JVM-side, whole-stage
codegen-able). Zero row-at-a-time Python UDFs: the reference's scalar
functions (validity predicates, classification, cleaning, scoring,
formatting) are all expressible as built-in expressions — the single
mandatory Python kernel in the engine is the binary decode pandas UDF in
``sources/decode.py``.
"""

from dexscraper_spark.functions.validity import (  # noqa: F401
    scrub_nonfinite,
    is_valid_float,
    is_valid_trading_data,
    is_meaningful_row,
    classify_value,
    is_complete,
    is_high_confidence,
)
from dexscraper_spark.functions.cleaning import (  # noqa: F401
    clean_string,
    printable_projection,
    clean_url,
    is_valid_url,
    normalize_symbol,
    null_free,
    safe_divide,
)
from dexscraper_spark.functions.scoring import (  # noqa: F401
    confidence_score,
    cluster_confidence,
    field_count,
)
from dexscraper_spark.functions.formatting import (  # noqa: F401
    format_price,
    format_volume,
    format_percentage,
    format_large_number,
)
from dexscraper_spark.functions.exact import (  # noqa: F401
    cents,
    sum_money,
    avg_money,
    round_half_up,
)
from dexscraper_spark.functions.textstats import (  # noqa: F401
    tokens,
    token_count,
    bpe_ish_token_count,
    quality_score,
    repetition_ratio,
)
from dexscraper_spark.functions.cleaning import redact_pii  # noqa: F401
