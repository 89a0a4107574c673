"""Declarative filter/rank DSL compiled into Catalyst predicates.

The reference (``dexscraper/config.py:77-242``) expresses ~30 optional
min/max range predicates, chain/dex membership filters, and a rank-by +
order + limit spec, and compiles them into WebSocket URL query params so the
*server* filters before sending — i.e. predicate and top-k pushdown to the
data source.

In Spark the same DSL compiles into a single boolean ``Column``; Catalyst
then pushes the conjuncts into the parquet/DataSourceV2 scan automatically
(``.explain`` → ``PushedFilters``), and ``orderBy().limit()`` becomes
``TakeOrderedAndProject`` — the reference's two hand-rolled pushdowns are
free. At 100 TB this is the difference between scanning a full table and
reading only the row groups whose min/max stats overlap the predicate.

Reference parity: ``Chain/Timeframe/RankBy/Order/DEX`` enums
(``dexscraper/config.py:8-73``), ``Filters`` (``config.py:77-132``),
``ScrapingConfig.build_websocket_url`` (``config.py:254-281``),
``PresetConfigs`` (``config.py:285-388``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field, fields as dc_fields
from enum import Enum
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Chain(str, Enum):
    SOLANA = "solana"
    ETHEREUM = "ethereum"
    BASE = "base"
    BSC = "bsc"
    POLYGON = "polygon"
    ARBITRUM = "arbitrum"
    OPTIMISM = "optimism"
    AVALANCHE = "avalanche"


class Timeframe(str, Enum):
    """Timeframes; in this engine they are *real* tumbling-window durations
    (the reference only selects a server-side window: config.py:21-27)."""

    M5 = "m5"
    H1 = "h1"
    H6 = "h6"
    H24 = "h24"

    @property
    def duration(self) -> str:
        return {"m5": "5 minutes", "h1": "1 hour", "h6": "6 hours", "h24": "24 hours"}[self.value]

    @property
    def seconds(self) -> int:
        return {"m5": 300, "h1": 3600, "h6": 21600, "h24": 86400}[self.value]


class RankBy(str, Enum):
    TRENDING_SCORE_M5 = "trendingScoreM5"
    TRENDING_SCORE_H1 = "trendingScoreH1"
    TRENDING_SCORE_H6 = "trendingScoreH6"
    TRENDING_SCORE_H24 = "trendingScoreH24"
    VOLUME = "volume"
    TRANSACTIONS = "txns"
    PRICE_CHANGE_H24 = "priceChangeH24"
    PRICE_CHANGE_H6 = "priceChangeH6"
    PRICE_CHANGE_H1 = "priceChangeH1"
    LIQUIDITY = "liquidity"
    FDV = "fdv"
    MARKET_CAP = "marketCap"


class Order(str, Enum):
    DESC = "desc"
    ASC = "asc"


class DEX(str, Enum):
    RAYDIUM = "raydium"
    PUMPFUN = "pumpfun"
    PUMPSWAP = "pumpswap"
    ORCA = "orca"
    JUPITER = "jupiter"
    METEORA = "meteora"
    UNISWAP_V2 = "uniswap"
    UNISWAP_V3 = "uniswapv3"
    SUSHISWAP = "sushiswap"
    PANCAKESWAP = "pancakeswap"
    AERODROME = "aerodrome"
    BASESWAP = "baseswap"


# Column each RankBy key sorts on, in the canonical `tokens` schema.
# trendingScore* keys rank on the engine-DERIVED trending_score (a
# volume×change×activity blend, functions/scoring.py) — the reference can
# only request the server-computed value (config.py:30-45), never compute
# it; ScrapingConfig.apply derives the column on the fly when absent,
# using the timeframe's change column (TRENDING_CHANGE_COLUMN).
RANK_COLUMN = {
    RankBy.VOLUME: "volume_24h",
    RankBy.TRANSACTIONS: "txns_24h",
    RankBy.LIQUIDITY: "liquidity",
    RankBy.FDV: "market_cap",
    RankBy.MARKET_CAP: "market_cap",
    RankBy.PRICE_CHANGE_H24: "change_24h",
    RankBy.PRICE_CHANGE_H6: "change_6h",
    RankBy.PRICE_CHANGE_H1: "change_1h",
    RankBy.TRENDING_SCORE_M5: "trending_score",
    RankBy.TRENDING_SCORE_H1: "trending_score",
    RankBy.TRENDING_SCORE_H6: "trending_score",
    RankBy.TRENDING_SCORE_H24: "trending_score",
}

# Which change column feeds the derived trending score per trending key.
TRENDING_CHANGE_COLUMN = {
    RankBy.TRENDING_SCORE_M5: "change_5m",
    RankBy.TRENDING_SCORE_H1: "change_1h",
    RankBy.TRENDING_SCORE_H6: "change_6h",
    RankBy.TRENDING_SCORE_H24: "change_24h",
}


@dataclass
class Filters:
    """Full filter configuration; every field optional (reference parity:
    dexscraper/config.py:77-132). ``range_spec`` maps each (min,max) pair to
    the column it constrains; override ``column_map`` to retarget the DSL at
    any table (the correctness harness points it at TPC-H ``lineitem``)."""

    chain_ids: list[Chain] = field(default_factory=list)
    dex_ids: list[DEX] = field(default_factory=list)

    def __post_init__(self):
        # coerce raw strings to the enums (idempotent — Enum(member) is a
        # no-op): a Filters spec round-tripped through JSON (the streaming
        # source's filters_json subscription option, a config file) hands
        # back "solana", and downstream `.value` access would break on it
        self.chain_ids = [Chain(c) for c in self.chain_ids]
        self.dex_ids = [DEX(d) for d in self.dex_ids]

    liquidity_min: Optional[float] = None
    liquidity_max: Optional[float] = None
    volume_h24_min: Optional[float] = None
    volume_h24_max: Optional[float] = None
    volume_h6_min: Optional[float] = None
    volume_h6_max: Optional[float] = None
    volume_h1_min: Optional[float] = None
    volume_h1_max: Optional[float] = None
    txns_h24_min: Optional[int] = None
    txns_h24_max: Optional[int] = None
    txns_h6_min: Optional[int] = None
    txns_h6_max: Optional[int] = None
    txns_h1_min: Optional[int] = None
    txns_h1_max: Optional[int] = None
    pair_age_min: Optional[float] = None   # hours
    pair_age_max: Optional[float] = None
    price_change_h24_min: Optional[float] = None
    price_change_h24_max: Optional[float] = None
    price_change_h6_min: Optional[float] = None
    price_change_h6_max: Optional[float] = None
    price_change_h1_min: Optional[float] = None
    price_change_h1_max: Optional[float] = None
    fdv_min: Optional[float] = None
    fdv_max: Optional[float] = None
    market_cap_min: Optional[float] = None
    market_cap_max: Optional[float] = None
    active_boosts_min: Optional[int] = None
    recent_purchased_impressions_min: Optional[int] = None
    max_launchpad_progress: Optional[float] = None

    # DSL columns that only the reference's SERVER can evaluate — no
    # local table materializes them, so skipping their bounds when the
    # frame lacks the column is expected (the server likewise drops URL
    # params it can't serve). A skipped bound on any OTHER column is
    # almost always a column_map typo and is logged loudly.
    SERVER_SIDE_ONLY_COLUMNS = frozenset(
        {"pair_age_hours", "launchpad_progress", "boost", "impressions"})

    # Default mapping of DSL range names → tokens-table columns.
    DEFAULT_COLUMNS = {
        "liquidity": "liquidity",
        "volume_h24": "volume_24h",
        "volume_h6": "volume_6h",
        "volume_h1": "volume_1h",
        "txns_h24": "txns_24h",
        "txns_h6": "txns_6h",
        "txns_h1": "txns_1h",
        "pair_age": "pair_age_hours",
        "price_change_h24": "change_24h",
        "price_change_h6": "change_6h",
        "price_change_h1": "change_1h",
        "fdv": "market_cap",
        "market_cap": "market_cap",
        "active_boosts": "boost",
        "recent_purchased_impressions": "impressions",
        "launchpad_progress": "launchpad_progress",
        "chain": "chain",
        "dex": "protocol",
    }

    def range_predicates(self, column_map: dict[str, str] | None = None):
        """Yield (column_name, op, literal) triples for all set bounds."""
        cmap = {**self.DEFAULT_COLUMNS, **(column_map or {})}
        for f in dc_fields(self):
            name = f.name
            value = getattr(self, name)
            if value is None or name in ("chain_ids", "dex_ids"):
                continue
            if name.endswith("_min"):
                base = name[: -len("_min")]
                if base in cmap:
                    yield cmap[base], ">=", value
            elif name.endswith("_max"):
                base = name[: -len("_max")]
                if base in cmap:
                    yield cmap[base], "<=", value
            elif name == "max_launchpad_progress":
                yield cmap["launchpad_progress"], "<=", value

    def _have(self, col_name: str, available_columns: set[str] | None,
              silent_columns: set[str] | None, where: str) -> bool:
        """Shared availability check for both compile paths: missing
        columns are skipped; the skip is silent for the known
        SERVER_SIDE_ONLY_COLUMNS and any caller-declared
        ``silent_columns`` (a source that documents which DSL columns it
        cannot serve, e.g. the CLI's decoded wire frame); anything else
        is almost always a column_map typo and logs a warning."""
        if available_columns is None or col_name in available_columns:
            return True
        if (col_name not in self.SERVER_SIDE_ONLY_COLUMNS
                and col_name not in (silent_columns or ())):
            logging.getLogger(__name__).warning(
                "Filters: bound on %r skipped — column not in %s "
                "(likely a column_map typo)", col_name, where)
        return False

    def to_column(self, column_map: dict[str, str] | None = None,
                  available_columns: set[str] | None = None,
                  silent_columns: set[str] | None = None) -> Column:
        """Compile to one conjunctive Catalyst predicate.

        Replaces ``Filters.to_query_params`` (config.py:134-242): instead of
        serializing to URL params for server-side filtering, emit a
        ``Column`` that Catalyst pushes into the scan. Unset bounds add no
        conjunct (reference omits the param). With ``available_columns``,
        predicates on columns the frame lacks are skipped (the reference's
        server likewise ignores params it can't serve) — silently only for
        the known SERVER_SIDE_ONLY_COLUMNS; any other skipped bound logs a
        warning, because it is usually a ``column_map`` typo that would
        otherwise return unfiltered rows without a trace.
        """
        cmap = {**self.DEFAULT_COLUMNS, **(column_map or {})}

        def has(col_name: str) -> bool:
            return self._have(col_name, available_columns, silent_columns,
                              "frame")

        pred = F.lit(True)
        for col_name, op, value in self.range_predicates(column_map):
            if not has(col_name):
                continue
            c = F.col(col_name)
            pred = pred & (c >= F.lit(value) if op == ">=" else c <= F.lit(value))
        if self.chain_ids and has(cmap["chain"]):
            pred = pred & F.col(cmap["chain"]).isin([c.value for c in self.chain_ids])
        if self.dex_ids and has(cmap["dex"]):
            pred = pred & F.col(cmap["dex"]).isin([d.value for d in self.dex_ids])
        return pred

    def to_sql(self, column_map: dict[str, str] | None = None,
               available_columns: set[str] | None = None,
               silent_columns: set[str] | None = None) -> str:
        """Render the same predicate as ANSI SQL (for oracle checks and for
        engines without a DataFrame API). ``available_columns`` skips
        bounds on columns the target table lacks — same escape hatch (and
        the same typo warning) as ``to_column``."""
        cmap = {**self.DEFAULT_COLUMNS, **(column_map or {})}

        def have(col_name: str) -> bool:
            return self._have(col_name, available_columns, silent_columns,
                              "table")

        conjuncts = [
            f"{col} {op} {value!r}" if isinstance(value, str) else f"{col} {op} {value}"
            for col, op, value in self.range_predicates(column_map)
            if have(col)
        ]
        if self.chain_ids and have(cmap["chain"]):
            vals = ", ".join(f"'{c.value}'" for c in self.chain_ids)
            conjuncts.append(f"{cmap['chain']} IN ({vals})")
        if self.dex_ids and have(cmap["dex"]):
            vals = ", ".join(f"'{d.value}'" for d in self.dex_ids)
            conjuncts.append(f"{cmap['dex']} IN ({vals})")
        return " AND ".join(conjuncts) if conjuncts else "TRUE"


@dataclass
class ScrapingConfig:
    """Query spec: filters + rank + order + limit (reference
    ``ScrapingConfig``, config.py:246-281). ``apply`` is the whole plan:
    filter → orderBy → limit; Catalyst turns it into a pushed-down scan +
    TakeOrderedAndProject (a distributed top-k: per-partition heaps, then a
    driver-side merge of k·partitions rows — no global sort at any scale)."""

    filters: Filters = field(default_factory=Filters)
    rank_by: RankBy = RankBy.TRENDING_SCORE_H6
    order: Order = Order.DESC
    timeframe: Timeframe = Timeframe.H6
    limit: int = 10

    def rank_column(self) -> str:
        return RANK_COLUMN[self.rank_by]

    def apply(self, df: DataFrame, column_map: dict[str, str] | None = None,
              rank_column: str | None = None) -> DataFrame:
        rank = rank_column or self.rank_column()
        if rank == "trending_score" and "trending_score" not in df.columns:
            from dexscraper_spark.functions.scoring import trending_score
            change_col = TRENDING_CHANGE_COLUMN.get(self.rank_by)
            if change_col is None:
                raise ValueError(
                    f"rank_column='trending_score' needs a trendingScore* "
                    f"rank_by to pick the change column, got {self.rank_by}")
            df = df.withColumn("trending_score", trending_score(
                F.col("volume_24h"), F.col(change_col), F.col("txns_24h")))
        c = F.col(rank)
        ordering = c.desc_nulls_last() if self.order == Order.DESC else c.asc_nulls_last()
        # available_columns: a preset may carry server-side-only DSL
        # bounds (pair_age_hours, launchpad_progress) that no local table
        # materializes — the reference drops unknown URL params the same
        # way; filters on columns the frame DOES have still all apply
        return (df.filter(self.filters.to_column(
                    column_map, available_columns=set(df.columns)))
                .orderBy(ordering).limit(self.limit))


class Presets:
    """Named query builders mirroring ``PresetConfigs`` (config.py:285-388)."""

    @staticmethod
    def trending(chain: Chain = Chain.SOLANA, timeframe: Timeframe = Timeframe.H6,
                 min_liquidity: float = 10_000, min_volume: float = 50_000,
                 min_txns: int = 100, limit: int = 10) -> ScrapingConfig:
        tf_rank = {
            Timeframe.M5: RankBy.TRENDING_SCORE_M5,
            Timeframe.H1: RankBy.TRENDING_SCORE_H1,
            Timeframe.H6: RankBy.TRENDING_SCORE_H6,
            Timeframe.H24: RankBy.TRENDING_SCORE_H24,
        }[timeframe]
        return ScrapingConfig(
            filters=Filters(chain_ids=[chain], liquidity_min=min_liquidity,
                            volume_h24_min=min_volume, txns_h24_min=min_txns),
            rank_by=tf_rank, order=Order.DESC, timeframe=timeframe, limit=limit)

    @staticmethod
    def top_volume(chain: Chain = Chain.SOLANA, limit: int = 10) -> ScrapingConfig:
        return ScrapingConfig(filters=Filters(chain_ids=[chain], liquidity_min=5_000),
                              rank_by=RankBy.VOLUME, order=Order.DESC, limit=limit)

    @staticmethod
    def gainers(chain: Chain = Chain.SOLANA, timeframe: Timeframe = Timeframe.H24,
                limit: int = 10) -> ScrapingConfig:
        rank = {
            Timeframe.H1: RankBy.PRICE_CHANGE_H1,
            Timeframe.H6: RankBy.PRICE_CHANGE_H6,
            Timeframe.H24: RankBy.PRICE_CHANGE_H24,
        }.get(timeframe, RankBy.PRICE_CHANGE_H24)
        return ScrapingConfig(
            filters=Filters(chain_ids=[chain], liquidity_min=10_000, volume_h24_min=10_000),
            rank_by=rank, order=Order.DESC, timeframe=timeframe, limit=limit)

    @staticmethod
    def new_pairs(chain: Chain = Chain.SOLANA, max_age_hours: float = 24,
                  limit: int = 10) -> ScrapingConfig:
        return ScrapingConfig(filters=Filters(chain_ids=[chain], pair_age_max=max_age_hours),
                              rank_by=RankBy.TRENDING_SCORE_H1, order=Order.DESC, limit=limit)

    @staticmethod
    def top_transactions(chain: Chain = Chain.SOLANA, limit: int = 10) -> ScrapingConfig:
        return ScrapingConfig(filters=Filters(chain_ids=[chain]),
                              rank_by=RankBy.TRANSACTIONS, order=Order.DESC, limit=limit)

    @staticmethod
    def boosted_only(chain: Chain = Chain.SOLANA, limit: int = 10) -> ScrapingConfig:
        return ScrapingConfig(filters=Filters(chain_ids=[chain], active_boosts_min=1),
                              rank_by=RankBy.TRENDING_SCORE_H6, order=Order.DESC, limit=limit)

    @staticmethod
    def pumpfun_trending(limit: int = 10) -> ScrapingConfig:
        return ScrapingConfig(
            filters=Filters(chain_ids=[Chain.SOLANA], dex_ids=[DEX.PUMPFUN],
                            max_launchpad_progress=95.0),
            rank_by=RankBy.TRENDING_SCORE_M5, order=Order.DESC,
            timeframe=Timeframe.M5, limit=limit)
