"""Tracked persists — single release point for every internal
``.persist()`` the engine's operators take.

Operators persist intermediates they read more than once (simhash
fingerprints, MinHash candidate pairs, the fine OHLC bar frame, IVF
assignments, the curation dedup frame). Those handles used to be
function-locals: nothing outside the operator could unpersist them, so
every artifact refresh/rebuild cycle leaked block-manager storage.
Routing them through :func:`tracked_persist` gives
``registry.clear_plan_cache()`` (the REFRESH entry point) one switch
that releases them all.

Kept as a flat list, not app-keyed: entries belonging to stopped
sessions unpersist as harmless no-ops, and a long-lived engine calls
release on every refresh anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` whose handle clear_plan_cache() can release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> None:
    """Unpersist every tracked frame (refresh-cycle storage hygiene)."""
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # owning session already stopped; entry is dead anyway
    _TRACKED.clear()
