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

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_ARTIFACT_DIRS: list[str] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` whose handle clear_plan_cache() can release."""
    df.persist()
    _TRACKED.append(df)
    return df


def materialize_artifact(df: DataFrame, name: str) -> DataFrame:
    """The engine's materialized-view primitive: write ``df`` to a
    session-scoped parquet directory and return a SCAN of it.

    Two properties no in-memory alternative gives simultaneously:

    * **lineage-truncated reads** — the returned frame's plan is a file
      scan, so warm reads re-analyze a one-node plan instead of the full
      build tree (measured 0.1-0.4 s of driver-side analysis per read
      for the curation/IVF/bar artifacts at sf0.1);
    * **deterministic release** — :func:`release_artifacts` (or the
      per-frame :func:`release_artifact`) deletes the directory; no
      reliance on ContextCleaner/GC (``unpersist()`` is a silent no-op
      on localCheckpoint blocks, and the RDD handle is off limits — the
      engine is pure-DataFrame by pinned test).

    This is also the production shape: a nightly artifact IS a written
    table (write_curated, ivf_save); the bench artifacts simply live in
    a temp dir with engine-managed lifetime. A frame scanned after its
    directory was released fails LOUDLY (FILE_NOT_EXIST) — consistent
    with the plan cache's loud-staleness contract; clear_plan_cache()
    rebuilds on the next call.
    """
    path = tempfile.mkdtemp(prefix=f"dexart_{name}_")
    df.write.mode("overwrite").parquet(path)
    _ARTIFACT_DIRS.append(path)
    scan = df.sparkSession.read.parquet(path)
    scan._dexart_path = path  # release handle for release_artifact()
    return scan


def release_artifact(df: DataFrame) -> bool:
    """Delete the artifact directory backing one materialize_artifact
    frame (per-object release, e.g. ``IvfIndex.unpersist``). Returns
    False for frames that aren't artifacts so callers can fall back to
    ``unpersist()``."""
    path = getattr(df, "_dexart_path", None)
    if path is None:
        return False
    shutil.rmtree(path, ignore_errors=True)
    try:
        _ARTIFACT_DIRS.remove(path)
    except ValueError:
        pass  # already swept by release_artifacts()
    return True


def release_tracked() -> None:
    """Unpersist every tracked frame (refresh-cycle storage hygiene).

    Deliberately does NOT delete materialized artifact directories:
    module caches (_OHLC_BARS_CACHE, _BARS_CACHE, _TOKENS_CACHE,
    _IVF_INDEX_CACHE, the plan cache) hold live scans of those dirs, and
    standalone callers of this function (clear_curation_cache, tests) do
    not clear them — deleting here would leave permanently-dangling
    cached frames. Only :func:`release_artifacts`, called by
    registry.clear_plan_cache() AFTER every module cache is cleared, may
    sweep the dirs."""
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # owning session already stopped; entry is dead anyway
    _TRACKED.clear()


def release_artifacts() -> None:
    """Delete every materialized artifact directory. Call only after the
    module caches holding their scans are cleared (clear_plan_cache does
    this in order), or at process exit."""
    for p in _ARTIFACT_DIRS:
        shutil.rmtree(p, ignore_errors=True)
    _ARTIFACT_DIRS.clear()


# Processes that exit without a final clear_plan_cache() (bench, CLI,
# pytest) must not strand sf-scale parquet in the temp dir — the
# cache()/localCheckpoint storage this mechanism replaced died with the
# JVM automatically; match that.
atexit.register(release_artifacts)
