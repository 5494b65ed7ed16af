"""Tracked DataFrame caching — scoped cache hygiene for query plans.

Operators persist intermediate tables that feed multiple plan branches
(shingle tables, token projections, per-doc aggregates). They return
LAZY DataFrames, so they cannot unpersist before the caller's action —
and a long-lived session (the 37-query bench, a serving process) that
never unpersists accumulates storage memory until the context dies.

Contract: operators call :func:`persist_tracked` instead of
``df.persist()``; the OWNER of the session (bench harness, test
fixture, serving loop) calls :func:`release_all` after each query's
final action. At 100-TB scale this is the same discipline as
checkpoint-table lifecycle management — caches are scoped to a query,
not leaked to the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame, level=None) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK default) and register the handle
    so :func:`release_all` can free it after the query's action."""
    from pyspark import StorageLevel

    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _LIVE.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked handle (blocking=False — eviction is
    async, correctness never depends on cached data). Returns the
    number of handles released."""
    global _LIVE
    handles, _LIVE = _LIVE, []
    n = 0
    for df in handles:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return n
