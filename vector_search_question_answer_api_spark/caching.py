"""Tracked persist registry shared by operators whose plans fan an
expensive intermediate into multiple branches (dedup pair generators,
the BM25 inverted-index build).

Operators return LAZY DataFrames, so they cannot unpersist their own
intermediates; each persist is recorded here and released by the caller
via ``unpersist_all()`` after materializing, or scoped with
``cache_scope()``.  The registry is process-global and NOT thread-safe:
concurrent queries in one session should each run under their own
``cache_scope()`` from a single thread, or skip cleanup and let Spark's
LRU evict (ADVICE r1/r2 low).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live_caches: list[DataFrame] = []
_live_broadcasts: list = []


def persist_tracked(df: DataFrame) -> DataFrame:
    df.persist()
    _live_caches.append(df)
    return df


def broadcast_tracked(sc, value):
    """``sc.broadcast`` with registry-scoped cleanup, for operators that
    ship a driver-built value (e.g. the exact-kNN query matrix) from
    inside a lazy plan: the broadcast must outlive the builder, so the
    builder cannot release it — without tracking, every call leaks its
    blob for the session's lifetime (visible as monotonic driver growth
    in long bench/soak processes).  ``unpersist()`` on release, not
    ``destroy()``: a still-live plan that re-executes after its scope
    closed re-fetches from the driver instead of crashing."""
    b = sc.broadcast(value)
    _live_broadcasts.append(b)
    return b


def unpersist_all() -> None:
    """Release every tracked cache and broadcast."""
    while _live_caches:
        _live_caches.pop().unpersist()
    while _live_broadcasts:
        _live_broadcasts.pop().unpersist()


class cache_scope:
    """Context manager releasing only the caches created inside it::

        with cache_scope():
            minhash_lsh_pairs(docs).write.parquet(out)

    Safer than ``unpersist_all`` when other results in the session still
    have live lazy plans over earlier caches.  Single-threaded, like the
    registry itself."""

    def __enter__(self) -> "cache_scope":
        self._mark = len(_live_caches)
        self._bmark = len(_live_broadcasts)
        return self

    def __exit__(self, *exc) -> None:
        while len(_live_caches) > self._mark:
            _live_caches.pop().unpersist()
        while len(_live_broadcasts) > self._bmark:
            _live_broadcasts.pop().unpersist()
