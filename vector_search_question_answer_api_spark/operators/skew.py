"""Skew-safe ranking: exact top-k per key via salting.

AQE's skew handling splits oversized SHUFFLE JOIN partitions, but a
window `row_number() <= k` still sorts each key inside ONE task — a key
with 10^9 rows is a straggler no planner fixes.  WindowGroupLimit (Spark
3.5+) prunes each input partition to its local top-k BEFORE the
exchange, which removes most of the pain for small k; what it cannot do
is parallelize the per-key merge when even the pruned stream for one hot
key overwhelms a task, or help aggregations that carry heavy payloads.

``salted_topk_per_key`` makes the two-phase structure explicit and
EXACT: the top-k of the union of per-salt top-ks is the global top-k
(every global top-k row survives its own salt's local cut).  Phase 1
ranks within (key, salt) — the hot key's work spreads over ``n_salts``
tasks; phase 2 re-ranks the surviving ``n_salts * k`` rows per key —
bounded input regardless of the key's original size.

Equivalence with the direct window is pinned in test_skew; the direct
form stays the default everywhere (one shuffle beats two when keys are
well-behaved) — this is the lever you switch on for Zipfian keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    k: int,
    n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Exact top-k rows per key under ``order_cols`` (include an id
    tiebreak for determinism), computed in two salted phases.

    ``salt_col`` names a column to derive the salt from (hashed mod
    n_salts — deterministic); the default hashes EVERY input column, so
    the salt is a pure function of row content.  Content-derived salts
    are mandatory for exactness under stage retries: a salt drawn from
    ``monotonically_increasing_id`` or ``rand`` changes when a phase-1
    partition is recomputed after a shuffle-fetch failure, and the
    row_number cut could then drop a true top-k row (ADVICE r3).  Any
    salt assignment preserves top-k exactness; determinism only requires
    that each ROW keeps the same salt across recomputations, which
    content hashing guarantees (duplicate rows sharing a salt is
    harmless — worst case the spread is less even)."""
    if salt_col is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    salted = df.withColumn("__salt", salt)
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(*order_cols)
    local = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__salt", "__rn")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        local.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank")
    )
