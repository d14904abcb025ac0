"""Temporal operators: as-of join (point-in-time lookup).

Engine extension: the reference's session manager does an implicit
point-in-time lookup — "the state of the conversation as of this
question" (utils/session_manager.py:28-44) — and any feature/training
pipeline needs the general form: for each left row, the most recent
right row at or before it per key.  Spark has no ASOF JOIN operator
(SPARK-22947 is open); a naive range join explodes to O(|L| x |R|) per
key.  This implements it scale-safely as the classic union-tag trick:

1. union the two sides with a side tag, right rows carrying their
   payload as a struct, left rows carrying null;
2. one window per key ordered by (ts, side, right_id) with
   ``last(payload, ignorenulls=True)`` over the unbounded-preceding
   frame — each left row picks up the latest right row sorted before it;
3. keep the left rows, unpack the struct.

Cost: ONE shuffle on the join key + one per-partition sort — the same
shape as a sort-merge join, with no pairwise comparison.  Skewed keys
can be salted upstream like any windowed op; AQE handles moderate skew.

Tie semantics (pinned, and mirrored by the oracle): right rows at
exactly left_ts DO match ("at or before"), and among right rows with
identical (key, ts) the one with the greatest ``right_id`` wins —
deterministic where DuckDB's native ASOF leaves it unspecified, which is
why the gate dedupes equal-ts right rows the same way on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_id: str | None = None,
    payload_cols: list[str] | None = None,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row, plus the payload of the
    most recent ``right`` row with ``right_ts <= left_ts`` on the same
    key(s), as nullable ``asof_<col>`` columns (null = no prior right
    row, or none within ``tolerance_ms``).

    ``right_id`` breaks ties among right rows sharing (key, ts) —
    greatest id wins; required if such ties are possible.
    ``payload_cols`` defaults to every right column except the keys and
    timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [
            c
            for c in right.columns
            if c not in keys and c != right_ts and c != right_id
        ]
    payload = F.struct(
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(c) for c in payload_cols],
        *([F.col(right_id).alias(right_id)] if right_id else []),
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        (F.col(right_id) if right_id else F.lit(0)).cast("long").alias("__rid"),
        payload.alias("__payload"),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(0).cast("long").alias("__rid"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Rights sort before lefts at equal ts (__is_right desc) so an
    # exactly-simultaneous right row is visible to the left row; among
    # equal-ts rights, ascending __rid puts the greatest id last, and
    # last(ignorenulls) takes it.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc(), F.col("__rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attached = (
        unioned.withColumn(
            "__match", F.last("__payload", ignorenulls=True).over(w)
        )
        .filter(F.col("__is_right") == 0)
    )
    if tolerance_ms is not None:
        attached = attached.withColumn(
            "__match",
            F.when(
                F.unix_millis(F.col(left_ts))
                - F.unix_millis(F.col("__match.__asof_ts"))
                <= F.lit(tolerance_ms),
                F.col("__match"),
            ),
        )
    out_cols = [F.col(c) for c in left_cols]
    out_cols.append(F.col("__match.__asof_ts").alias("asof_ts"))
    for c in payload_cols:
        out_cols.append(F.col(f"__match.{c}").alias(f"asof_{c}"))
    if right_id:
        out_cols.append(F.col(f"__match.{right_id}").alias(f"asof_{right_id}"))
    return attached.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bin_ms: int | None = None,
    max_interval_ms: int | None = None,
) -> DataFrame:
    """Inner interval join: every (point, interval) pair on the same
    key(s) with ``start_ts <= point_ts <= end_ts`` (inclusive ends).

    Spark plans a raw range predicate as a sort-merge over the equi-keys
    with a post-filter — fine when keys are selective, catastrophic when
    a key holds millions of rows on both sides (per-key O(|P|·|I|)).
    The standard fix is BINNING: pick a ``bin_ms``, register each
    interval under EVERY bin it overlaps (``sequence(floor(start/bin),
    floor(end/bin))`` — for intervals no longer than ``bin_ms`` that is
    <= 2 bins), map each point to its single bin, equi-join on
    (keys..., bin), then apply the exact range filter.  Any qualifying
    pair shares the point's bin, so the relation is EXACT for ANY
    interval length; the join degenerates from per-key quadratic to
    per-(key, bin) local.  Intervals much longer than ``bin_ms`` fan out
    to length/bin_ms replicas — pick ``bin_ms`` near the typical
    interval length so the fanout stays ~2.

    ``bin_ms`` defaults to ``max_interval_ms`` (the typical/maximum
    interval length the caller expects); pass ``bin_ms`` explicitly when
    interval lengths are data-dependent.

    Output: all point columns + all interval columns (names must not
    collide apart from the keys).
    """
    if bin_ms is None:
        if max_interval_ms is None:
            raise ValueError("pass bin_ms or max_interval_ms")
        bin_ms = max_interval_ms
    # integer `div`, not `/`-then-cast: binning only needs a MONOTONE
    # integer quantizer applied identically to both sides, and exact
    # integer division is that by construction (float division + cast
    # would be, at best, accidentally so)
    p_bin = F.expr(f"unix_millis({point_ts}) div {bin_ms}")
    s_bin = F.expr(f"unix_millis({start_ts}) div {bin_ms}")
    e_bin = F.expr(f"unix_millis({end_ts}) div {bin_ms}")
    pts = points.withColumn("__bin", p_bin)
    ivs = intervals.withColumn("__bin", F.explode(F.sequence(s_bin, e_bin)))
    joined = pts.join(ivs, [*keys, "__bin"]).filter(
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("__bin")
