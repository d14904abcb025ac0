"""Streaming as-of join — the point-in-time lookup as keyed streaming
state (engine extension; batch twin in operators/temporal.py).

Spark's stream-stream joins need an interval condition plus a downstream
aggregation to express "latest right at or before each left" — two
stateful operators and a state footprint proportional to the tolerance
window on BOTH sides.  The keyed-state form here is O(1) state per key:
``applyInPandasWithState`` keeps only the most recent right row seen per
key and emits every left row decorated with it.  That is exactly the
batch union-tag strategy (operators/temporal.py) run incrementally.

Semantics and ordering: identical to the batch operator — right rows at
exactly left_ts match, equal-ts rights resolve to max id — PROVIDED each
key's rows arrive in event-time order across micro-batches (rows within
one batch are sorted before folding).  A right row arriving late, after
a left row it should have matched was already emitted, cannot
retroactively re-emit that left — the standard streaming trade-off; size
micro-batches/watermark so per-key order holds, or replay in batch for
the exact relation (same function, by construction).

State eviction: with ``tolerance_ms`` set, a key's right-state is
useless once the watermark passes last_right_ts + tolerance, and
EventTimeTimeout evicts it (bounded state).  Without a tolerance the
backward as-of semantically needs the last right row forever, so state
is retained (one row per key — still bounded by key cardinality).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, "
    "asof_ts timestamp, asof_event_id long, asof_value double"
)

STATE_SCHEMA = "last_ts timestamp, last_id long, last_value double"


def make_asof_stateful_fn(tolerance_ms: int | None):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        last_ts, last_id, last_value = (
            state.get if state.exists else (None, None, None)
        )
        rows = []
        for pdf in pdfs:
            rows.extend(pdf.to_dict("records"))
        # rights before lefts at equal ts; max id wins among equal-ts
        # rights (the batch operator's pinned tie rule)
        rows.sort(key=lambda r: (r["ts"], -int(r["is_right"]), r["row_id"]))
        out = []
        for r in rows:
            if r["is_right"]:
                if last_ts is None or (r["ts"], r["row_id"]) >= (
                    last_ts,
                    last_id,
                ):
                    last_ts, last_id, last_value = (
                        r["ts"],
                        int(r["row_id"]),
                        float(r["value"]),
                    )
                continue
            ok = last_ts is not None and (
                tolerance_ms is None
                or (r["ts"] - last_ts).total_seconds() * 1000 <= tolerance_ms
            )
            out.append(
                {
                    "user_id": user_id,
                    "event_id": int(r["row_id"]),
                    "ts": r["ts"],
                    "asof_ts": last_ts if ok else None,
                    "asof_event_id": last_id if ok else None,
                    "asof_value": last_value if ok else None,
                }
            )
        if last_ts is not None:
            state.update((last_ts, last_id, last_value))
            if tolerance_ms is not None:
                evict_ms = int(last_ts.timestamp() * 1000) + tolerance_ms
                state.setTimeoutTimestamp(
                    max(evict_ms, state.getCurrentWatermarkMs() + 1)
                )
        if out:
            yield pd.DataFrame(out)

    return fn


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    tolerance_ms: int | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming backward as-of: ``left``/``right`` are streams with
    (user_id, event_id, ts) and (user_id, event_id, ts, value); returns
    every left row plus the most recent right row at or before it.

    Both streams are union-tagged into ONE keyed stateful operator, so
    there is a single shuffle on user_id and a single state store —
    mirroring the batch plan (one exchange, no join node)."""
    l = left.select(
        "user_id",
        F.col("event_id").alias("row_id"),
        "ts",
        F.lit(0).alias("is_right"),
        F.lit(None).cast("double").alias("value"),
    )
    r = right.select(
        "user_id",
        F.col("event_id").alias("row_id"),
        "ts",
        F.lit(1).alias("is_right"),
        F.col("value").cast("double").alias("value"),
    )
    unioned = l.unionByName(r).withWatermark("ts", watermark)
    return unioned.groupBy("user_id").applyInPandasWithState(
        make_asof_stateful_fn(tolerance_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
