"""As-of join (operators/temporal.py): backward semantics, tie rules,
tolerance, and stratified sampling quotas (operators/pipeline.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.pipeline import (
    stratified_sample,
)
from vector_search_question_answer_api_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00")),
            (1, 101, _ts("2024-01-01T12:00:00")),
            (1, 102, _ts("2024-01-01T09:00:00")),  # before any right row
            (2, 200, _ts("2024-01-01T10:30:00")),
            (3, 300, _ts("2024-01-01T10:00:00")),  # key with no right rows
        ],
        ["user_id", "event_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (1, 900, _ts("2024-01-01T09:30:00"), 5.0),
            (1, 901, _ts("2024-01-01T11:00:00"), 7.0),
            (2, 910, _ts("2024-01-01T10:30:00"), 1.0),  # exactly simultaneous
            (2, 911, _ts("2024-01-01T10:30:00"), 2.0),  # same ts, higher id
        ],
        ["user_id", "event_id", "ts", "value"],
    )
    return left, right


def test_asof_backward_semantics(spark, sides):
    left, right = sides
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on="user_id", right_id="event_id",
            payload_cols=["value"],
        ).collect()
    }
    assert len(out) == 5  # every left row survives
    assert out[100]["asof_event_id"] == 900  # 09:30 <= 10:00
    assert out[101]["asof_event_id"] == 901  # latest prior, not first
    assert out[102]["asof_event_id"] is None  # nothing at or before
    assert out[300]["asof_event_id"] is None  # keyless
    # exactly-simultaneous right row matches; max event_id wins the ts tie
    assert out[200]["asof_event_id"] == 911
    assert out[200]["asof_value"] == 2.0
    assert out[200]["asof_ts"] == _ts("2024-01-01T10:30:00")


def test_asof_tolerance(spark, sides):
    left, right = sides
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on="user_id", right_id="event_id",
            payload_cols=["value"], tolerance_ms=45 * 60 * 1000,
        ).collect()
    }
    assert out[100]["asof_event_id"] == 900  # 30 min gap, within tolerance
    # 12:00 - 11:00 = 60 min exceeds 45 min -> match nulled
    assert out[101]["asof_event_id"] is None
    assert out[101]["asof_value"] is None


def test_asof_tolerance_boundary(spark, sides):
    left, right = sides
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on="user_id", right_id="event_id",
            payload_cols=["value"], tolerance_ms=60 * 60 * 1000,
        ).collect()
    }
    # exactly at tolerance (60 min) still matches (<=)
    assert out[101]["asof_event_id"] == 901
    out2 = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on="user_id", right_id="event_id",
            payload_cols=["value"], tolerance_ms=60 * 60 * 1000 - 1,
        ).collect()
    }
    assert out2[101]["asof_event_id"] is None


def test_stratified_sample_exact_quotas(spark):
    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = stratified_sample(df, ["source"], 4).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert {len(v) for v in by_src.values()} == {4}
    # small stratum: quota capped at stratum size
    tiny = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["doc_id", "source"])
    got2 = stratified_sample(tiny, ["source"], 5).collect()
    assert len(got2) == 3


def test_stratified_sample_deterministic_and_salted(spark):
    rows = [(i, "x") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = sorted(r["doc_id"] for r in stratified_sample(df, ["source"], 10).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, ["source"], 10).collect())
    assert a == b  # reproducible
    c = sorted(
        r["doc_id"]
        for r in stratified_sample(df, ["source"], 10, salt="other").collect()
    )
    assert a != c  # a different salt draws a different sample


def test_interval_join_exact_incl_long_intervals(spark):
    """Binned interval join must be exact even when an interval spans many
    bins (ADVICE r3: start/end-bin-only registration dropped middle-bin
    points)."""
    from vector_search_question_answer_api_spark.operators.temporal import (
        interval_join,
    )

    points = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:05")),
            (1, 11, _ts("2024-01-01T10:03:00")),  # middle bin of the long interval
            (1, 12, _ts("2024-01-01T10:07:59")),
            (1, 13, _ts("2024-01-01T10:08:01")),  # just past the long interval
            (2, 20, _ts("2024-01-01T10:00:30")),
        ],
        ["user_id", "point_id", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            # 8-minute interval with bin_ms = 1 min: spans 9 bins
            (1, 100, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:08:00")),
            (1, 101, _ts("2024-01-01T10:02:30"), _ts("2024-01-01T10:03:30")),
            (2, 200, _ts("2024-01-01T10:01:00"), _ts("2024-01-01T10:02:00")),
        ],
        ["user_id", "iv_id", "start_ts", "end_ts"],
    )
    got = {
        (r["point_id"], r["iv_id"])
        for r in interval_join(
            points, intervals, ["user_id"], bin_ms=60_000
        ).collect()
    }
    # brute-force reference
    want = set()
    for p in points.collect():
        for iv in intervals.collect():
            if (
                p["user_id"] == iv["user_id"]
                and iv["start_ts"] <= p["ts"] <= iv["end_ts"]
            ):
                want.add((p["point_id"], iv["iv_id"]))
    assert got == want
    assert (10, 100) in got and (11, 100) in got and (12, 100) in got
    assert (13, 100) not in got
    assert (20, 200) not in got  # 10:00:30 before interval start
