"""Time-travel reads (r12): ``read_index_asof`` / ``read_corpus_docs
(asof_ts=)`` — the reproducibility surface ("which corpus state produced
this dataset?") derived from the logs the stores already keep.  Exactness
contracts: the index as-of read is exact back to the compaction horizon
(a compaction keeps only each doc's latest row, so older states resolve
the doc to ABSENT, never to a wrong version); the docs store is never
compacted, so its as-of reads are exact at any T."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.streaming import (
    index_stream as IX,
    ingest_stream as IG,
)

DIM = 8


def _rows(spark, specs):
    """specs: (doc_id, version, ts_ms, deleted) -> index-log relation."""
    data = []
    for doc, ver, ts_ms, deleted in specs:
        vec = (
            None
            if deleted
            else [1.0 if j == (doc + 3 * ver) % DIM else 0.1 for j in range(DIM)]
        )
        data.append((doc, doc, vec, None if deleted else 1.0, ts_ms))
    df = spark.createDataFrame(
        data,
        "vec_id long, doc_id long, norm_embedding array<float>, "
        "norm double, ts long",
    )
    return df.select(
        F.timestamp_millis(F.col("ts")).alias("ts"),
        "vec_id",
        "doc_id",
        "norm_embedding",
        "norm",
    )


def _state(df):
    return {
        (int(r["doc_id"]), tuple(round(x, 6) for x in r["norm_embedding"]))
        for r in df.select("doc_id", "norm_embedding").collect()
    }


def _ms(m):
    return F.timestamp_millis(F.lit(m))


@pytest.fixture()
def history(spark, tmp_path):
    """Three batches over event times 1000/2000/3000: doc 0 upserted at
    every step, doc 1 deleted at t2000 and revived at t3000, doc 2 born
    at t2000."""
    path = str(tmp_path / "ix")
    b0 = _rows(spark, [(0, 0, 1000, False), (1, 0, 1000, False)])
    b1 = _rows(spark, [(0, 1, 2000, False), (1, 0, 2000, True),
                       (2, 0, 2000, False)])
    b2 = _rows(spark, [(0, 2, 3000, False), (1, 1, 3000, False)])
    for i, b in enumerate((b0, b1, b2)):
        b.withColumn("_batch", F.lit(i)).write.mode("append").parquet(
            os.path.join(path, "log")
        )
    return path


def test_asof_reproduces_every_historical_state(spark, history):
    path = history

    def expect(specs):
        return _state(_rows(spark, [(d, v, 0, False) for d, v in specs]))

    # T=1500: both docs at v0
    asof = IX.read_index_asof(spark, path, datetime.fromtimestamp(1.5))
    assert _state(asof) == expect([(0, 0), (1, 0)])
    # T=2500: doc 0 at v1, doc 1 DELETED, doc 2 born
    asof = IX.read_index_asof(spark, path, datetime.fromtimestamp(2.5))
    assert _state(asof) == expect([(0, 1), (2, 0)])
    # T=3500 == the live view (doc 1 revived at v1)
    asof = IX.read_index_asof(spark, path, datetime.fromtimestamp(3.5))
    assert _state(asof) == _state(IX.read_index_latest(spark, path))
    assert _state(asof) == expect([(0, 2), (1, 1), (2, 0)])
    # T before everything: empty corpus
    assert IX.read_index_asof(
        spark, path, datetime.fromtimestamp(0.5)
    ).count() == 0


def test_asof_exactness_bounded_by_compaction_horizon(spark, history):
    """After a compaction only each doc's LATEST row survives (with its
    original ts): an as-of read older than that version resolves the doc
    to ABSENT — never a wrong version — while as-of reads at or after
    each surviving version stay exact."""
    path = history
    live_before = _state(IX.read_index_latest(spark, path))
    pre_asof25 = _state(
        IX.read_index_asof(spark, path, datetime.fromtimestamp(2.5))
    )
    IX.compact_index(spark, path)
    assert _state(IX.read_index_latest(spark, path)) == live_before
    # the live-state as-of is still exact (every surviving row <= T)
    assert _state(
        IX.read_index_asof(spark, path, datetime.fromtimestamp(3.5))
    ) == live_before
    # T=2500 now misses doc 0's superseded v1 (only v2@t3000 survived):
    # doc 0 resolves ABSENT; doc 2's surviving row IS its t2000 version,
    # so it remains exact.  Nothing resolves to a wrong version.
    post = _state(IX.read_index_asof(spark, path, datetime.fromtimestamp(2.5)))
    assert post != pre_asof25
    assert {d for d, _ in post} == {2}
    assert post < pre_asof25  # strictly a subset — absent, never wrong


def test_docs_store_asof_is_exact_at_any_time(spark, tmp_path):
    """The docs store keeps every version's row (no compaction), so its
    as-of reads are exact at any T — including across a profile rebuild,
    which retires PROFILE batch dirs, never docs rows."""
    from vector_search_question_answer_api_spark.sources.tables import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .filter("doc_id < 8")
        .select(
            "doc_id",
            F.timestamp_millis(F.lit(1000) + F.col("doc_id")).alias("ts"),
            "text",
            "n_chars",
            F.lit(False).alias("_delete"),
        )
    )
    b1 = (
        docs.filter("doc_id < 3")
        .withColumn("text", F.concat(F.lit("v2 "), "text"))
        .withColumn("n_chars", F.length("text"))
        .withColumn("ts", _ms(5000))
    )
    b2 = (
        docs.filter("doc_id = 4")
        .withColumn("_delete", F.lit(True))
        .withColumn("ts", _ms(9000))
    )
    tmp = tmp_path
    for i, b in enumerate((docs, b1, b2)):
        b.coalesce(1).write.parquet(f"{tmp}/src/b{i}")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/src/*")
    )
    q = IG.maintain_corpus(
        stream,
        str(tmp / "corpus"),
        checkpoint=str(tmp / "ckpt"),
        dim=64,
        trigger_once=True,
        docs_store=True,
    )
    assert q.awaitTermination(300)
    root = str(tmp / "corpus")

    def texts(**kw):
        return {
            (int(r["doc_id"]), r["text"])
            for r in IG.read_corpus_docs(spark, root, **kw).collect()
        }

    # T=2000: the original 8 docs, original text
    t2 = texts(asof_ts=datetime.fromtimestamp(2.0))
    assert len(t2) == 8 and all(not t.startswith("v2 ") for _, t in t2)
    # T=6000: docs 0-2 at v2, doc 4 still alive
    t6 = texts(asof_ts=datetime.fromtimestamp(6.0))
    assert sum(1 for _, t in t6 if t.startswith("v2 ")) == 3
    assert 4 in {d for d, _ in t6}
    # T=10000 == the live view (doc 4 deleted)
    t10 = texts(asof_ts=datetime.fromtimestamp(10.0))
    assert t10 == texts() and 4 not in {d for d, _ in t10}
