"""Incremental maintenance for exact duplicated-span dedup.

``operators/spans.duplicate_spans`` recomputes token k-gram occurrences
from raw text on every run — at 100 TB the tokenize + hash map work over
the whole corpus dominates, and it is the one part of the pipeline that
never changes for an already-ingested document.  This module makes the
span pipeline incremental the same way ``stats_stream`` makes profiling
incremental: both persisted artifacts are LINEAR in the document stream,
so per-batch appends merge exactly.

Per micro-batch of documents (map-only + one batch-sized agg, nothing
corpus-sized):

- **occurrences** ``(doc_id, pos, h1, h2)`` — the batch's token k-gram
  rows, appended under ``occ/batch=<id>``.  Pure map output; rows for a
  document never change after ingest (documents are immutable in this
  corpus model — re-ingest under a new doc_id, or rewrite the batch dir).
- **gram-agg delta** ``(h1, h2, n_occ, first_doc, first_pos)`` — the
  batch's per-gram count + canonical minimum, appended under
  ``agg/batch=<id>``.  Counts are sums and canonical occurrences are
  mins — both merge associatively, so the union of deltas re-aggregated
  equals the one-shot corpus aggregate EXACTLY.

Both directories use ``batch=<id>`` overwrite (not append) so checkpoint
replays of a failed batch land on top of their own first attempt —
linear counters are not idempotent under duplicate appends, per-batch
overwrite makes them so (same rule as ``stats_stream``).

Snapshot-time span extraction (:func:`corpus_spans_from_store`) then runs
the SAME mark + island-merge logic as the batch operator, but over the
stored occurrences and the merged gram aggregate — two shuffles over
already-materialized columnar data, zero re-tokenization.  Equivalence is
pinned bit-for-bit in ``tests/test_spans.py`` (store-driven spans ==
``duplicate_spans`` over the unioned documents).

Read-side width is bounded the same way as the index log: per-batch agg
deltas accumulate, :func:`compact_gram_store` folds them into one
``batch=compacted`` generation (a single corpus-gram-sized shuffle,
amortized across many cheap batches).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators import spans as SPN

COMPACTED = "batch=compacted"


def batch_gram_delta(occ: DataFrame) -> DataFrame:
    """Per-gram aggregate of ONE batch's occurrence rows: ``(h1, h2,
    n_occ, first_doc, first_pos)``.  Count is a sum, canonical occurrence
    a min — the two mergeable pieces the global aggregate needs."""
    return occ.groupBy("h1", "h2").agg(
        F.count("*").alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("first"),
    ).select(
        "h1",
        "h2",
        "n_occ",
        F.col("first.doc_id").alias("first_doc"),
        F.col("first.pos").alias("first_pos"),
    )


def append_span_batch(
    batch_df: DataFrame,
    path: str,
    batch_id: int,
    k: int = SPN.DEFAULT_K,
    text_col: str = "text",
) -> None:
    """Ingest one micro-batch: tokenize + hash ONCE, persist the
    occurrence rows and the gram-agg delta under ``batch=<id>``
    (overwrite — replay-idempotent)."""
    sub = f"batch={int(batch_id)}"
    occ = SPN.token_gram_occurrences(batch_df, k, text_col)
    occ.write.mode("overwrite").parquet(os.path.join(path, "occ", sub))
    # read back the materialized batch rows rather than recomputing the
    # gram transform for the agg (one tokenize pass per batch, as promised)
    spark = batch_df.sparkSession
    occ_stored = spark.read.parquet(os.path.join(path, "occ", sub))
    batch_gram_delta(occ_stored).write.mode("overwrite").parquet(
        os.path.join(path, "agg", sub)
    )


def maintain_span_store(
    doc_stream: DataFrame,
    path: str,
    checkpoint: str,
    k: int = SPN.DEFAULT_K,
    trigger_once: bool = False,
):
    """Structured Streaming driver: foreachBatch → :func:`append_span_batch`."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        append_span_batch(batch_df, path, batch_id, k=k)

    writer = doc_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_occurrences(spark: SparkSession, path: str) -> DataFrame:
    """All stored occurrence rows (columnar, already hashed)."""
    return spark.read.parquet(os.path.join(path, "occ")).select(
        "doc_id", "pos", "h1", "h2"
    )


def read_gram_aggs(spark: SparkSession, path: str) -> DataFrame:
    """The merged corpus gram aggregate: union of per-batch deltas,
    re-aggregated.  Merging is exact (sums of sums, min of mins) — equal
    to the one-shot aggregate over all occurrences."""
    parts = spark.read.parquet(os.path.join(path, "agg"))
    return (
        parts.groupBy("h1", "h2")
        .agg(
            F.sum("n_occ").alias("n_occ"),
            F.min(F.struct(F.col("first_doc"), F.col("first_pos"))).alias("first"),
        )
        .select(
            "h1",
            "h2",
            "n_occ",
            F.col("first.first_doc").alias("first_doc"),
            F.col("first.first_pos").alias("first_pos"),
        )
    )


def compact_gram_store(spark: SparkSession, path: str) -> None:
    """Fold every per-batch agg delta into one ``batch=compacted``
    generation, bounding read-side union width (the stats_stream /
    index-log compaction rule applied to the gram aggregate).  Writes to a
    scratch dir first so a crash mid-compaction leaves the live deltas
    untouched."""
    agg_dir = os.path.join(path, "agg")
    merged = read_gram_aggs(spark, path)
    tmp = os.path.join(path, ".agg-compact-tmp")
    merged.write.mode("overwrite").parquet(tmp)
    old = [
        os.path.join(agg_dir, d)
        for d in os.listdir(agg_dir)
        if d.startswith("batch=")
    ]
    dest = os.path.join(agg_dir, COMPACTED)
    for d in old:
        shutil.rmtree(d)
    os.replace(tmp, dest)


def corpus_spans_from_store(
    spark: SparkSession,
    path: str,
    k: int = SPN.DEFAULT_K,
    keep_first: bool = True,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """``(doc_id, span_start, span_end, n_tokens)`` over the WHOLE stored
    corpus — identical output to ``operators/spans.duplicate_spans`` on
    the unioned documents (pinned in tests), but reading materialized
    occurrences + merged aggs instead of re-tokenizing raw text: the
    per-snapshot cost drops to the two hash-shuffles."""
    occ = read_occurrences(spark, path)
    agg = read_gram_aggs(spark, path)
    dup = agg.filter(F.col("n_occ") >= 2)
    if max_gram_freq is not None:
        dup = dup.filter(F.col("n_occ") <= int(max_gram_freq))
    marked = occ.join(dup, ["h1", "h2"])
    if keep_first:
        marked = marked.filter(
            ~(
                (F.col("doc_id") == F.col("first_doc"))
                & (F.col("pos") == F.col("first_pos"))
            )
        )
    return SPN.merge_positions_to_spans(marked.select("doc_id", "pos"), k)


def batch_spans_against_store(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    k: int = SPN.DEFAULT_K,
    text_col: str = "text",
) -> DataFrame:
    """Duplicated spans WITHIN an incoming batch relative to (store ∪
    batch) — the streaming-contamination question "which parts of these
    new documents already exist verbatim?", answered without marking or
    rewriting stored documents.

    The batch's gram delta joins the merged store aggregate (an equi-join
    whose probe side is batch-sized; the store side is a scan of the
    bounded agg generations — sequential columnar IO, no store shuffle),
    combined counts decide duplication, and keep-first uses the GLOBAL
    canonical occurrence, so a batch gram already present in the corpus
    marks every batch occurrence."""
    occ = SPN.token_gram_occurrences(batch_df, k, text_col)
    batch_agg = batch_gram_delta(occ)
    store_agg = read_gram_aggs(spark, path).select(
        "h1",
        "h2",
        F.col("n_occ").alias("store_n"),
        F.col("first_doc").alias("store_doc"),
        F.col("first_pos").alias("store_pos"),
    )
    combined = (
        batch_agg.join(store_agg, ["h1", "h2"], "left")
        .withColumn(
            "tot", F.col("n_occ") + F.coalesce(F.col("store_n"), F.lit(0))
        )
        .withColumn(
            "g_doc",
            F.when(
                F.col("store_n").isNotNull()
                & (
                    F.struct(
                        F.col("store_doc").alias("doc_id"),
                        F.col("store_pos").alias("pos"),
                    )
                    < F.struct(
                        F.col("first_doc").alias("doc_id"),
                        F.col("first_pos").alias("pos"),
                    )
                ),
                F.col("store_doc"),
            ).otherwise(F.col("first_doc")),
        )
        .withColumn(
            "g_pos",
            F.when(
                F.col("store_n").isNotNull()
                & (
                    F.struct(
                        F.col("store_doc").alias("doc_id"),
                        F.col("store_pos").alias("pos"),
                    )
                    < F.struct(
                        F.col("first_doc").alias("doc_id"),
                        F.col("first_pos").alias("pos"),
                    )
                ),
                F.col("store_pos"),
            ).otherwise(F.col("first_pos")),
        )
    )
    dup = combined.filter(F.col("tot") >= 2).select("h1", "h2", "g_doc", "g_pos")
    marked = occ.join(dup, ["h1", "h2"]).filter(
        ~((F.col("doc_id") == F.col("g_doc")) & (F.col("pos") == F.col("g_pos")))
    )
    return SPN.merge_positions_to_spans(marked.select("doc_id", "pos"), k)
