"""Streaming index maintenance — the continuous analog of POST
/refresh-index (SURVEY.md §3.3; reference services/index_service.py:112-115
rebuilds the whole HNSW graph from scratch on every refresh).

With the index-as-table design the index can instead be maintained
INCREMENTALLY as documents arrive:

- :func:`index_stream` — the stateless build pipeline (preprocess → embed →
  normalize, the exact ``build_index`` expressions) applied to a document
  STREAM: map-only, so it runs unchanged under Structured Streaming;
- :func:`maintain_index` — ``writeStream.foreachBatch`` appending each
  micro-batch (tagged with its batch id) to an append-only parquet log.
  Append, not overwrite: vanilla parquet has no atomic upsert, so the
  stream writes an LSM-style log and READERS resolve latest-per-doc
  (exactly the pattern Delta/Iceberg implement natively — swap the sink
  format in production and ``foreachBatch`` collapses to a plain
  streaming MERGE);
- :func:`read_index_latest` — the read view: one window over the log picks
  the newest version of every ``doc_id`` (ties broken by batch id, then
  event time);
- :func:`compact_index` — folds the log back to one flat generation with
  the layout writer (``sources/compaction.compact_write``), bounding both
  file count and the log-resolution window cost.  Readers between
  compactions pay one extra WindowGroupLimit; after compaction the view is
  a plain scan.

Scale shape: the stream stage is embarrassingly parallel (same as the
batch build); each micro-batch append is sized by the trigger interval;
log growth is bounded by compaction cadence.  The only shuffle anywhere is
the latest-per-doc window at READ time, eliminated by compacting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

def index_stream(
    doc_stream: DataFrame,
    embedder=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(ts, vec_id, doc_id, norm_embedding, norm): the batch ``build_index``
    relation plus the event time, over a streaming frame.  The build
    expressions ride in ONE struct column so the timestamp stays attached
    without a (stream-illegal) self-join — map-only, identical expressions
    to the batch build, so batch and stream index rows agree bit-for-bit
    (pinned in tests)."""
    from vector_search_question_answer_api_spark.functions import text as TXT
    from vector_search_question_answer_api_spark.functions import vector as V
    from vector_search_question_answer_api_spark.operators.embed import HashingEmbedder

    embedder = embedder or HashingEmbedder()
    embedded = doc_stream.select(
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("doc_id"),
        embedder(TXT.preprocess_text(F.col(text_col))).alias("embedding"),
    )
    return embedded.select(
        "ts",
        F.col("doc_id").alias("vec_id"),
        "doc_id",
        V.l2_normalize(F.col("embedding"))
        .cast("array<float>")
        .alias("norm_embedding"),
        V.l2_norm(F.col("embedding")).alias("norm"),
    )


def maintain_index(
    indexed_stream: DataFrame,
    path: str,
    checkpoint: str,
    trigger_once: bool = False,
):
    """Start the maintenance query: append each micro-batch to the index
    log at ``path`` tagged with the batch id (restart-safe: the checkpoint
    replays a failed batch under the SAME id, and the read view picks one
    row per (doc_id, batch) deterministically, so duplicate appends from
    batch retries cannot change the resolved index)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch", F.lit(batch_id))
            .write.mode("append")
            .parquet(path)
        )

    writer = indexed_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_index_latest(spark: SparkSession, path: str) -> DataFrame:
    """The resolved index view: newest row per doc_id (by batch id, then
    event time) — same columns as ``build_index``.  Costs one
    window-with-limit over the log; a compacted log (single generation,
    one row per doc) resolves to itself."""
    log = spark.read.parquet(path)
    order = [F.col("_batch").desc(), F.col("ts").desc()] if "_batch" in log.columns else [
        F.col("ts").desc()
    ]
    w = Window.partitionBy("doc_id").orderBy(*order)
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "doc_id", "norm_embedding", "norm")
    )


def compact_index(
    spark: SparkSession, path: str, n_files: int = 4
) -> None:
    """Fold the append log into one flat generation: resolve the latest
    view, rewrite it with the layout writer (range-clustered on doc_id so
    point lookups prune), and atomically swap directories.  Locally the
    swap is rename-based; production uses a table format / pointer swap —
    the resolved-relation semantics are identical."""
    import os
    import shutil

    from vector_search_question_answer_api_spark.sources.compaction import (
        compact_write,
    )

    tmp = path.rstrip("/") + ".__compacting__"
    latest = read_index_latest(spark, path).withColumn(
        "ts", F.current_timestamp()
    ).withColumn("_batch", F.lit(-1))
    # Materialize into the sibling dir BEFORE touching the source dir
    compact_write(
        latest,
        tmp,
        n_files=n_files,
        rows_per_file=10_000_000,
        sort_by=["doc_id"],
    )
    shutil.rmtree(path)
    os.rename(tmp, path)
