"""Streaming deduplication — the exact-dedup tier as a continuous operator
(SURVEY.md §2.9 T5 family; batch twin: operators/dedup.dedup_exact_survivors).

A training-data ingest pipeline dedups as documents ARRIVE, not in nightly
batches.  Two shapes, both keyed on the canonical-text md5 fingerprint:

- ``dedup_stream_exact``: ``dropDuplicatesWithinWatermark`` on the
  fingerprint — Spark keeps one state row per fingerprint seen inside the
  watermark horizon and emits only first occurrences.  State is evicted by
  event-time watermark, so memory is bounded by the dedup horizon (the
  standard design: exact-forever dedup of an unbounded stream is unbounded
  state; a horizon is what production ingest uses).
- ``fingerprint_stream``: the stateless map pass (doc_id, ts, fp) shared by
  the stateful stage and any downstream bucketing — identical expression to
  the batch ``canonical_docs``, so batch and stream agree bit-for-bit.

First-occurrence semantics vs the batch survivor rule: the batch picks the
MIN doc_id per fingerprint; the stream keeps the FIRST arrival inside the
horizon.  When the stream is replayed in (ts, doc_id) order the two agree
wherever doc_id order matches arrival order; the equivalence test feeds
arrival-ordered data and asserts the survivor sets match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.functions import text as TXT


def fingerprint_stream(documents: DataFrame) -> DataFrame:
    """(doc_id, ts, fp): canonical-text fingerprints, map-only (same
    expression as operators/dedup.canonical_docs)."""
    return documents.select(
        "doc_id",
        "ts",
        F.md5(TXT.preprocess_text(F.col("text"))).alias("fp"),
    )


def dedup_stream_exact(
    doc_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """First-occurrence-per-fingerprint over a document stream.

    Input schema: (doc_id, ts, text).  Output: (doc_id, ts, fp) survivors.
    State per fingerprint is dropped once the watermark passes its event
    time + horizon — bounded state at any corpus rate."""
    fps = fingerprint_stream(doc_stream)
    return fps.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )
