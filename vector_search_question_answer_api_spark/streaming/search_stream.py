"""Streaming vector search — the /search endpoint's request loop as a
Structured Streaming pipeline (SURVEY.md §3.1, streaming form).

The reference serves one query per HTTP request against an in-memory index
(controllers/search_controller.py).  The Spark-native serving shape is a
query STREAM: `readStream` of (query_id, ts, text) -> validate (P2-P5) ->
preprocess + embed per micro-batch -> kNN against the (static, cached)
index snapshot -> append sink.  ``foreachBatch`` is used because the kNN
operator collects the micro-batch's query vectors for closure broadcast
(`knn_exact_partitioned`) — the corpus never moves, each micro-batch ships
only its own queries.

Index refresh semantics match the reference's rebuild-replace: swap the
cached index DataFrame between micro-batches (the closure reads the
current snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.functions import text as TXT


def search_stream_writer(
    query_stream: DataFrame,
    index: DataFrame,
    out_path: str,
    checkpoint: str,
    k: int = 3,
    embedder=None,
):
    """Wire the search pipeline onto a query stream; returns the started
    StreamingQuery (parquet append sink)."""
    from vector_search_question_answer_api_spark.functions import vector as V
    from vector_search_question_answer_api_spark.operators.embed import HashingEmbedder
    from vector_search_question_answer_api_spark.operators.search import (
        knn_exact_partitioned,
    )

    embedder = embedder or HashingEmbedder()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        valid = batch_df.filter(TXT.valid_query(F.col("text")))
        if valid.isEmpty():
            return
        embedded = valid.select(
            "query_id", embedder(TXT.preprocess_text(F.col("text"))).alias("emb")
        )
        q = embedded.select(
            "query_id",
            V.l2_normalize(F.col("emb")).cast("array<double>").alias("qvec"),
        )
        res = knn_exact_partitioned(q, index, k=k)
        res.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )

    return (
        query_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
