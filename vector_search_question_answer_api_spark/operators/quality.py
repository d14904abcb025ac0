"""ANN quality monitoring: distributed recall@k of an approximate top-k
relation against an exact one.

The approximate tiers (LSH `operators/ann.py`, IVF `operators/ivf.py`, PQ
`operators/pq.py`) trade recall for pruning, and their recall depends on
the CORPUS GEOMETRY — a parameter set validated on yesterday's data can
silently degrade after an embedding-model change or a domain shift.  The
production guard is cheap: run the exact kNN for a small query SAMPLE next
to the approximate tier (exact cost is bounded by the sample size — the
same asymmetry every kNN entry point exploits), and alert on the measured
recall.  The reference has no such monitor (hnswlib recall is assumed);
this is the operational piece a 100 TB deployment needs.

Both inputs are any DataFrames with (query_id, doc_id) — typically the
outputs of ``knn_exact_expr`` and one approximate tier over the same
queries.  All aggregation is distributed (semi-join + hash-agg); only the
k-row summary ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_per_query(
    exact: DataFrame,
    approx: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, hits, want, recall): |exact ∩ approx| / |exact| per
    query.  Queries the approximate tier missed entirely count 0, not
    NULL; queries absent from ``exact`` are (correctly) absent here."""
    e = exact.select(F.col(query_col).alias("query_id"), F.col(id_col).alias("doc_id"))
    a = approx.select(
        F.col(query_col).alias("query_id"), F.col(id_col).alias("doc_id")
    )
    want = e.groupBy("query_id").agg(F.count("*").alias("want"))
    hits = (
        e.join(a, ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        want.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            "want",
        )
        .withColumn("recall", F.col("hits") / F.col("want"))
    )


def recall_summary(
    exact: DataFrame,
    approx: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> dict:
    """One-row summary for alerting: micro recall (total hits / total
    wanted), macro recall (mean of per-query recalls), worst query, and
    the query count.  Executes one Spark job."""
    per = recall_per_query(exact, approx, query_col, id_col)
    row = per.agg(
        (F.sum("hits") / F.sum("want")).alias("micro"),
        F.avg("recall").alias("macro"),
        F.min("recall").alias("worst"),
        F.count("*").alias("n_queries"),
    ).first()
    return {
        "micro_recall": float(row["micro"]),
        "macro_recall": float(row["macro"]),
        "worst_query_recall": float(row["worst"]),
        "n_queries": int(row["n_queries"]),
    }
