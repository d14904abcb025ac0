"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``vector_search_question_answer_api_spark.inventory`` — the declared operator
inventory (SURVEY.md §2) with per-query DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_search_question_answer_api_spark import inventory


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full §3.1 search
    pipeline (preprocess -> embed -> index -> cosine top-k -> doc join)."""
    from pyspark.sql import functions as F

    from vector_search_question_answer_api_spark.operators.index_build import build_index
    from vector_search_question_answer_api_spark.operators.search import (
        attach_documents,
        knn_exact_expr,
    )
    from vector_search_question_answer_api_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    index = build_index(docs).persist()
    # queries are docs 0-4: reuse their index vectors instead of re-embedding
    qindex = index.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").cast("array<double>").alias("qvec"),
    )
    res = knn_exact_expr(qindex, index, k=3)
    return attach_documents(res, docs).select(
        "query_id", "doc_id", "score", "rank", "text"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return inventory.queries()


def oracle_sql() -> dict[str, str]:
    return inventory.oracle_sql()
