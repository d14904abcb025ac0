"""Search operator tests: strategy equivalence, self-retrieval, thresholds,
top-k properties (SURVEY.md §5.1/5.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.functions import vector as V
from vector_search_question_answer_api_spark.operators.index_build import build_index, is_fresh
from vector_search_question_answer_api_spark.operators.search import (
    attach_documents,
    knn_exact_expr,
    knn_exact_partitioned,
)
from vector_search_question_answer_api_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def norm_embeddings(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").alias("doc_id"),
        V.l2_normalize(F.col("embedding")).alias("norm_embedding"),
    ).cache()


@pytest.fixture(scope="module")
def query_vecs(norm_embeddings):
    return norm_embeddings.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"), F.col("norm_embedding").alias("qvec")
    )


def _rows(df):
    return [
        (r["query_id"], r["doc_id"], round(r["distance"], 9), r["rank"])
        for r in df.orderBy("query_id", "rank").collect()
    ]


def test_strategies_agree(query_vecs, norm_embeddings):
    a = _rows(knn_exact_expr(query_vecs, norm_embeddings, k=5))
    b = _rows(knn_exact_partitioned(query_vecs, norm_embeddings, k=5))
    assert a == b


def test_self_is_rank1(query_vecs, norm_embeddings):
    res = knn_exact_expr(query_vecs, norm_embeddings, k=1).collect()
    for r in res:
        assert r["doc_id"] == r["query_id"]
        assert abs(r["distance"]) < 1e-6


def test_topk_subset_property(query_vecs, norm_embeddings):
    k3 = set(
        (r[0], r[1]) for r in _rows(knn_exact_expr(query_vecs, norm_embeddings, k=3))
    )
    k5 = set(
        (r[0], r[1]) for r in _rows(knn_exact_expr(query_vecs, norm_embeddings, k=5))
    )
    assert k3 <= k5


def test_threshold_gate_strict(query_vecs, norm_embeddings):
    res = knn_exact_expr(
        query_vecs, norm_embeddings, k=20, max_distance=0.4
    ).collect()
    assert all(r["distance"] < 0.4 for r in res)


def test_k_larger_than_corpus(spark, norm_embeddings):
    q = norm_embeddings.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("query_id"), F.col("norm_embedding").alias("qvec")
    )
    small = norm_embeddings.filter(F.col("doc_id") < 3)
    res = knn_exact_expr(q, small, k=10)
    assert res.count() == 3


def test_index_build_and_doc_join(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    index = build_index(docs)
    assert is_fresh(index, docs)
    q = index.limit(2).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").cast("array<double>").alias("qvec"),
    )
    res = attach_documents(knn_exact_expr(q, index, k=2), docs)
    rows = res.collect()
    assert len(rows) == 4
    assert all(r["text"] is not None for r in rows)
    # score = 1 - distance (controllers/search_controller.py:37)
    assert all(abs(r["score"] - (1 - r["distance"])) < 1e-12 for r in rows)


def test_embedder_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    a = {r["doc_id"]: r["norm_embedding"] for r in build_index(docs).collect()}
    b = {r["doc_id"]: r["norm_embedding"] for r in build_index(docs).collect()}
    assert a == b


def test_embedder_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from vector_search_question_answer_api_spark.functions import text as TXT
    from vector_search_question_answer_api_spark.operators.embed import hashing_embed_numpy

    docs = load_table(spark, sf_dir, "documents").limit(20)
    proc = [
        (r["doc_id"], r["t"])
        for r in docs.select(
            "doc_id", TXT.preprocess_text(F.col("text")).alias("t")
        ).collect()
    ]
    expected = hashing_embed_numpy([t for _, t in proc], 64)
    norms = np.linalg.norm(expected, axis=1)
    expected_norm = expected / np.where(norms == 0, 1, norms)[:, None]
    got = {r["doc_id"]: np.array(r["norm_embedding"]) for r in build_index(docs).collect()}
    for (doc_id, _), exp in zip(proc, expected_norm):
        assert np.allclose(got[doc_id], exp, atol=1e-6)


def test_partitioned_tie_contract(spark):
    """Duplicate vectors straddling the k boundary: the partition-local prune
    must keep the LOWER doc_id (the (distance ASC, doc_id ASC) contract), not
    whichever argpartition happened to emit (ADVICE r1, medium)."""
    dup = [1.0, 0.0, 0.0]
    # 6 identical corpus vectors with shuffled ids + one distant decoy; with
    # k=3 the tie set (size 6) straddles the boundary in every partition.
    corpus = spark.createDataFrame(
        [(i, dup) for i in (42, 7, 99, 3, 55, 18)] + [(1000, [0.0, 1.0, 0.0])],
        "doc_id long, norm_embedding array<double>",
    ).repartition(4)
    queries = spark.createDataFrame(
        [(0, dup)], "query_id long, qvec array<double>"
    )
    a = _rows(knn_exact_expr(queries, corpus, k=3))
    b = _rows(knn_exact_partitioned(queries, corpus, k=3))
    assert a == b
    assert [r[1] for r in b] == [3, 7, 18]
