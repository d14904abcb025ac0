"""BM25 + RRF fusion (operators/keyword_search.py): scoring matches a
plain-Python reference, ranking invariants hold, fusion arithmetic is
exact."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.keyword_search import (
    bm25_topk,
    build_postings,
    rrf_fuse,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat sleeps"),
    (2, "a lazy dog and a lazy cat"),
    (3, "foxes and dogs are not cats"),
    (4, "completely unrelated text about spark"),
]


def _py_tokens(text):
    # Mirror preprocess_text for plain ascii inputs: lower, strip
    # specials, collapse whitespace.
    t = re.sub(r"[^\w\s%]", " ", text.lower())
    return [w for w in re.split(r"\s+", t.strip()) if w]


def _py_bm25(query, k1=1.2, b=0.75):
    toks = {d: _py_tokens(t) for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in dict.fromkeys(_py_tokens(query)):
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(term)
            if tf:
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(v) / avgdl)
                )
    return scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_postings_shape(spark, docs_df):
    postings, doclens, stats = build_postings(docs_df)
    p = {(r["term"], r["doc_id"]): r["tf"] for r in postings.collect()}
    assert p[("the", 0)] == 2
    assert p[("lazy", 2)] == 2
    assert ("fox", 0) in p and ("foxes", 3) in p
    s = stats.collect()[0]
    assert s["n_docs"] == 5
    dl = {r["doc_id"]: r["dl"] for r in doclens.collect()}
    assert dl[0] == 9 and s["avgdl"] == pytest.approx(
        sum(len(_py_tokens(t)) for _, t in DOCS) / 5
    )


def test_bm25_matches_python_reference(spark, docs_df):
    q = spark.createDataFrame(
        [(100, "lazy dog"), (101, "quick cat")], ["query_id", "query_text"]
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(docs_df, q, k=5).collect()
    }
    for qid, qtext in [(100, "lazy dog"), (101, "quick cat")]:
        ref = _py_bm25(qtext)
        for d, s in ref.items():
            assert got[(qid, d)] == pytest.approx(round(s, 6), abs=2e-6)
        # no spurious candidates
        assert {d for (g, d) in got if g == qid} == set(ref)


def test_bm25_rank_order_and_k(spark, docs_df):
    q = spark.createDataFrame([(1, "lazy dog cat")], ["query_id", "query_text"])
    rows = bm25_topk(docs_df, q, k=2).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2]
    assert rows[0]["score"] >= rows[1]["score"]


def test_rrf_fusion_exact(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 20, 1), (1, 30, 2)], ["query_id", "doc_id", "rank"]
    )
    rows = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10).collect()}
    assert rows[20]["rrf_score"] == pytest.approx(
        round(1 / 61 + 1 / 62, 9), abs=1e-12
    )
    assert rows[10]["rrf_score"] == pytest.approx(round(1 / 61, 9), abs=1e-12)
    # doc in both rankings outranks docs in one
    assert rows[20]["rank"] == 1
    # tie between doc 10 (rank 1 in a) and doc 30 (... 1/62 < 1/61) -> 10 second
    assert rows[10]["rank"] == 2 and rows[30]["rank"] == 3


def test_rrf_tiebreak_by_doc_id(spark):
    a = spark.createDataFrame(
        [(1, 7, 1), (1, 3, 2)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 3, 1), (1, 7, 2)], ["query_id", "doc_id", "rank"]
    )
    rows = rrf_fuse([a, b], k=10).orderBy("rank").collect()
    # identical fused scores -> lower doc_id first
    assert [r["doc_id"] for r in rows] == [3, 7]
