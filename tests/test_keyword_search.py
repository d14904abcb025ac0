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


def test_blended_rerank_reference_and_limits(spark, sf_dir):
    """Blend vs a python reference on real docs; alpha=1 reduces to the
    dense ordering, alpha=0 to pure lexical Jaccard."""
    import math

    from vector_search_question_answer_api_spark.operators.keyword_search import (
        blended_rerank,
    )
    from vector_search_question_answer_api_spark.functions import vector as V
    from vector_search_question_answer_api_spark.sources.tables import load_table
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    normed = e.select("vec_id", V.l2_normalize(F.col("embedding")).alias("nv"))
    qv = normed.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qvec")
    )
    cand = (
        normed.join(F.broadcast(qv))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            (F.round(V.dot(F.col("qvec"), F.col("nv")), 6) + F.lit(0.0)).alias(
                "dense_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dense_sim").desc(), F.col("doc_id").asc()
    )
    pool = cand.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= 8
    ).drop("_rn")
    queries = d.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )

    got = blended_rerank(pool, d, queries, k=4, alpha=0.6).collect()

    # python reference
    import re as _re

    def toks(t):
        t = _re.sub(r"[^\w\s%]", " ", t.lower())
        t = _re.sub(r"\s+", " ", t).strip()
        return set(t.split())

    dtext = {r["doc_id"]: r["text"] for r in d.collect()}
    pool_rows = [(r["query_id"], r["doc_id"], r["dense_sim"]) for r in pool.collect()]
    for qid in range(3):
        qt = toks(dtext[qid])
        scores = {}
        for q, doc, dense in pool_rows:
            if q != qid:
                continue
            dt = toks(dtext[doc])
            inter = len(qt & dt)
            uni = len(qt) + len(dt) - inter
            jac = inter / uni if uni else 0.0
            scores[doc] = round(0.6 * dense + 0.4 * jac, 9)
        want = sorted(scores, key=lambda i: (-scores[i], i))[:4]
        have = [
            r["doc_id"]
            for r in sorted(
                (r for r in got if r["query_id"] == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert have == want, f"query {qid}: {have} != {want}"

    # alpha=1: pure dense ordering of the pool
    dense_only = blended_rerank(pool, d, queries, k=4, alpha=1.0).collect()
    for qid in range(3):
        want = [
            doc
            for _, doc, _ in sorted(
                (r for r in pool_rows if r[0] == qid),
                key=lambda r: (-r[2], r[1]),
            )
        ][:4]
        have = [
            r["doc_id"]
            for r in sorted(
                (r for r in dense_only if r["query_id"] == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert have == want

    import pytest as _pytest

    with _pytest.raises(ValueError):
        blended_rerank(pool, d, queries, alpha=1.5)
