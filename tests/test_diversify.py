"""MMR diversified top-k (operators/diversify.py): python-reference
equivalence, the duplicate-penalty property that motivates MMR, and edge
behavior."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.functions import vector as V
from vector_search_question_answer_api_spark.operators.diversify import mmr_topk
from vector_search_question_answer_api_spark.sources.tables import load_table


def _mmr_reference(qv, docs, k, pool, lam):
    """Plain-python greedy MMR over {doc_id: vec}, mirroring the operator's
    rounding contract."""
    import math

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def norm(v):
        n = math.sqrt(dot(v, v))
        return [x / n for x in v] if n else [0.0] * len(v)

    qn = norm(qv)
    normed = {i: norm(v) for i, v in docs.items()}
    sims = {i: round(dot(qn, v), 6) for i, v in normed.items()}
    cand = sorted(sims, key=lambda i: (-sims[i], i))[:pool]
    pair = {
        (a, b): round(dot(normed[a], normed[b]), 6) for a in cand for b in cand
    }
    selected: list[int] = []
    while len(selected) < min(k, len(cand)):
        best, best_score = None, None
        for i in cand:
            if i in selected:
                continue
            mp = max((pair[(i, s)] for s in selected), default=0.0)
            score = lam * sims[i] - (1 - lam) * mp
            if (
                best is None
                or score > best_score
                or (score == best_score and i < best)
            ):
                best, best_score = i, score
        selected.append(best)
    return selected


def test_mmr_matches_python_reference(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    normed = e.select("vec_id", V.l2_normalize(F.col("embedding")).alias("nv"))
    q = normed.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qvec")
    )
    idx = normed.select(
        F.col("vec_id").alias("doc_id"), F.col("nv").alias("norm_embedding")
    )
    got = mmr_topk(q, idx, k=4, pool=8, lam=0.6).collect()
    raw = {r["vec_id"]: list(r["embedding"]) for r in e.collect()}
    for qid in range(3):
        want = _mmr_reference(raw[qid], raw, k=4, pool=8, lam=0.6)
        have = [
            r["doc_id"]
            for r in sorted(
                (r for r in got if r["query_id"] == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert have == want, f"query {qid}: {have} != {want}"


def test_mmr_penalizes_duplicates(spark):
    # d1 and d3 are equally relevant (sim 0.8) but mutually dissimilar
    # (pair sim 0.28); d2 is an exact duplicate of d1.  Plain top-3 order
    # is (d1, d2, d3) by id-tiebreak; MMR must demote the duplicate
    # (score 0.7*0.8 - 0.3*1.0 = 0.26) behind the novel d3
    # (0.7*0.8 - 0.3*0.28 = 0.476).
    rows = [
        (1, [0.8, 0.6, 0.0]),
        (2, [0.8, 0.6, 0.0]),
        (3, [0.8, -0.6, 0.0]),
    ]
    idx = spark.createDataFrame(rows, "doc_id long, norm_embedding array<double>")
    q = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "query_id long, qvec array<double>"
    )
    got = [
        r["doc_id"]
        for r in mmr_topk(q, idx, k=3, pool=3, lam=0.7)
        .orderBy("rank")
        .collect()
    ]
    assert got == [1, 3, 2]


def test_mmr_first_pick_is_relevance_argmax(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    idx = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "doc_id long, norm_embedding array<double>",
    )
    q = spark.createDataFrame(
        [(0, vecs[5].tolist())], "query_id long, qvec array<double>"
    )
    got = mmr_topk(q, idx, k=3, pool=6, lam=0.5).orderBy("rank").collect()
    # rank 1 is the plain cosine argmax — the query's own vector
    assert got[0]["doc_id"] == 5
    # every later pick comes from the top-6 relevance pool
    top6 = np.argsort(-(vecs @ vecs[5]))[:6]
    assert {r["doc_id"] for r in got} <= set(top6.tolist())


def test_mmr_short_pool_and_validation(spark):
    idx = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "doc_id long, norm_embedding array<double>",
    )
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, qvec array<double>")
    # fewer candidates than k: returns what exists, ranks stay dense
    got = mmr_topk(q, idx, k=5, pool=10, lam=0.7).orderBy("rank").collect()
    assert [r["rank"] for r in got] == [1, 2]
    with pytest.raises(ValueError):
        mmr_topk(q, idx, k=5, pool=3)
    with pytest.raises(ValueError):
        mmr_topk(q, idx, lam=1.5)


def test_mmr_lam_zero_first_pick_still_relevance(spark):
    """At lam=0 the score formula alone would degenerate the first pick
    to the smallest doc_id; the contract (and the SQL oracle's sel1) is
    that rank 1 is ALWAYS the relevance argmax."""
    idx = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0]), (3, [0.6, 0.8])],
        "doc_id long, norm_embedding array<double>",
    )
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, qvec array<double>")
    got = mmr_topk(q, idx, k=2, pool=3, lam=0.0).orderBy("rank").collect()
    assert got[0]["doc_id"] == 2  # the cosine argmax, not doc_id 1
    # second pick at lam=0 maximizes pure novelty: doc 1 (orthogonal to
    # doc 2) beats doc 3 (similar to doc 2)
    assert got[1]["doc_id"] == 1


def test_mmr_over_ann_pool_matches_exact_at_full_recall(spark, sf_dir):
    """The 100 TB composition: mmr_topk(candidates=<ANN pool>) must equal
    the exact-pool MMR whenever the pool's recall is 1.0.  Exercised two
    ways: (a) candidates = the exact top-pool itself (recall 1.0 by
    construction), (b) candidates = IVF with nprobe = n_cells (exhaustive
    probing ≡ exact)."""
    from vector_search_question_answer_api_spark.operators.ivf import ivf_topk
    from vector_search_question_answer_api_spark.operators.search import (
        knn_exact_expr,
    )

    e = load_table(spark, sf_dir, "embeddings")
    normed = e.select("vec_id", V.l2_normalize(F.col("embedding")).alias("nv"))
    q = normed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qvec")
    )
    idx = normed.select(
        F.col("vec_id").alias("doc_id"), F.col("nv").alias("norm_embedding")
    )

    def rows(df):
        return [
            (r["query_id"], r["doc_id"], round(r["sim"], 9), r["rank"])
            for r in df.orderBy("query_id", "rank").collect()
        ]

    want = rows(mmr_topk(q, idx, k=5, pool=10, lam=0.7))

    exact_pool = knn_exact_expr(q, idx, k=10).select("query_id", "doc_id")
    got_a = rows(mmr_topk(q, idx, k=5, pool=10, lam=0.7, candidates=exact_pool))
    assert got_a == want and len(want) == 25

    ivf_pool = ivf_topk(q, idx, k=10, n_cells=16, nprobe=16).select(
        "query_id", "doc_id"
    )
    got_b = rows(mmr_topk(q, idx, k=5, pool=10, lam=0.7, candidates=ivf_pool))
    assert got_b == want


def test_mmr_over_partial_pool_diversifies_the_pool(spark, sf_dir):
    """With a deliberately lossy pool (a strict subset of the exact
    top-pool), MMR selects only from the given candidates — the contract
    under imperfect ANN recall."""
    from vector_search_question_answer_api_spark.operators.search import (
        knn_exact_expr,
    )

    e = load_table(spark, sf_dir, "embeddings")
    normed = e.select("vec_id", V.l2_normalize(F.col("embedding")).alias("nv"))
    q = normed.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qvec")
    )
    idx = normed.select(
        F.col("vec_id").alias("doc_id"), F.col("nv").alias("norm_embedding")
    )
    lossy = knn_exact_expr(q, idx, k=10).filter(F.col("rank") % 2 == 1).select(
        "query_id", "doc_id"
    )
    allowed = {
        (r["query_id"], r["doc_id"]) for r in lossy.collect()
    }
    got = mmr_topk(q, idx, k=5, pool=10, lam=0.7, candidates=lossy).collect()
    assert got and all((r["query_id"], r["doc_id"]) in allowed for r in got)
