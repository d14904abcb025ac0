"""Maximal-marginal-relevance (MMR) diversified top-k (Carbonell &
Goldstein 1998): re-rank a relevance-ordered candidate pool so each pick
trades relevance against redundancy with what is already selected —
``argmax lam * sim(q, d) - (1 - lam) * max_{s in selected} sim(d, s)``.

The reference engine returns plain cosine top-k
(services/qa_service.py:150-160); MMR is the standard diversification
layer a retrieval stack adds on top, and the shape matters at scale: the
GREEDY loop is inherently sequential, but only over the per-query
candidate pool (tens of rows), so the distributed plan is

  1. exact/ANN top-``pool`` per query — all the usual kNN machinery,
     corpus never moves (broadcast queries, WindowGroupLimit prune);
  2. one ``applyInPandas`` over query_id groups — each group is ``pool``
     rows with their vectors; the greedy selection runs vectorized in
     numpy on a pool x pool similarity matrix.

Nothing iterates over the corpus; the quadratic term is pool^2 per
query, not corpus^2.  Cross-engine determinism: similarities are rounded
to 6 decimals BEFORE selection (both here and in the DuckDB oracle), so
the argmax never sits on a sub-rounding float boundary; score ties break
by ascending doc_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.functions import vector as V


def mmr_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    pool: int = 10,
    lam: float = 0.7,
    candidates: DataFrame | None = None,
    query_vec_col: str = "qvec",
    index_vec_col: str = "norm_embedding",
    query_id_col: str = "query_id",
    index_id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id, sim, rank): ``k`` MMR-selected docs per query
    from the cosine top-``pool`` candidates.  Expects both vector
    columns L2-normalized (dot == cosine).  ``rank`` is the SELECTION
    order (1 = most relevant, later ranks trade relevance for novelty),
    which is the order a result page shows.

    ``candidates`` (r5, VERDICT r4 #5 — the 100 TB path): a pre-built
    (query_id, doc_id) relation from any ANN tier (``ann.lsh_topk``,
    ``ivf.ivf_topk``, ``pq.pq_topk``) to use as the candidate pool instead
    of running the exact kNN over the whole corpus.  Vectors and sims are
    (re)attached by one equi-join against ``index`` (semi-join sized — only
    pool rows), the per-query pool is still capped at ``pool`` by sim, and
    the greedy stage is unchanged.  When the ANN pool's recall is 1.0 the
    result is identical to the exact path (pinned in
    tests/test_diversify.py); below that, MMR diversifies whatever the
    candidate generator surfaced — exactly the production contract."""
    from vector_search_question_answer_api_spark.operators.search import (
        topk_per_query,
    )

    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if k > pool:
        raise ValueError("k must be <= pool (the candidate cutoff)")
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qvec"),
    )
    if candidates is not None:
        base = candidates.select(
            F.col(query_id_col).alias("query_id"),
            F.col(index_id_col).alias("doc_id"),
        ).join(
            index.select(
                F.col(index_id_col).alias("doc_id"),
                F.col(index_vec_col).alias("_iv"),
            ),
            "doc_id",
        ).join(F.broadcast(q), "query_id")
    else:
        base = index.join(F.broadcast(q)).select(
            "query_id",
            F.col(index_id_col).alias("doc_id"),
            F.col(index_vec_col).alias("_iv"),
            "qvec",
        )
    scored = base.select(
        "query_id",
        "doc_id",
        (F.round(V.dot(F.col("qvec"), F.col("_iv")), 6) + F.lit(0.0)).alias(
            "sim"
        ),
        F.col("_iv").cast("array<double>").alias("cvec"),
    )
    # the shared per-query top-k recipe (WindowGroupLimit-friendly window +
    # prune); order by similarity DESC via its negation as the "distance"
    cand = (
        topk_per_query(scored.withColumn("_negsim", -F.col("sim")), pool,
                       dist_col="_negsim")
        .drop("rank", "_negsim")
    )

    oml = 1.0 - lam

    def _round6_half_up(x: np.ndarray) -> np.ndarray:
        # DuckDB's round() and Spark's F.round are HALF-AWAY-FROM-ZERO;
        # np.round is half-even — match the engines so a pairwise sim on
        # a .5e-6 boundary rounds the same way everywhere
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["sim", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        n = len(pdf)
        sims = pdf["sim"].to_numpy(dtype=np.float64)
        mat = np.array(pdf["cvec"].tolist(), dtype=np.float64)
        pair = _round6_half_up(mat @ mat.T)
        chosen = np.zeros(n, dtype=bool)
        # first pick is ALWAYS the relevance argmax (row 0 after the
        # sort) — defining it through the score formula would degenerate
        # to the doc_id tiebreak at lam=0, diverging from the oracle's
        # sel1 step and the documented rank-1 contract
        order: list[int] = [0]
        chosen[0] = True
        for _ in range(min(k, n) - 1):
            max_pair = pair[:, order].max(axis=1)
            score = lam * sims - oml * max_pair
            score[chosen] = -np.inf
            best_val = score.max()
            # ties: the smallest doc_id among max scorers (pdf is sorted
            # by doc_id within equal sim, but mmr ties can cross sims)
            tied = np.flatnonzero(score == best_val)
            best = tied[np.argmin(pdf["doc_id"].to_numpy()[tied])]
            chosen[best] = True
            order.append(best)
        out = pdf.iloc[order][["query_id", "doc_id", "sim"]].copy()
        out["rank"] = np.arange(1, len(order) + 1, dtype=np.int32)
        return out

    return cand.groupBy("query_id").applyInPandas(
        _greedy, "query_id long, doc_id long, sim double, rank int"
    )
