#!/usr/bin/env python
"""Measured PQ refine-depth vs recall curve (VERDICT r5 #7) — the sizing
rule for the exact re-rank stage of the PQ/IVFPQ tiers.

The ADC stage ranks by approximate (quantized) distance; the exact re-rank
restores precision for the ``refine * k`` shortlist.  Recall@k is then the
probability that the true top-k all sit within the first ``refine * k``
ADC ranks.  The number of corpus points whose TRUE distance lies inside
the ADC error band around the k-th neighbor distance grows ~linearly with
corpus size n at fixed codebook capacity, so the refine depth needed for a
recall target grows ~linearly in n too — this tool measures the curve at
two corpus sizes so the rule is derived from data, the same way the LSH
n_planes rule was derived in SCALING.md.

Usage::

    python -m tools.refine_curve [--k 5] [--sizes 500,2000]

Prints one JSON line per (corpus_size, refine) with micro recall from the
production monitor, then a fitted "min refine for recall >= 0.95" per
size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.quality import recall_summary
from vector_search_question_answer_api_spark.operators.search import knn_exact_expr
from vector_search_question_answer_api_spark.session import get_spark


def _clustered(spark, n, dim=64, n_modes=20, seed=7):
    """Same clustered fixture as tools/recall_audit.py — tight modes on the
    unit sphere, the geometry real sentence embeddings take."""
    rng = np.random.RandomState(seed)
    cents = rng.standard_normal((n_modes, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    pts = cents[np.arange(n) % n_modes] + 0.08 * rng.standard_normal((n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)],
        "doc_id long, norm_embedding array<double>",
    )


def curve(spark, n, k, refines, n_queries=20, dim=64):
    from vector_search_question_answer_api_spark.operators.pq import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    normed = _clustered(spark, n, dim=dim)
    normed.persist().count()
    q = normed.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )
    exact = knn_exact_expr(q, normed, k=k)
    cbs = train_pq_codebooks(normed, dim=dim, m=8, n_codes=16, n_iters=4)
    enc = normed.select(
        "doc_id", "norm_embedding",
    )
    codes = pq_encode(enc, cbs).persist()
    codes.count()
    out = []
    for refine in refines:
        approx = pq_topk(q, codes, cbs, k=k, refine=refine, index=normed)
        rec = recall_summary(exact, approx)["micro_recall"]
        row = {"n": n, "k": k, "refine": refine,
               "shortlist": refine * k, "recall": round(rec, 4)}
        print(json.dumps(row), flush=True)
        out.append(row)
    normed.unpersist()
    codes.unpersist()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--sizes", default="500,2000")
    ap.add_argument("--target", type=float, default=0.95)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    refines = [1, 2, 4, 8, 16, 24, 32, 48, 64]
    spark = get_spark(app_name="refine_curve")
    spark.sparkContext.setLogLevel("ERROR")
    fit = {}
    for n in sizes:
        rows = curve(spark, n, args.k, refines)
        ok = [r["refine"] for r in rows if r["recall"] >= args.target]
        fit[n] = min(ok) if ok else None
    print(json.dumps({"min_refine_for_recall": fit,
                      "target": args.target}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
