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


def _from_fixture(spark, path):
    """An embeddings parquet (vec_id long, embedding array<float>) as the
    curve corpus — the seam for the frozen realistic-geometry fixture or a
    real-model embedding dump supplied out-of-band.  Vectors are assumed
    L2-normalized (tests/test_fixtures.py pins this for the frozen one)."""
    df = spark.read.parquet(path).select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("norm_embedding"),
    )
    dim = len(df.first()["norm_embedding"])
    return df, dim


def curve(spark, n, k, refines, n_queries=20, dim=64, normed=None, tag=None,
          m=8):
    from vector_search_question_answer_api_spark.operators.pq import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    if normed is None:
        normed = _clustered(spark, n, dim=dim)
    else:
        n = normed.count()
    normed.persist().count()
    q = normed.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )
    exact = knn_exact_expr(q, normed, k=k)
    cbs = train_pq_codebooks(normed, dim=dim, m=m, n_codes=16, n_iters=4)
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
        if tag:
            row["corpus"] = tag
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
    ap.add_argument(
        "--fixture",
        default="",
        help="path[:name] of an embeddings parquet (vec_id long, embedding "
        "array<float>) to run the curve on INSTEAD of the synthetic sizes",
    )
    ap.add_argument(
        "--m", type=int, default=8,
        help="PQ subvector count (use a divisor of the fixture dim, e.g. "
        "16 or 24 for dim=384)",
    )
    args = ap.parse_args()
    refines = [1, 2, 4, 8, 16, 24, 32, 48, 64]
    spark = get_spark(app_name="refine_curve")
    spark.sparkContext.setLogLevel("ERROR")
    fit = {}
    if args.fixture:
        path, _, name = args.fixture.partition(":")
        normed, dim = _from_fixture(spark, path)
        rows = curve(spark, 0, args.k, refines, dim=dim, normed=normed,
                     tag=name or os.path.basename(path), m=args.m)
        ok = [r["refine"] for r in rows if r["recall"] >= args.target]
        fit[rows[0]["n"]] = min(ok) if ok else None
    else:
        for n in [int(s) for s in args.sizes.split(",")]:
            rows = curve(spark, n, args.k, refines)
            ok = [r["refine"] for r in rows if r["recall"] >= args.target]
            fit[n] = min(ok) if ok else None
    print(json.dumps({"min_refine_for_recall": fit,
                      "target": args.target}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
