#!/usr/bin/env python
"""Maintained-LSH serving cost vs LOG DEPTH (r12): the inputs for the
compaction-cadence rule.

The log-bearing read pays a per-depth resolution premium (window over
the log + broadcast anti-join on the base); `compact_lsh_signatures`
erases it for a one-time fold cost.  With cadence N (compact every N
batches), r serving reads per batch interval, marginal premium m per log
batch and fold cost C, the cost rate per batch interval is
``r*m*N/2 + C/N`` — minimized at ``N* = sqrt(2C / (r*m))``
(``ann.recommended_lsh_compaction_every`` is that rule as code).

This probe measures m and C on the bench geometry: 8x8 centered store
over the sf embeddings table, net-identity maintenance batches of ~2% of
the corpus (re-upserted same vectors, so every depth serves the
IDENTICAL relation — asserted), depths {0, 2, 4, 8, 16}, min-of-3 per
depth on a quiet box.  Prints ONE JSON line; write it to
measurements/r12_lsh_log_depth.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.functions import vector as V
from vector_search_question_answer_api_spark.operators import ann
from vector_search_question_answer_api_spark.session import get_spark
from vector_search_question_answer_api_spark.sources.tables import load_table

DEPTHS = (0, 2, 4, 8, 16)
N_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="lsh_log_depth")
    root = tempfile.mkdtemp(prefix="vector_search_question_answer_api_spark_lsh_depth_")
    emb = load_table(spark, sf_dir, "embeddings")
    idx = emb.select(
        F.col("vec_id").alias("doc_id"),
        V.l2_normalize(F.col("embedding"))
        .cast("array<double>")
        .alias("norm_embedding"),
    ).persist()
    n = idx.count()
    center = ann.corpus_center(idx)
    q = idx.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )
    B = max(1, n // 50)  # ~2% of the corpus per maintenance batch
    ts = F.timestamp_millis(F.lit(1_000_000))

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    def _rel(df):
        return {
            (r["query_id"], r["doc_id"], round(r["distance"], 9), r["rank"])
            for r in df.collect()
        }

    results: dict[int, list[float]] = {}
    fold_runs: list[float] = []
    ref = None
    for depth in DEPTHS:
        path = f"{root}/lsh_d{depth}"
        ann.write_lsh_index(idx, path, n_planes=8, n_tables=8, center=center)
        art = ann.read_lsh_artifact(path)
        for i in range(depth):
            # net-identity batch: same vectors re-upserted (rotating 2%
            # slices), so every depth serves the identical relation
            lo = (i * B) % n
            b = idx.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + B)
            ).withColumn("ts", ts)
            ann.append_lsh_signatures_batch(b, path, i, art)
        got = _rel(ann.ann_lsh_topk_ondisk(spark, q, path, idx, k=5))
        if ref is None:
            ref = got
        assert got == ref, f"depth {depth} served a different relation"
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            _force(ann.ann_lsh_topk_ondisk(spark, q, path, idx, k=5))
            results.setdefault(depth, []).append(
                round(time.perf_counter() - t0, 3)
            )
        if depth == max(DEPTHS):
            # fold cost at the deepest log (the C in the rule)
            t0 = time.perf_counter()
            assert ann.compact_lsh_signatures(spark, path) is True
            fold_runs.append(round(time.perf_counter() - t0, 3))
            post = _rel(ann.ann_lsh_topk_ondisk(spark, q, path, idx, k=5))
            assert post == ref, "compaction changed the served relation"

    mins = {d: min(v) for d, v in results.items()}
    # marginal premium per log batch: least-squares slope over the depths
    xs = list(mins.keys())
    ys = [mins[d] for d in xs]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    m = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    out = {
        "metric": "lsh_log_depth",
        "sf": sf_dir,
        "n_docs": n,
        "batch_rows": B,
        "runs_sec": {str(d): v for d, v in results.items()},
        "min_sec": {str(d): v for d, v in mins.items()},
        "marginal_sec_per_log_batch": round(m, 4),
        "fold_cost_sec": min(fold_runs),
        "recommended_cadence_examples": {
            f"reads_per_batch={r}": ann.recommended_lsh_compaction_every(
                r, fold_cost_sec=min(fold_runs), marginal_resolve_sec=m
            )
            for r in (1, 10, 100)
        },
    }
    print(json.dumps(out))
    idx.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
