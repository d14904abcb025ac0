#!/usr/bin/env python
"""Maintained-postings (BM25) serving cost vs LOG DEPTH (r12): the
inputs for the lexical store's compaction-cadence rule.

Same cost model as the signature store's sweep (tools/lsh_log_depth.py):
the log-bearing read pays a per-depth resolution premium (doclens-log
window + broadcast anti-join on the base), `compact_postings` erases it
for a one-time fold cost; with cadence N, r serving reads per batch
interval, marginal premium m and fold cost C the cost rate is
``r*m*N/2 + C/N``, minimized at ``N* = sqrt(2C/(r*m))``
(`lexical_store.recommended_postings_compaction_every`).

This probe measures m and C on the bench geometry: a 32-bucket store
over the sf documents table served by ``bm25_topk_stored`` (every 100th
doc's text as the query side — the gate fixture), net-identity
maintenance batches of ~2% of the corpus (re-upserted same text, so
every depth serves the IDENTICAL relation — asserted), depths
{0, 2, 4, 8, 16}, min-of-3 per depth on a quiet box.  Prints ONE JSON
line; write it to measurements/r12_postings_log_depth.json.
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

from vector_search_question_answer_api_spark.operators import (
    lexical_store as LXS,
)
from vector_search_question_answer_api_spark.session import get_spark
from vector_search_question_answer_api_spark.sources.tables import load_table

DEPTHS = (0, 2, 4, 8, 16)
N_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="postings_log_depth")
    root = tempfile.mkdtemp(prefix="vector_search_question_answer_api_spark_post_depth_")
    docs = load_table(spark, sf_dir, "documents").persist()
    n = docs.count()
    q = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    B = max(1, n // 50)  # ~2% of the corpus per maintenance batch
    ts = F.timestamp_millis(F.lit(1_000_000))

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    def _rel(df):
        return {
            (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
            for r in df.collect()
        }

    results: dict[int, list[float]] = {}
    fold_runs: list[float] = []
    ref = None
    for depth in DEPTHS:
        path = f"{root}/post_d{depth}"
        LXS.write_postings_index(docs, path, n_buckets=32)
        for i in range(depth):
            # net-identity batch: same text re-upserted (rotating 2%
            # slices), so every depth serves the identical relation
            lo = (i * B) % n
            b = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + B)
            ).select("doc_id", "text", ts.alias("ts"))
            LXS.append_postings_batch(b, path, i, n_buckets=32)
        got = _rel(LXS.bm25_topk_stored(spark, path, q, k=5))
        if ref is None:
            ref = got
        assert got == ref, f"depth {depth} served a different relation"
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            _force(LXS.bm25_topk_stored(spark, path, q, k=5))
            results.setdefault(depth, []).append(
                round(time.perf_counter() - t0, 3)
            )
        if depth == max(DEPTHS):
            # fold cost at the deepest log (the C in the rule)
            t0 = time.perf_counter()
            assert LXS.compact_postings(spark, path) is True
            fold_runs.append(round(time.perf_counter() - t0, 3))
            post = _rel(LXS.bm25_topk_stored(spark, path, q, k=5))
            assert post == ref, "compaction changed the served relation"

    mins = {d: min(v) for d, v in results.items()}
    xs = list(mins.keys())
    ys = [mins[d] for d in xs]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    m = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    out = {
        "metric": "postings_log_depth",
        "sf": sf_dir,
        "n_docs": n,
        "batch_rows": B,
        "runs_sec": {str(d): v for d, v in results.items()},
        "min_sec": {str(d): v for d, v in mins.items()},
        "marginal_sec_per_log_batch": round(m, 4),
        "fold_cost_sec": min(fold_runs),
        "recommended_cadence_examples": {
            f"reads_per_batch={r}": LXS.recommended_postings_compaction_every(
                r, fold_cost_sec=min(fold_runs), marginal_resolve_sec=m
            )
            for r in (1, 10, 100)
        },
    }
    print(json.dumps(out))
    docs.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
