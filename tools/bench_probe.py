#!/usr/bin/env python
"""Quiet-box probe for individual bench entries (r10 reconciliation).

Runs a named subset of bench.py's entries under the exact same protocol
(same warmup, same cache_scope, adaptive best-of-N) but WITHOUT the rest
of the suite, so an entry's number is free of long-process inflation.
Used to reconcile cross-round drift: if an entry reproduces its slow
driver number here, the code changed; if it comes back to the old value,
the drift was process/box state.

Usage: python tools/bench_probe.py corpus_profile_sketch topk_zipf_direct ...

Flags (r14, VERDICT r13 next #1 — the 7-run watch-list protocol):
  --runs N   run every entry exactly N times (default: adaptive best-of-5
             with the bench's 15% early-exit).  With --runs the early
             exit is DISABLED so the output is a full distribution, the
             statistic the watch-list re-measures demand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_search_question_answer_api_spark import caching, inventory
from vector_search_question_answer_api_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    argv = sys.argv[1:]
    fixed_runs = 0  # 0 = adaptive bench protocol
    if "--runs" in argv:
        i = argv.index("--runs")
        fixed_runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    names = argv
    if not names:
        print("usage: bench_probe.py [--runs N] ENTRY [ENTRY...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_probe")
    inventory.RUN_TWIN_CHECKS = False
    qs = inventory.queries()

    # identical warmup to bench.py
    _force(qs["q1_pricing_summary"](spark, sf_dir).limit(1))
    from pyspark.sql import functions as F

    from vector_search_question_answer_api_spark.operators.embed import HashingEmbedder

    warm = spark.range(256).repartition(spark.sparkContext.defaultParallelism)
    _force(warm.select(HashingEmbedder()(F.col("id").cast("string"))))

    # the non-inventory bench entries this probe knows how to build
    extra = {}
    pre_run = {}

    def _load_extras(needed):
        import bench

        if needed & {"topk_zipf_direct", "topk_zipf_salted"}:
            extra.update(bench._zipf_topk_fns())
        if needed & {"ann_pq_topk", "dedup_embedding_semdedup"}:
            extra.update(bench._r4_tier_fns())
        if needed & {
            "ann_hnsw_topk",
            "ann_hnsw_celled",
            "knn_graph_full",
            "filtered_knn_exact",
            "filtered_knn_postfilter",
        }:
            fns, _graphs = bench._hnsw_fn(spark, sf_dir)
            extra.update(fns)
        if "ingest_delete_batch" in needed:
            fns, hooks, _root = bench._ingest_delete_fns(spark, sf_dir)
            extra.update(fns)
            pre_run.update(hooks)
        if "ann_ivfpq_ondisk" in needed:
            fns, _root = bench._ivfpq_ondisk_fn(spark, sf_dir)
            extra.update(fns)
        if needed & {"ann_lsh_mem", "ann_lsh_ondisk"}:
            fns, _root, _caches = bench._lsh_ondisk_fns(spark, sf_dir)
            extra.update(fns)
        if needed & {
            "qa_replay_exact",
            "qa_replay_graph",
            "qa_replay_lsh",
            "qa_replay_lsh_ondisk",
        }:
            fns, _caches, _root = bench._qa_replay_fns(spark, sf_dir)
            extra.update(fns)
        if "ann_refresh_1pct" in needed:
            fns, _root, _caches = bench._refresh_fns(spark, sf_dir)
            extra.update(fns)
        if "span_contamination" in needed:
            fns, _root, _caches = bench._span_store_fns(spark, sf_dir)
            extra.update(fns)
        if "ingest_batch" in needed:
            fns, hooks, _root = bench._ingest_fns(spark, sf_dir)
            extra.update(fns)
            pre_run.update(hooks)
        if needed & {"bm25_oneshot", "bm25_stored", "bm25_stored_maintained"}:
            fns, _root, _caches = bench._bm25_stored_fns(spark, sf_dir)
            extra.update(fns)
        if needed & {"hybrid_oneshot", "hybrid_stored", "hybrid_stored_graph"}:
            fns, _root, _caches = bench._hybrid_stored_fns(spark, sf_dir)
            extra.update(fns)
        if "corpus_profile_sketch" in needed:
            from vector_search_question_answer_api_spark.operators import sketches as SK
            from vector_search_question_answer_api_spark.sources.tables import load_table

            extra["corpus_profile_sketch"] = lambda s, d: SK.heavy_hitters_sketch(
                load_table(s, d, "documents"), k=20, sample_mod=4, candidate_factor=4
            )
        if "dup_span_strip" in needed:
            from vector_search_question_answer_api_spark.operators import spans as SPN
            from vector_search_question_answer_api_spark.sources.tables import load_table

            extra["dup_span_strip"] = lambda s, d: SPN.strip_duplicate_spans(
                load_table(s, d, "documents"), k=8
            )

    _load_extras(set(names))

    out = {}
    for name in names:
        fn = qs.get(name) or extra.get(name)
        if fn is None:
            out[name] = {"err": "unknown entry"}
            continue
        runs = []
        for _ in range(fixed_runs or 7):
            if name in pre_run:
                pre_run[name]()  # untimed state restore (bench protocol)
            with caching.cache_scope():
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                runs.append(round(time.perf_counter() - t0, 3))
            if not fixed_runs and len(runs) >= 2:
                lo, lo2 = sorted(runs)[:2]
                if lo2 <= lo * 1.15:
                    break
        lo, lo2 = sorted(runs)[:2]
        out[name] = {
            "min": lo,
            "best2": [lo, lo2],
            "certified": bool(lo2 <= lo * 1.15),
            "runs": runs,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"probe": out}))
    spark.stop()


if __name__ == "__main__":
    main()
