#!/usr/bin/env python
"""QA-replay scaling on the EVENT axis: time ``replay_sessions`` (exact and
graph retrieval tiers) at growing event-batch sizes against the fixed sf0.1
corpus.

``tools/scaling.py`` answers "how do operators scale with the CORPUS?"; the
replay pipeline's scale variable is different — a 100 TB operator replays
ever-larger event logs against a comparatively stable index.  Here the
corpus (and the celled graphs, built once) are held constant while the
event batch grows 5k -> 20k -> 80k, so the fitted slope isolates the
per-event cost of embed + k=1 retrieve + session fold:

- exact tier: the query matrix is the scaled side — matmul rows, the
  vectorized top-k selection, and the fold all grow linearly; slope ~1.0
  certifies none of the per-event machinery is super-linear.
- graph tier: per-event cell-routed walks (cogrouped; nothing collected);
  walk count = events x nprobe, so slope ~1.0 certifies the walk schedule
  and the session fold stay linear too.

Usage::

    python -m tools.replay_scaling [--sizes 5000,20000,80000]
                                   [--sf-dir /root/testdata/sf0.1]

Prints one JSON object; SCALE.md records a run.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,20000,80000")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from vector_search_question_answer_api_spark.config import DEFAULT_CONFIG
    from vector_search_question_answer_api_spark.operators import ann_hnsw
    from vector_search_question_answer_api_spark.operators.index_build import (
        build_index,
    )
    from vector_search_question_answer_api_spark.operators.ivf import centroid_grid
    from vector_search_question_answer_api_spark.operators.sessions import (
        replay_sessions,
    )
    from vector_search_question_answer_api_spark.session import get_spark
    from vector_search_question_answer_api_spark.sources.tables import load_table

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    docs = load_table(spark, args.sf_dir, "documents")
    index = build_index(docs).persist()
    n_docs = index.count()

    # bench.py's graph knobs (measured rules: ef one notch above the curve
    # floor, one cell-task per core)
    n_cells, nprobe, ef = 32, 4, 10
    cents = centroid_grid(DEFAULT_CONFIG.embedding_dim, n_cells)
    graphs = ann_hnsw.build_celled_hnsw(
        index, centroids=cents, n_cells=n_cells
    ).persist()
    graphs.count()

    def event_batch(n: int):
        df = (
            load_table(spark, args.sf_dir, "events")
            .filter(F.col("event_id") < n)
            .select(
                "event_id",
                "ts",
                F.col("user_id").cast("string").alias("session_id"),
                ((F.col("event_id") * 13 + 1) % n_docs).alias("q_doc"),
            )
            .join(
                F.broadcast(
                    docs.select(
                        F.col("doc_id").alias("q_doc"),
                        F.col("text").alias("question"),
                    )
                ),
                "q_doc",
            )
            .select("event_id", "ts", "session_id", "question")
            .persist()
        )
        df.count()
        return df

    tiers = {
        "exact": lambda qa: replay_sessions(qa, index),
        "graph": lambda qa: replay_sessions(
            qa, index, retrieval="graph", graphs=graphs,
            graph_n_cells=n_cells, graph_nprobe=nprobe, graph_ef=ef,
        ),
        # the fully distributed tier (nothing collected or broadcast on
        # either side): SRP-LSH bucket join + exact re-rank.  A bucket-miss
        # event gets a null candidate (the fold's fallback path), so
        # output rows stay == events while candidate recall is the
        # (n_planes, n_tables) contract — this sweep times the schedule,
        # the recall rules live in SCALING.md / ann.recommended_lsh_params.
        "lsh": lambda qa: replay_sessions(qa, index, retrieval="lsh"),
    }

    from vector_search_question_answer_api_spark import caching

    # warm every tier once (python workers, codegen) on the smallest batch
    warm = event_batch(sizes[0])
    for fn in tiers.values():
        with caching.cache_scope():
            fn(warm).count()
    warm.unpersist()

    results: dict[str, dict] = {}
    batches = {n: event_batch(n) for n in sizes}
    for tier, fn in tiers.items():
        times: dict[int, float] = {}
        rows: dict[int, int] = {}
        for n in sizes:
            best = None
            for _ in range(2):  # best-of-2: in-session noise only inflates
                # scope per run: replay's tracked persist (the embedded
                # event relation) must not accumulate across the sweep —
                # unreleased, the 80k points run against a storage pool
                # holding every earlier run's cache
                with caching.cache_scope():
                    t0 = time.perf_counter()
                    rows[n] = fn(batches[n]).count()
                    dt = round(time.perf_counter() - t0, 3)
                best = dt if best is None or dt < best else best
            times[n] = best
        lo, hi = sizes[0], sizes[-1]
        slope = round(math.log(times[hi] / times[lo]) / math.log(hi / lo), 2)
        results[tier] = {
            "sec": {str(k): v for k, v in times.items()},
            "rows": {str(k): v for k, v in rows.items()},
            "slope": slope,
            "rows_ok": all(rows[n] == n for n in sizes),
            "usec_per_event_at_max": round(times[hi] / hi * 1e6, 1),
        }
    print(json.dumps({"sf_dir": args.sf_dir, "sizes": sizes,
                      "n_docs": n_docs, "tiers": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
