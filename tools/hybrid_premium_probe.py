#!/usr/bin/env python
"""Decompose the r14 ``hybrid_stored`` / ``hybrid_stored_graph`` premium
(VERDICT r14 next #6: builder ledger 2.51→3.16 s (+26%) and +16% on the
graph tier, both of which gained the epoch/history resolution path in
r14).

Protocol (the ``ann_refresh_1pct`` decomposition's shape): ONE fresh
process builds the exact bench fixture (``bench._hybrid_stored_fns`` — a
real 3-batch ``maintain_corpus`` run), then times four serving variants
under the bench's own cache_scope protocol, 7 runs each:

- ``lsh_committed`` / ``graph_committed``: the bench entries verbatim —
  ``epoch=COMMITTED`` pays the full resolution (commit-marker listing +
  per-store ``up_to_batch`` bounds; the graph tier additionally reads
  the cell-store manifest whose r14 form carries the history block).
- ``lsh_live`` / ``graph_live``: ``epoch=None`` — the live view skips
  the ENTIRE epoch machinery (no marker read, no bounds, no history
  lookup), serving each store's freshest state.

committed − live therefore bounds everything the epoch/history path can
cost at serve time.  If that delta is small relative to the r14-vs-r13
ledger delta, the regression is process/box state (the in-suite
late-position signature the bm25 family showed the same round), not the
history machinery.  Results land in
measurements/r15_hybrid_premium.json; the interpretation lives in
SCALE.md.
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("HYBRID_PROBE_RUNS", "7"))
    spark = get_spark(app_name="hybrid_premium_probe")
    inventory.RUN_TWIN_CHECKS = False

    # the bench suite's warmup, so levels are comparable to its ledger
    qs = inventory.queries()
    _force(qs["q1_pricing_summary"](spark, sf_dir).limit(1))
    from pyspark.sql import functions as F

    from vector_search_question_answer_api_spark.operators.embed import (
        HashingEmbedder,
    )

    warm = spark.range(256).repartition(spark.sparkContext.defaultParallelism)
    _force(warm.select(HashingEmbedder()(F.col("id").cast("string"))))

    import bench

    from vector_search_question_answer_api_spark.operators import (
        hybrid_store as HS,
    )

    fns, root, caches = bench._hybrid_stored_fns(spark, sf_dir)
    corpus = os.path.join(root, "corpus")
    queries = caches[0]

    variants = {
        "lsh_committed": fns["hybrid_stored"],
        "lsh_live": lambda s, d: HS.hybrid_search_stored(
            s, corpus, queries, k=10, pool=20, dense="lsh", epoch=None
        ),
        "graph_committed": fns["hybrid_stored_graph"],
        "graph_live": lambda s, d: HS.hybrid_search_stored(
            s, corpus, queries, k=10, pool=20, dense="graph", epoch=None,
            dim=64, n_cells=16, nprobe=4, ef=50,
        ),
    }
    out: dict[str, dict] = {}
    for name, fn in variants.items():
        ts = []
        for _ in range(runs):
            with caching.cache_scope():
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                ts.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(ts), "runs": ts}
        print(json.dumps({name: out[name]}), flush=True)

    for tier in ("lsh", "graph"):
        c, l = out[f"{tier}_committed"]["min"], out[f"{tier}_live"]["min"]
        out[f"{tier}_epoch_premium_sec"] = round(c - l, 3)
    print(json.dumps(out))
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "measurements",
        "r15_hybrid_premium.json",
    )
    with open(dest, "w", encoding="utf-8") as f:
        json.dump({"sf_dir": sf_dir, "n_runs": runs, "results": out}, f,
                  indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
