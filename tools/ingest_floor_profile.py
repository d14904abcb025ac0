#!/usr/bin/env python
"""Itemize the composed-ingest micro-batch FLOOR (VERDICT r11 #6): the
`ingest_batch` / `ingest_delete_batch` ledger entries sit on a ~10-11 s
fixed cost per micro-batch that had never been decomposed.  This probe
replays ONE upsert micro-batch (the ledger profile: 500 rows = 450 new +
50 updates against a 2000-doc standing corpus, full fan-out incl. lsh
store and maintained radii) by calling the handler's stages BY HAND,
timing each against a snapshot-restored store — then runs the REAL
maintain_corpus stream once per attempt so the residual (stream-machinery
overhead: micro-batch planning, source listing, checkpoint commits) is
measured rather than guessed.

Also measures the one candidate job-merge VERDICT r11 named: sharing ONE
persisted resolved-view read between the two managed-store refreshes,
reported as refresh times with and without the shared cache.

Stage classification (what scales with what):
  per-batch-sized  : profile_sketch, span_append, embed_materialize,
                     vecmean_correction, lsh_append, log_append
  per-dirty-cell   : codes_refresh, graphs_refresh (the ONLY corpus-
                     coupled stages; |dirty|/n_cells of the corpus)
  per-batch fixed  : stream residual (foreachBatch machinery)

Prints ONE JSON line; write it to measurements/r12_ingest_floor.json.
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

from vector_search_question_answer_api_spark.operators import ann, ann_hnsw
from vector_search_question_answer_api_spark.operators.ivf import centroid_grid
from vector_search_question_answer_api_spark.operators.pq import (
    codebook_grid,
    refresh_ivfpq_index,
)
from vector_search_question_answer_api_spark.session import get_spark
from vector_search_question_answer_api_spark.sources.tables import load_table
from vector_search_question_answer_api_spark.streaming import (
    index_stream as IX,
    ingest_stream as IG,
    span_stream as SPS,
    stats_stream as STS,
)

N_ATTEMPTS = 3
N_CELLS, DIM = 16, 64


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ingest_floor_profile")
    root = tempfile.mkdtemp(prefix="vector_search_question_answer_api_spark_floor_")
    src = f"{root}/src"
    os.makedirs(src, exist_ok=True)
    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.timestamp_millis(F.col("doc_id") * 1000).alias("ts"),
        "text",
        "n_chars",
    )
    schema = docs.schema
    initial = docs.filter(F.col("doc_id") < 2000)
    batch = docs.filter(
        (F.col("doc_id") >= 2000) & (F.col("doc_id") < 2450)
    ).unionByName(
        docs.filter(F.col("doc_id") < 50)
        .withColumn("text", F.concat(F.lit("update cycle 1 "), "text"))
        .withColumn("n_chars", F.length("text"))
        .withColumn("ts", F.timestamp_millis(F.lit(10_000_000)))
    ).persist()
    batch.count()
    initial.coalesce(1).write.parquet(f"{src}/b000")
    n0 = initial.count()
    art_p = f"{root}/art"
    ann.write_lsh_artifact(
        art_p, dim=DIM, n_planes=ann.recommended_n_planes(n0), center=None
    )
    art = ann.read_lsh_artifact(art_p)

    def _run_stream(store, ck):
        q = IG.maintain_corpus(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*"),
            store,
            checkpoint=ck,
            codebooks=cbs,
            ann_graphs=True,
            centroids=cents,
            dim=DIM,
            n_cells=N_CELLS,
            trigger_once=True,
            lsh_artifact=art,
            graph_radii=True,
        )
        q.awaitTermination()

    # bootstrap the standing store, snapshot it
    store_tpl, ck_tpl = f"{root}/store_tpl", f"{root}/ck_tpl"
    _run_stream(store_tpl, ck_tpl)
    batch.coalesce(1).write.parquet(f"{src}/b001")  # pending upsert batch

    store, ck = f"{root}/store", f"{root}/ck"

    def _restore():
        for tpl, dst in ((store_tpl, store), (ck_tpl, ck)):
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(tpl, dst)

    p = IG._subpaths(store)
    stages: dict[str, list[float]] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        stages.setdefault(name, []).append(
            round(time.perf_counter() - t0, 3)
        )

    shared: dict[str, list[float]] = {}

    for attempt in range(N_ATTEMPTS):
        _restore()
        # --- the handler's stages, by hand, for batch_id=1 ---
        timed(
            "profile_sketch",
            lambda: STS.write_profile_batch(batch, p["profile"], 1),
        )
        timed(
            "span_append",
            lambda: SPS.append_span_batch(batch, p["spans"], 1, k=8),
        )
        indexed = IX.index_stream(batch).persist()
        timed("embed_materialize", lambda: indexed.count())

        def _vecmean():
            prev = IX.read_index_before_batch(
                spark,
                p["index"],
                1,
                for_docs=indexed.select("doc_id").distinct(),
            )
            STS.write_vecmean_batch(
                indexed,
                p["profile"],
                1,
                superseded=prev.select("doc_id", "norm_embedding"),
            )

        timed("vecmean_correction", _vecmean)
        timed(
            "lsh_append",
            lambda: ann.append_lsh_signatures_batch(indexed, p["lsh"], 1, art),
        )
        timed(
            "log_append",
            lambda: indexed.withColumn("_batch", F.lit(1))
            .write.mode("append")
            .parquet(os.path.join(p["index"], "log")),
        )
        index = IX.read_index_latest(spark, p["index"])
        delta = indexed.select("doc_id", "norm_embedding")
        timed(
            "codes_refresh",
            lambda: refresh_ivfpq_index(
                spark, p["codes"], index, delta, cbs,
                centroids=cents, dim=DIM, n_cells=N_CELLS,
            ),
        )
        timed(
            "graphs_refresh",
            lambda: ann_hnsw.refresh_celled_hnsw_index(
                spark, p["graphs"], index, delta,
                centroids=cents, dim=DIM, n_cells=N_CELLS,
            ),
        )
        indexed.unpersist()

        # --- candidate merge: ONE persisted resolved view shared by both
        # refreshes (VERDICT r11 #6's named hypothesis) ---
        _restore()
        indexed = IX.index_stream(batch).persist()
        indexed.count()
        (
            indexed.withColumn("_batch", F.lit(1))
            .write.mode("append")
            .parquet(os.path.join(p["index"], "log"))
        )
        idx2 = IX.read_index_latest(spark, p["index"]).persist()
        delta = indexed.select("doc_id", "norm_embedding")
        t0 = time.perf_counter()
        idx2.count()  # materialize the shared view once
        refresh_ivfpq_index(
            spark, p["codes"], idx2, delta, cbs,
            centroids=cents, dim=DIM, n_cells=N_CELLS,
        )
        ann_hnsw.refresh_celled_hnsw_index(
            spark, p["graphs"], idx2, delta,
            centroids=cents, dim=DIM, n_cells=N_CELLS,
        )
        shared.setdefault("refreshes_shared_view", []).append(
            round(time.perf_counter() - t0, 3)
        )
        idx2.unpersist()
        indexed.unpersist()

        # --- the real stream, end to end (residual = machinery) ---
        _restore()
        t0 = time.perf_counter()
        _run_stream(store, ck)
        shared.setdefault("stream_total", []).append(
            round(time.perf_counter() - t0, 3)
        )

    mins = {k: min(v) for k, v in stages.items()}
    stage_sum = round(sum(mins.values()), 3)
    stream_min = min(shared["stream_total"])
    out = {
        "metric": "ingest_floor_profile",
        "sf": sf_dir,
        "attempts": N_ATTEMPTS,
        "batch_profile": "500 rows (450 new + 50 updates), 2000-doc corpus, "
        "16 cells, full fan-out (codes+graphs+radii+lsh+profile+span)",
        "stages_sec": {k: v for k, v in sorted(stages.items())},
        "stages_min": mins,
        "stage_sum_min": stage_sum,
        "stream_total": shared["stream_total"],
        "stream_residual_min": round(stream_min - stage_sum, 3),
        "refreshes_separate_min": round(
            mins["codes_refresh"] + mins["graphs_refresh"], 3
        ),
        "refreshes_shared_view": shared["refreshes_shared_view"],
        "classification": {
            "per_batch_sized": [
                "profile_sketch", "span_append", "embed_materialize",
                "vecmean_correction", "lsh_append", "log_append",
            ],
            "per_dirty_cell": ["codes_refresh", "graphs_refresh"],
            "per_batch_fixed": ["stream residual (foreachBatch machinery)"],
        },
    }
    print(json.dumps(out))
    batch.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
