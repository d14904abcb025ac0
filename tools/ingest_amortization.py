#!/usr/bin/env python
"""Ingest-floor AMORTIZATION curve (VERDICT r12 Next #7): the r12 floor
itemization characterized ONE batch profile (500 rows); this probe runs
the same hand-called handler stages at several batch sizes against the
same 2000-doc standing corpus, so the SCALE.md capacity table can say
which stages are per-batch-FIXED (flat across sizes — the floor a
1-minute trigger budget must absorb regardless of batch size) and where
the per-row regime begins (stages whose cost scales with rows — the
throughput term).  90/10 new/update mix at every size, matching the r12
profile.  Prints ONE JSON line; write it to
``measurements/r13_ingest_amortization.json``.
"""

from __future__ import annotations

import argparse
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

N_ATTEMPTS = 2
N_CELLS, DIM = 16, 64
BATCH_SIZES = (100, 500, 2000)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--insert-efc", type=int, default=None,
        help="maintenance-time graph insert beam (r14, "
             "ann_hnsw.recommended_insert_efc); default: build-time efc",
    )
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ingest_amortization")
    root = tempfile.mkdtemp(prefix="vector_search_question_answer_api_spark_amort_")
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
    initial.coalesce(1).write.parquet(f"{src}/b000")
    n0 = initial.count()
    art_p = f"{root}/art"
    ann.write_lsh_artifact(
        art_p, dim=DIM, n_planes=ann.recommended_n_planes(n0), center=None
    )
    art = ann.read_lsh_artifact(art_p)

    # bootstrap the standing store once, snapshot it
    store_tpl, ck_tpl = f"{root}/store_tpl", f"{root}/ck_tpl"
    q = IG.maintain_corpus(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*"),
        store_tpl,
        checkpoint=ck_tpl,
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

    store = f"{root}/store"
    p = IG._subpaths(store)
    out_sizes: dict[str, dict] = {}
    for size in BATCH_SIZES:
        n_upd = max(size // 10, 1)
        n_new = size - n_upd
        batch = (
            docs.filter(
                (F.col("doc_id") >= 2000) & (F.col("doc_id") < 2000 + n_new)
            )
            .unionByName(
                docs.filter(F.col("doc_id") < n_upd)
                .withColumn("text", F.concat(F.lit("update cycle "), "text"))
                .withColumn("n_chars", F.length("text"))
                .withColumn("ts", F.timestamp_millis(F.lit(10_000_000)))
            )
            .persist()
        )
        batch.count()
        stages: dict[str, list[float]] = {}

        def timed(name, fn):
            t0 = time.perf_counter()
            fn()
            stages.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )

        for _ in range(N_ATTEMPTS):
            for tpl, dst in ((store_tpl, store),):
                shutil.rmtree(dst, ignore_errors=True)
                shutil.copytree(tpl, dst)
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
            timed(
                "lsh_append",
                lambda: ann.append_lsh_signatures_batch(
                    indexed, p["lsh"], 1, art
                ),
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
                    insert_efc=args.insert_efc,
                ),
            )
            indexed.unpersist()
        batch.unpersist()
        mins = {k: min(v) for k, v in sorted(stages.items())}
        out_sizes[str(size)] = {
            "stages_min": mins,
            "total_min": round(sum(mins.values()), 3),
            "sec_per_1k_rows": round(sum(mins.values()) / size * 1000, 3),
        }
    out = {
        "metric": "ingest_amortization",
        "sf": sf_dir,
        "attempts": N_ATTEMPTS,
        "standing_corpus": 2000,
        "mix": "90% new / 10% updates",
        "insert_efc": args.insert_efc,
        "by_batch_rows": out_sizes,
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
