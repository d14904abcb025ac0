#!/usr/bin/env python
"""Marginal per-batch cost of maintaining the on-disk LSH signature table
inside the composed ingest (VERDICT r10 #1, built in r11).

The ``ingest_batch`` ledger entry keeps its r10-pinned batch profile
(codes store + graph store + profile + span store, NO lsh) so its 14.8 s
number stays comparable across rounds; this probe answers the question
that pin leaves open — *what does adding ``lsh_artifact=`` to
``maintain_corpus`` cost per batch?* — by running the IDENTICAL
snapshot-restored 500-row batch (450 new + 50 updates, 16 cells, 2000-doc
standing corpus) under both configs and reporting the certified minima
and their difference.

Signatures are map-only per row (n_tables signature strings per doc + one
partition write), so the expected marginal is a small constant — the
cheapest incremental artifact in the engine.  Prints ONE JSON line.
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

from vector_search_question_answer_api_spark.operators import ann
from vector_search_question_answer_api_spark.operators.ivf import centroid_grid
from vector_search_question_answer_api_spark.operators.pq import codebook_grid
from vector_search_question_answer_api_spark.session import get_spark
from vector_search_question_answer_api_spark.sources.tables import load_table
from vector_search_question_answer_api_spark.streaming import ingest_stream as IG


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="lsh_ingest_cost")
    root = tempfile.mkdtemp(prefix="vector_search_question_answer_api_spark_lsh_cost_")
    src = f"{root}/src"
    os.makedirs(src, exist_ok=True)
    N_CELLS, DIM = 16, 64
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
    )
    initial.coalesce(1).write.parquet(f"{src}/b000")

    # the fixed stored manifest every signature batch hashes with
    art_path = f"{root}/manifest_src"
    ann.write_lsh_artifact(
        art_path,
        dim=DIM,
        n_planes=ann.recommended_n_planes(2450),
        center=None,
    )
    art = ann.read_lsh_artifact(art_path)

    def _run(store, ck, lsh):
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
            lsh_artifact=art if lsh else None,
        )
        q.awaitTermination()

    out: dict = {"probe": "lsh_ingest_marginal", "sf_dir": sf_dir}
    configs = (("base", False), ("with_lsh", True))
    # bootstrap BOTH configs before the upsert batch lands in src — the
    # source glob is shared, so a batch written between bootstraps would
    # be consumed by the later bootstrap and its timed run would no-op
    for tag, lsh in configs:
        _run(f"{root}/{tag}_tpl", f"{root}/{tag}_ck_tpl", lsh)
    batch.coalesce(1).write.parquet(f"{src}/b001")
    for tag, lsh in configs:
        store_tpl, ck_tpl = f"{root}/{tag}_tpl", f"{root}/{tag}_ck_tpl"
        store, ck = f"{root}/{tag}_store", f"{root}/{tag}_ck"
        runs = []
        for _ in range(5):
            for tpl, dst in ((store_tpl, store), (ck_tpl, ck)):
                shutil.rmtree(dst, ignore_errors=True)
                shutil.copytree(tpl, dst)
            t0 = time.perf_counter()
            _run(store, ck, lsh)
            runs.append(round(time.perf_counter() - t0, 3))
            if len(runs) >= 3:
                lo, lo2 = sorted(runs)[:2]
                if lo2 <= lo * 1.15:
                    break
        lo, lo2 = sorted(runs)[:2]
        out[tag] = {
            "min": lo,
            "best2": [lo, lo2],
            "certified": bool(lo2 <= lo * 1.15),
            "runs": runs,
        }
        if lsh:
            # post-batch staleness check: the maintained signature store
            # serves the same relation as a fresh rebuild on the resolved
            # index (the test-suite pin, re-asserted on this fixture)
            index = IG.read_corpus_index(spark, store)
            q10 = index.filter(F.col("doc_id") < 10).select(
                F.col("doc_id").alias("query_id"),
                F.col("norm_embedding").alias("qvec"),
            )
            fresh = f"{root}/fresh_rebuild"
            ann.write_lsh_index(
                index,
                fresh,
                dim=art["dim"],
                n_planes=art["n_planes"],
                n_tables=art["n_tables"],
                center=art["center"],
            )

            def _rel(p):
                return {
                    (r["query_id"], r["doc_id"], r["rank"])
                    for r in ann.ann_lsh_topk_ondisk(
                        spark, q10, p, index, k=5
                    ).collect()
                }

            maintained = _rel(IG.corpus_lsh_path(store))
            rebuilt = _rel(fresh)
            assert maintained == rebuilt, "maintained lsh store != fresh rebuild"
            out["serving_equals_rebuild"] = True
    out["marginal_s"] = round(out["with_lsh"]["min"] - out["base"]["min"], 3)
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
