#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the no-op sink (full execution, no driver
collect/serialization overhead) after a short JVM/codegen warmup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_search_question_answer_api_spark import caching, inventory
from vector_search_question_answer_api_spark.session import get_spark

# The headline set: relational core, vector search, dedup, text analytics —
# one per operator family from SURVEY.md §2 (rest of the inventory is
# covered by the driver's correctness harness, not timed here).
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "top2_parts_per_brand",
    "events_sessionization",
    "events_hourly_rollup",
    "knn_topk",
    "search_pipeline_e2e",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_embedding",
    "text_metrics",
    "events_asof_join",
    "stratified_sample",
    "filter_funnel",
    "mixture_sample",
    "mmr_topk",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _zipf_topk_fns():
    """Two extra bench entries (r3 verdict #6): exact top-k per key over a
    Zipfian key (90% of lineitem x4 on ONE key) — the direct window vs the
    two-phase salted form (operators/skew.py), equality-asserted once per
    bench run.  MEASURED finding (r4, recorded in SCALE.md): at bench scale
    the hot key's single-task sort costs ~1 s, and Spark 3.5's
    WindowGroupLimit already prunes each input partition to its local
    top-k, so the salted form shows NO win here — its domain is keys whose
    per-task sort/merge exceeds the task budget (>=10^8 rows/key), where
    the direct window's single hot-key task is the straggler.  The bench
    keeps both honest: same relation, real timings, no guessing."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_search_question_answer_api_spark.operators.skew import (
        salted_topk_per_key,
    )
    from vector_search_question_answer_api_spark.sources.tables import load_table

    K = 100

    def _input(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        base = li.select(
            F.when(F.col("l_orderkey") % 10 != 0, F.lit("hot"))
            .otherwise(
                F.concat(F.lit("c"), (F.col("l_orderkey") % 1000).cast("string"))
            )
            .alias("k"),
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
        )
        return base.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(4)]))
        )

    def _order():
        from pyspark.sql import functions as F

        return [
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
            F.col("rep").asc(),
        ]

    def direct(spark, sf_dir):
        df = _input(spark, sf_dir)
        w = Window.partitionBy("k").orderBy(*_order())
        return (
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= K)
        )

    def salted(spark, sf_dir):
        return salted_topk_per_key(
            _input(spark, sf_dir), ["k"], _order(), k=K, n_salts=32
        )

    return {"topk_zipf_direct": direct, "topk_zipf_salted": salted}


def _r4_tier_fns():
    """Two r4 bench entries: PQ ANN (ADC over compact codes + exact
    re-rank) and the SemDeDup cell-scoped embedding dedup — both timed on
    the sf embeddings table; the dedup tier is subset-pinned against the
    exact broadcast relation once per bench run (same contract as the
    zipf equality pin)."""
    from pyspark.sql import functions as F

    from vector_search_question_answer_api_spark.functions import vector as V
    from vector_search_question_answer_api_spark.operators.pq import (
        codebook_grid,
        pq_encode,
        pq_topk,
    )
    from vector_search_question_answer_api_spark.sources.tables import load_table

    def _normed(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        return emb.select(
            F.col("vec_id").alias("doc_id"),
            V.l2_normalize(F.col("embedding"))
            .cast("array<double>")
            .alias("norm_embedding"),
        )

    def ann_pq(spark, sf_dir):
        idx = _normed(spark, sf_dir)
        cbs = codebook_grid(64, 8, 16)
        codes = pq_encode(idx, cbs)
        q = idx.filter(F.col("doc_id") < 10).select(
            F.col("doc_id").alias("query_id"),
            F.col("norm_embedding").alias("qvec"),
        )
        return pq_topk(q, codes, cbs, k=5, refine=4, index=idx)

    def semdedup(spark, sf_dir):
        from vector_search_question_answer_api_spark.operators.dedup import (
            embedding_near_dup_pairs_clustered,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        return embedding_near_dup_pairs_clustered(
            emb, min_sim=0.45, n_cells=16, multi_probe=2
        )

    return {"ann_pq_topk": ann_pq, "dedup_embedding_semdedup": semdedup}


def _hnsw_fn(spark, sf_dir):
    """r5 bench entry: top-k against partitioned HNSW graphs (numpy
    backend unless hnswlib is importable).  Graphs are built and cached
    once outside the timed loop (index-build work, amortized in
    production exactly like the ivfpq codes table); the timed number is
    the broadcast-queries graph walk + global candidate merge.  Returns
    (fns, cached graphs frame for teardown)."""
    from pyspark.sql import functions as F

    from vector_search_question_answer_api_spark.functions import vector as V
    from vector_search_question_answer_api_spark.operators import ann_hnsw
    from vector_search_question_answer_api_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = emb.select(
        F.col("vec_id").alias("doc_id"),
        V.l2_normalize(F.col("embedding")).cast("array<float>").alias(
            "norm_embedding"
        ),
    ).repartition(spark.sparkContext.defaultParallelism)
    graphs = ann_hnsw.build_partitioned_hnsw(idx, dim=64).persist()
    graphs.count()
    q = (
        emb.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            V.l2_normalize(F.col("embedding"))
            .cast("array<double>")
            .alias("qvec"),
        )
    )

    def ann_hnsw_topk(spark, sf_dir):
        return ann_hnsw.hnsw_topk(spark, graphs, q, k=5)

    # r6: the cell-routed composition through the COGROUPED serving path
    # (query relation never collected to the driver) at the reference's
    # working ef=50 — the offline-batch serving shape for 100 TB
    from vector_search_question_answer_api_spark.operators.ivf import centroid_grid

    cents = centroid_grid(64, 16)
    celled = ann_hnsw.build_celled_hnsw(
        idx.select("doc_id", F.col("norm_embedding").alias("nv")),
        centroids=cents, dim=64, n_cells=16, vec_col="nv",
    ).persist()
    celled.count()

    def ann_hnsw_celled(spark, sf_dir):
        return ann_hnsw.celled_hnsw_topk_cogrouped(
            celled, q, centroids=cents, k=5, ef=50, dim=64,
            n_cells=16, nprobe=4,
        )

    # r6: the whole-corpus k-NN graph (n x k neighbors via cogrouped
    # self-query) — the SemDeDup/cluster-prep primitive, timed over the
    # FULL corpus as the query relation, not a 10-row sample
    def knn_graph_full(spark, sf_dir):
        return ann_hnsw.knn_graph(
            idx.select("doc_id", F.col("norm_embedding").alias("nv")),
            centroids=cents, k=5, ef=50, dim=64, n_cells=16, nprobe=4,
            vec_col="nv", graphs=celled,
        )

    # r7 (VERDICT r6 #5): filtered vector search, both strategies over
    # the same id-hash predicate (selectivity ~1/3, geometry-independent)
    from vector_search_question_answer_api_spark.operators.search import (
        filtered_knn,
    )

    fidx = idx.select(
        "doc_id",
        F.col("norm_embedding").cast("array<double>").alias("norm_embedding"),
        (F.pmod(F.xxhash64(F.col("doc_id")), F.lit(3)) == 0).alias("keep"),
    )
    fpred = F.col("keep")

    def filtered_knn_exact(spark, sf_dir):
        return filtered_knn(q, fidx, fpred, k=5, strategy="exact")

    def filtered_knn_postfilter(spark, sf_dir):
        def tier(queries, kk):
            return ann_hnsw.celled_hnsw_topk_cogrouped(
                celled, queries, centroids=cents, k=kk, ef=50, dim=64,
                n_cells=16, nprobe=4,
            )

        return filtered_knn(
            q, fidx, fpred, k=5, strategy="ann_postfilter",
            oversample=4, ann_topk=tier,
        )

    return (
        {
            "ann_hnsw_topk": ann_hnsw_topk,
            "ann_hnsw_celled": ann_hnsw_celled,
            "knn_graph_full": knn_graph_full,
            "filtered_knn_exact": filtered_knn_exact,
            "filtered_knn_postfilter": filtered_knn_postfilter,
        },
        [graphs, celled],
    )


def _ivfpq_ondisk_fn(spark, sf_dir):
    """r5 bench entry: queries against the MATERIALIZED IVFPQ codes table
    (cell-partitioned, no vector column, deferred vector fetch — see
    operators/pq.write_ivfpq_index).  The artifact is built ONCE here,
    outside the timed loop: in production the codes table is ingest-time
    work amortized over every query batch, so the per-query number is the
    scan+ADC+refine cost — the number that matters.  Returns (fns, cleanup
    path)."""
    import tempfile

    from pyspark.sql import functions as F

    from vector_search_question_answer_api_spark.functions import vector as V
    from vector_search_question_answer_api_spark.operators.pq import (
        codebook_grid,
        ivfpq_topk_ondisk,
        write_ivfpq_index,
    )
    from vector_search_question_answer_api_spark.sources.tables import load_table

    root = tempfile.mkdtemp(prefix="vector_search_question_answer_api_spark_bench_ivfpq_")
    path = root + "/codes"
    cbs = codebook_grid(64, 8, 16)

    def _normed(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        return emb.select(
            F.col("vec_id").alias("doc_id"),
            V.l2_normalize(F.col("embedding"))
            .cast("array<double>")
            .alias("norm_embedding"),
        )

    write_ivfpq_index(_normed(spark, sf_dir), path, cbs, dim=64, n_cells=16)

    def ann_ivfpq_ondisk(spark, sf_dir):
        idx = _normed(spark, sf_dir)
        q = idx.filter(F.col("doc_id") < 10).select(
            F.col("doc_id").alias("query_id"),
            F.col("norm_embedding").alias("qvec"),
        )
        return ivfpq_topk_ondisk(
            spark, q, path, idx, cbs, k=5, dim=64, n_cells=16,
            nprobe=4, refine=8,
        )

    return {"ann_ivfpq_ondisk": ann_ivfpq_ondisk}, root


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")

    # Time the primary production path: the in-gate strategy-twin
    # verification (correctness-harness behavior) would otherwise run two
    # physical strategies inside one timed query.  See inventory.RUN_TWIN_CHECKS.
    inventory.RUN_TWIN_CHECKS = False

    qs = inventory.queries()
    # Warmup: JVM JIT + codegen + parquet footer caches on a tiny query,
    # plus one Arrow-UDF pass across all cores so the Python worker pool
    # spawns before any measured query (one-time process startup, not
    # query cost).
    _force(qs["q1_pricing_summary"](spark, sf_dir).limit(1))
    from pyspark.sql import functions as F

    from vector_search_question_answer_api_spark.operators.embed import HashingEmbedder

    warm = spark.range(256).repartition(spark.sparkContext.defaultParallelism)
    _force(warm.select(HashingEmbedder()(F.col("id").cast("string"))))

    extra = _zipf_topk_fns()
    # one-time equality pin: both skew strategies must emit the identical
    # relation before their timings mean anything
    a = set(map(tuple, extra["topk_zipf_direct"](spark, sf_dir).collect()))
    b = set(map(tuple, extra["topk_zipf_salted"](spark, sf_dir).collect()))
    assert a == b and a, f"zipf top-k strategy mismatch ({len(a)} vs {len(b)})"

    extra.update(_r4_tier_fns())
    ondisk_fns, ondisk_root = _ivfpq_ondisk_fn(spark, sf_dir)
    extra.update(ondisk_fns)
    hnsw_fns, hnsw_graphs = _hnsw_fn(spark, sf_dir)
    extra.update(hnsw_fns)
    # one-time subset pin: the cell-scoped dedup tier must emit a nonempty
    # subset of the exact broadcast relation (false pairs are impossible)
    from vector_search_question_answer_api_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from vector_search_question_answer_api_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs(
            emb, min_sim=0.45, strategy="broadcast"
        ).collect()
    }
    sem_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in extra["dedup_embedding_semdedup"](spark, sf_dir).collect()
    }
    assert sem_pairs and sem_pairs <= exact_pairs, (
        f"semdedup tier not a nonempty subset ({len(sem_pairs)} vs "
        f"{len(exact_pairs)} exact)"
    )

    # r7: sketch-tier corpus profiling — the CMS heavy-hitter pass (sampled
    # candidates + full-corpus count-min re-estimate), the expensive half
    # of operators/sketches.corpus_profile.  Timed as the sketch path a
    # 100 TB profile run takes instead of the vocabulary-sized exact top-k.
    from vector_search_question_answer_api_spark.operators import sketches as SK

    def corpus_profile_sketch(spark, sf_dir):
        d = load_table(spark, sf_dir, "documents")
        return SK.heavy_hitters_sketch(d, k=20, sample_mod=4, candidate_factor=4)

    extra["corpus_profile_sketch"] = corpus_profile_sketch

    # r7: substring-level dedup (Lee et al. 2021) — the full pipeline:
    # k-gram hash-agg -> keep-first marks -> island merge -> HOF strip.
    from vector_search_question_answer_api_spark.operators import spans as SPN

    def dup_span_strip(spark, sf_dir):
        d = load_table(spark, sf_dir, "documents")
        return SPN.strip_duplicate_spans(d, k=8)

    extra["dup_span_strip"] = dup_span_strip

    timings: dict[str, float] = {}
    ledger: dict[str, dict] = {}
    for name in [*HEADLINE, *extra]:
        fn = qs.get(name) or extra.get(name)
        if fn is None:
            continue
        # Adaptive best-of-N (r5, VERDICT r4 #2): single-shot timings on
        # this box swing +-40% with scheduler noise, and best-of-2 was
        # not enough — BENCH_r04 recorded dedup_exact +74% / minhash
        # +53% "regressions" that a same-code re-run placed back at the
        # r3 values while OTHER queries swung +150%.  The work per run
        # is fixed, so noise only ever INFLATES a timing; the min is the
        # true cost, but it is only trustworthy once reproduced.  Keep
        # re-running (max 5) until the two fastest runs agree within
        # 15%, then report the min — a certified-reproducible cost, not
        # a lucky or unlucky draw.  Caches are released between attempts
        # so every run does the full work.
        runs: list[float] = []
        for _ in range(5):
            # cache_scope releases only the caches THIS attempt creates —
            # unpersist_all() would drain the process-global registry and
            # could yank caches out from under other live plans if bench
            # ever runs embedded (ADVICE r3)
            with caching.cache_scope():
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            if len(runs) >= 2:
                lo, lo2 = sorted(runs)[:2]
                if lo2 <= lo * 1.15:
                    break
        timings[name] = round(min(runs), 3)
        # ADVICE r5: min over N>2 runs is biased low vs earlier rounds'
        # min-of-2 — record N and the certified pair (two fastest) per
        # query so cross-round comparisons can use a like-for-like
        # statistic (the pair's SECOND-fastest is the unbiased choice).
        lo, lo2 = sorted(runs)[:2] if len(runs) >= 2 else (runs[0], runs[0])
        ledger[name] = {
            "n": len(runs),
            "best2": [round(lo, 3), round(lo2, 3)],
            "certified": bool(lo2 <= lo * 1.15),
        }

    import shutil

    shutil.rmtree(ondisk_root, ignore_errors=True)
    for g in hnsw_graphs:
        g.unpersist()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "run_ledger": ledger,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
