"""The composed ingest pipeline (streaming/ingest_stream): one document
stream maintains the index, both managed ANN artifacts, the profile
sketches, and the span store — and every store equals its one-shot batch
equivalent afterwards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.ivf import centroid_grid
from vector_search_question_answer_api_spark.operators.pq import (
    codebook_grid,
    ivfpq_topk_ondisk,
    write_ivfpq_index_managed,
)
from vector_search_question_answer_api_spark.sources.tables import load_table
from vector_search_question_answer_api_spark.streaming import ingest_stream as IG

DIM, N_CELLS = 64, 8
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    """Run the composed pipeline over sf0.001 documents split into two
    micro-batches; yield (docs, root)."""
    tmp = tmp_path_factory.mktemp("ingest")
    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        F.timestamp_millis(F.col("doc_id") * 1000).alias("ts"),
        "text",
        "n_chars",
    )
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(f"{tmp}/src/b0")
    docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(f"{tmp}/src/b1")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/src/*")
    )
    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    q = IG.maintain_corpus(
        stream,
        str(tmp / "corpus"),
        checkpoint=str(tmp / "ckpt"),
        codebooks=cbs,
        ann_graphs=True,
        centroids=cents,
        dim=DIM,
        n_cells=N_CELLS,
        backend="numpy",
        span_k=8,
        cms_depth=3,
        cms_width=256,
        trigger_once=True,
    )
    assert q.awaitTermination(300), "ingest stream did not finish"
    return docs, str(tmp / "corpus"), cbs, cents


def test_index_equals_batch_build(spark, ingested):
    from vector_search_question_answer_api_spark.operators.index_build import (
        build_index,
    )

    docs, root, _, _ = ingested
    got = IG.read_corpus_index(spark, root).select(
        "doc_id", "norm_embedding"
    )
    want = build_index(docs).select("doc_id", "norm_embedding")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == docs.count()


def test_profile_equals_one_shot_sketch(spark, ingested):
    from vector_search_question_answer_api_spark.operators import sketches as SK

    docs, root, _, _ = ingested
    prof = IG.read_corpus_profile(spark, root)
    toks = SK.token_stream(docs)
    whole = SK.cms_sketch(toks, depth=3, width=256)
    diff = prof["cms"].exceptAll(whole).unionByName(
        whole.exceptAll(prof["cms"])
    )
    assert diff.count() == 0
    hll = SK.hll_estimate(prof["hll"])
    assert hll == SK.hll_estimate(SK.hll_sketch(toks, "token", lgk=12))


def test_spans_equal_one_shot(spark, ingested):
    from vector_search_question_answer_api_spark.operators import spans as SP

    docs, root, _, _ = ingested
    got = {
        (int(r["doc_id"]), int(r["span_start"]), int(r["span_end"]))
        for r in IG.read_corpus_spans(spark, root, k=8).collect()
    }
    want = {
        (int(r["doc_id"]), int(r["span_start"]), int(r["span_end"]))
        for r in SP.duplicate_spans(docs, k=8).collect()
    }
    assert got == want and got


def test_ann_serving_equals_full_rebuild(spark, ingested, tmp_path):
    from vector_search_question_answer_api_spark.operators import ann_hnsw

    docs, root, cbs, cents = ingested
    fin = IG.read_corpus_index(spark, root).select(
        "doc_id",
        F.col("norm_embedding").cast("array<double>").alias("norm_embedding"),
    ).cache()
    qdf = fin.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )

    def code_rows(path):
        df = ivfpq_topk_ondisk(
            spark, qdf, path, fin, cbs, centroids=cents, k=5,
            dim=DIM, n_cells=N_CELLS, nprobe=N_CELLS, refine=8,
        )
        return {
            (int(r["query_id"]), int(r["rank"])): (
                int(r["doc_id"]), round(float(r["distance"]), 9)
            )
            for r in df.collect()
        }

    fresh = str(tmp_path / "fresh_codes")
    write_ivfpq_index_managed(
        fin, fresh, cbs, centroids=cents, dim=DIM, n_cells=N_CELLS
    )
    got = code_rows(f"{root}/codes")
    assert got == code_rows(fresh) and got

    n = fin.count()

    def graph_rows(g):
        df = ann_hnsw.celled_hnsw_topk_cogrouped(
            g, qdf, centroids=cents, k=5, ef=int(n), dim=DIM,
            n_cells=N_CELLS, nprobe=N_CELLS,
        )
        return {
            (int(r["query_id"]), int(r["rank"])): (
                int(r["doc_id"]), round(float(r["distance"]), 9)
            )
            for r in df.collect()
        }

    maintained = graph_rows(
        ann_hnsw.read_celled_hnsw_index(spark, f"{root}/graphs")
    )
    full = graph_rows(
        ann_hnsw.build_celled_hnsw(
            fin, centroids=cents, dim=DIM, n_cells=N_CELLS, backend="numpy"
        )
    )
    assert maintained == full and maintained
    fin.unpersist()


def test_replayed_batch_changes_nothing(spark, ingested):
    """Re-running batch 1's step by hand under the same batch id (what a
    checkpoint replay does) leaves every read surface identical."""
    from vector_search_question_answer_api_spark.streaming import (
        span_stream as SPS,
        stats_stream as STS,
    )

    docs, root, cbs, cents = ingested
    half = docs.filter("doc_id % 2 = 1")
    before_spans = {
        tuple(r) for r in IG.read_corpus_spans(spark, root, k=8).collect()
    }
    before_cms = {
        tuple(r) for r in IG.read_corpus_profile(spark, root)["cms"].collect()
    }
    STS.write_profile_batch(
        half, f"{root}/profile", 1, depth=3, width=256
    )
    SPS.append_span_batch(half, f"{root}/spans", 1, k=8)
    assert {
        tuple(r) for r in IG.read_corpus_spans(spark, root, k=8).collect()
    } == before_spans
    assert {
        tuple(r) for r in IG.read_corpus_profile(spark, root)["cms"].collect()
    } == before_cms


def test_incremental_center_matches_corpus_center(spark, ingested):
    """The ingest-maintained vector mean (stats_stream.write_vecmean_batch,
    merged by read_profile_center) equals corpus_center over the resolved
    index on an insert-only stream — the incremental-maintenance claim in
    corpus_center's docstring, made real (and the refresh source for the
    centered-LSH artifact's center at scale)."""
    from vector_search_question_answer_api_spark.operators.ann import (
        corpus_center,
    )
    from vector_search_question_answer_api_spark.streaming import (
        stats_stream as STS,
    )

    docs, root, cbs, cents = ingested
    inc = STS.read_profile_center(spark, f"{root}/profile")
    index = IG.read_corpus_index(spark, root)
    full = corpus_center(index)
    assert len(inc) == len(full) == DIM
    # per-batch partial sums merge in a different order than one
    # corpus-wide avg — equal to float64 round-off, not bit-equal
    assert max(abs(a - b) for a, b in zip(inc, full)) < 1e-12


def test_store_derived_lsh_artifact_serves_replay(spark, ingested, tmp_path):
    """The closing loop of the centered-LSH lifecycle: an artifact derived
    entirely from the maintained profile store (center + ingested count —
    no corpus pass) parameterizes the replay lsh tier and reproduces the
    self-hit retrievals; written through write_to it round-trips as a
    standard manifest."""
    from vector_search_question_answer_api_spark.operators import ann
    from vector_search_question_answer_api_spark.operators.sessions import (
        replay_sessions,
    )
    from vector_search_question_answer_api_spark import caching

    docs, root, cbs, cents = ingested
    path = str(tmp_path / "derived_art")
    art = IG.read_corpus_lsh_artifact(spark, root, write_to=path)
    assert art["dim"] == DIM and len(art["center"]) == DIM
    assert ann.read_lsh_artifact(path)["center"] == tuple(art["center"])

    index = IG.read_corpus_index(spark, root).persist()
    qa = (
        docs.limit(5)
        .select(
            F.col("doc_id").alias("event_id"),
            "ts",
            F.lit("s1").alias("session_id"),
            F.col("text").alias("question"),
        )
    )
    with caching.cache_scope():
        rows = {
            r["event_id"]: r
            for r in replay_sessions(
                qa, index, retrieval="lsh", lsh_artifact=art
            ).collect()
        }
    # self-hit: each question IS a corpus doc -> identical vectors share
    # every signature under any center, so retrieval must find it
    hit = [r for r in rows.values() if r["context_doc_id"] is not None]
    assert len(hit) >= 4, rows
    index.unpersist()
