"""Incremental per-cell maintenance of the on-disk ANN artifacts
(VERDICT r6 What's-missing #3): upsert batch → only dirty cell partitions
rewritten; serving ≡ full rebuild; mid-refresh reads safe (generation /
MANIFEST / grace-period semantics inherited from index_stream)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.ivf import (
    centroid_grid,
)
from vector_search_question_answer_api_spark.operators.pq import (
    codebook_grid,
    ivfpq_topk_ondisk,
    refresh_ivfpq_index,
    write_ivfpq_index_managed,
)
from vector_search_question_answer_api_spark.sources.cell_store import (
    cell_store_manifest,
    cell_store_refresh,
    open_cell_table,
)

DIM, N_CELLS = 64, 8


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(11)
    pts = rng.standard_normal((300, DIM))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(300)],
        "doc_id long, norm_embedding array<double>",
    ).cache()
    yield df
    df.unpersist()


def _cells_of(df, cents):
    from vector_search_question_answer_api_spark.operators.ivf import assign_cell

    return {
        int(r["doc_id"]): int(r["cell"])
        for r in df.select(
            "doc_id", assign_cell(F.col("norm_embedding"), cents).alias("cell")
        ).collect()
    }


def _part_files(path):
    """cell value -> sorted parquet file paths currently live for it."""
    man = cell_store_manifest(path)
    out = {}
    for cell, gen in man["cells"].items():
        d = os.path.join(path, gen, f"{man['partition_col']}={cell}")
        out[cell] = sorted(glob.glob(os.path.join(d, "*.parquet")))
    return out


def _moved_upsert(spark, corpus, cents):
    """(index_v1, delta): doc X's vector replaced by one from ANOTHER
    cell, guaranteeing the update moves X between cells."""
    cells = _cells_of(corpus, cents)
    x = 0
    y = next(d for d, c in cells.items() if c != cells[x])
    yvec = corpus.filter(F.col("doc_id") == y).collect()[0]["norm_embedding"]
    delta = spark.createDataFrame(
        [(x, list(yvec))], "doc_id long, norm_embedding array<double>"
    )
    v1 = corpus.filter(F.col("doc_id") != x).unionByName(delta)
    return v1, delta, cells[x], cells[y]


def _canon_graph_topk(df):
    """{(query_id, rank): (doc_id, distance@9dp)} with rank re-derived at
    the comparison's own 9-dp rounding.  The engine's (distance, doc_id)
    tie-break is deterministic, but the distances themselves carry
    row-position-dependent BLAS gemv rounding (the same (q, v) dot lands
    on 1.0 or 1.0-ulp depending on where v sits in the cell matrix's
    internal blocking), so EXACT-duplicate docs — which _moved_upsert
    deliberately creates — may order differently between an
    incrementally-extended matrix and a rebuild's.  That is sub-1e-9
    noise, not a serving divergence; re-ranking both sides by (rounded
    distance, doc_id) keeps the full strength of the pin at its own
    precision."""
    by_q: dict = {}
    engine_rank: dict = {}
    for r in df.collect():
        by_q.setdefault(int(r["query_id"]), []).append(
            (round(float(r["distance"]), 9), int(r["doc_id"]))
        )
        engine_rank[(int(r["query_id"]), int(r["doc_id"]))] = (
            int(r["rank"]), float(r["distance"])
        )
    # ADVICE r15: re-deriving rank on both sides must not un-verify the
    # engine's OWN rank column — assert each side's returned ranks are
    # consistent with its (distance, doc_id) ascending order at full
    # precision, so a rank-assignment regression that preserves distances
    # cannot pass unseen.
    for qid in by_q:
        got = sorted(
            ((d, doc, rk) for (q2, doc), (rk, d) in engine_rank.items()
             if q2 == qid),
            key=lambda t: (t[0], t[1]),
        )
        assert [rk for _, _, rk in got] == list(range(1, len(got) + 1)), (
            f"engine rank column inconsistent with (distance, doc_id) "
            f"order for query {qid}: {got}"
        )
    return {
        (qid, i + 1): (doc, dist)
        for qid, lst in by_q.items()
        for i, (dist, doc) in enumerate(sorted(lst))
    }


def _topk_rows(spark, path, index, cbs, cents):
    q = index.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )
    df = ivfpq_topk_ondisk(
        spark, q, path, index, cbs, centroids=cents, k=5, dim=DIM,
        n_cells=N_CELLS, nprobe=3, refine=8,
    )
    return {
        (int(r["query_id"]), int(r["rank"])): (int(r["doc_id"]),
                                               round(float(r["distance"]), 9))
        for r in df.collect()
    }


def test_managed_ivfpq_serves_like_flat_and_refresh_touches_only_dirty(
    spark, corpus, tmp_path
):
    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    managed = str(tmp_path / "managed")
    flat = str(tmp_path / "flat")

    from vector_search_question_answer_api_spark.operators.pq import (
        write_ivfpq_index,
    )

    write_ivfpq_index_managed(corpus, managed, cbs, centroids=cents,
                              dim=DIM, n_cells=N_CELLS)
    write_ivfpq_index(corpus, flat, cbs, centroids=cents, dim=DIM,
                      n_cells=N_CELLS)
    assert _topk_rows(spark, managed, corpus, cbs, cents) == _topk_rows(
        spark, flat, corpus, cbs, cents
    )

    before = _part_files(managed)
    v1, delta, cell_old, cell_new = _moved_upsert(spark, corpus, cents)
    dirty = refresh_ivfpq_index(
        spark, managed, v1, delta, cbs, centroids=cents, dim=DIM,
        n_cells=N_CELLS,
    )
    # the move makes BOTH the old and new cell dirty
    assert cell_old in dirty and cell_new in dirty
    after = _part_files(managed)
    for cell, files in after.items():
        if int(cell) in dirty:
            assert files != before[cell], f"dirty cell {cell} not rewritten"
        else:
            # clean cells keep their EXACT partition files — nothing
            # was rewritten, moved, or re-encoded for them
            assert files == before[cell], f"clean cell {cell} touched"
    # grace period: the superseded dirty partitions are retired, still
    # on disk until the NEXT write
    for cell in dirty:
        for f in before[str(cell)]:
            assert os.path.exists(f), "grace period violated"

    # serving through the refreshed store == a from-scratch full build
    # over the post-upsert corpus
    fresh = str(tmp_path / "fresh")
    write_ivfpq_index_managed(v1, fresh, cbs, centroids=cents, dim=DIM,
                              n_cells=N_CELLS)
    got = _topk_rows(spark, managed, v1, cbs, cents)
    assert got == _topk_rows(spark, fresh, v1, cbs, cents) and got
    # the moved doc's stale row is gone: no doc_id appears in two cells
    pairs = open_cell_table(spark, managed).select("doc_id", "cell").collect()
    assert len({r["doc_id"] for r in pairs}) == len(pairs)


def test_refresh_mid_publish_reader_sees_complete_old_view(
    spark, corpus, tmp_path
):
    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    path = str(tmp_path / "store")
    write_ivfpq_index_managed(corpus, path, cbs, centroids=cents,
                              dim=DIM, n_cells=N_CELLS)
    want = _topk_rows(spark, path, corpus, cbs, cents)
    v1, delta, *_ = _moved_upsert(spark, corpus, cents)

    seen = {}

    def probe():
        # a reader BETWEEN the new-generation write and the manifest
        # swap must resolve the complete OLD view
        seen["rows"] = _topk_rows(spark, path, corpus, cbs, cents)

    refresh_ivfpq_index(
        spark, path, v1, delta, cbs, centroids=cents, dim=DIM,
        n_cells=N_CELLS, _pre_publish_hook=probe,
    )
    assert seen["rows"] == want


def test_refresh_rejects_rows_outside_dirty_set(spark, corpus, tmp_path):
    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    path = str(tmp_path / "store")
    write_ivfpq_index_managed(corpus, path, cbs, centroids=cents,
                              dim=DIM, n_cells=N_CELLS)
    man_before = cell_store_manifest(path)
    all_cells = open_cell_table(spark, path)
    with pytest.raises(ValueError, match="outside the declared dirty set"):
        cell_store_refresh(spark, path, all_cells, dirty_cells=[0])
    assert cell_store_manifest(path) == man_before  # nothing published


def test_crash_orphan_partitions_swept_and_compact_folds(
    spark, corpus, tmp_path
):
    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    path = str(tmp_path / "store")
    write_ivfpq_index_managed(corpus, path, cbs, centroids=cents,
                              dim=DIM, n_cells=N_CELLS)
    want = _topk_rows(spark, path, corpus, cbs, cents)
    # simulate a refresh that died after writing its generation but
    # before publishing: partitions referenced by neither MANIFEST nor
    # RETIRED
    orphan = os.path.join(path, ".gen-000990", "cell=0")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as f:
        f.write("x")
    v1, delta, *_ = _moved_upsert(spark, corpus, cents)
    refresh_ivfpq_index(spark, path, v1, delta, cbs, centroids=cents,
                        dim=DIM, n_cells=N_CELLS)
    assert not os.path.exists(orphan), "crash orphan not swept"

    # compact: everything folds to one generation, serving unchanged
    from vector_search_question_answer_api_spark.sources.cell_store import (
        cell_store_compact,
    )

    got = _topk_rows(spark, path, v1, cbs, cents)
    cell_store_compact(spark, path)
    man = cell_store_manifest(path)
    assert len(set(man["cells"].values())) == 1
    assert _topk_rows(spark, path, v1, cbs, cents) == got


def test_celled_hnsw_refresh_matches_full_rebuild(spark, corpus, tmp_path):
    from vector_search_question_answer_api_spark.operators import ann_hnsw

    cents = centroid_grid(DIM, N_CELLS)
    path = str(tmp_path / "graphs")
    graphs = ann_hnsw.build_celled_hnsw(
        corpus, centroids=cents, dim=DIM, n_cells=N_CELLS, backend="numpy"
    )
    ann_hnsw.write_celled_hnsw_index_managed(graphs, path)
    before = _part_files(path)

    v1, delta, cell_old, cell_new = _moved_upsert(spark, corpus, cents)
    prev_delta = corpus.join(
        delta.select("doc_id"), "doc_id", "left_semi"
    )
    dirty = ann_hnsw.refresh_celled_hnsw_index(
        spark, path, v1, delta, prev_delta=prev_delta, centroids=cents,
        dim=DIM, n_cells=N_CELLS, backend="numpy",
    )
    assert cell_old in dirty and cell_new in dirty
    after = _part_files(path)
    for cell, files in after.items():
        if int(cell) in dirty:
            assert files != before[cell]
        else:
            assert files == before[cell], f"clean cell {cell} touched"

    # serving (exhaustive walk, all cells probed) == a full rebuild of
    # the post-upsert corpus == ivf exact semantics
    q = v1.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )
    n = v1.count()

    def rows(g):
        return _canon_graph_topk(
            ann_hnsw.celled_hnsw_topk_cogrouped(
                g, q, centroids=cents, k=5, ef=int(n), dim=DIM,
                n_cells=N_CELLS, nprobe=N_CELLS,
            )
        )

    refreshed = rows(ann_hnsw.read_celled_hnsw_index(spark, path))
    full = rows(
        ann_hnsw.build_celled_hnsw(
            v1, centroids=cents, dim=DIM, n_cells=N_CELLS, backend="numpy"
        )
    )
    assert refreshed == full and refreshed


def test_managed_write_crash_before_graphs_leaves_no_manifest(
    spark, corpus, tmp_path, monkeypatch
):
    """ADVICE r8 (low): the ids sidecar is written BEFORE the graphs
    store, so a crash between the two leaves NO graphs manifest — the
    ingest init gate (which checks exactly that manifest) re-runs the
    full write, superseding the stale sidecar.  The old graphs-first
    order left a manifest-complete graph store with no sidecar, silently
    and permanently falling back to the non-replay-safe prev_delta path."""
    import pytest

    from vector_search_question_answer_api_spark.operators import ann_hnsw
    from vector_search_question_answer_api_spark.operators.ivf import (
        assign_cell,
    )
    from vector_search_question_answer_api_spark.sources import (
        cell_store as CS,
    )

    cents = centroid_grid(DIM, N_CELLS)
    path = str(tmp_path / "graphs")
    graphs = ann_hnsw.build_celled_hnsw(
        corpus, centroids=cents, dim=DIM, n_cells=N_CELLS, backend="numpy"
    )
    ids = corpus.select(
        "doc_id", assign_cell(F.col("norm_embedding"), cents).alias("cell")
    )

    real = CS.cell_store_write_full
    order: list = []

    def crashing(df, p, *a, **k):
        order.append(p)
        if p == path:
            raise RuntimeError("crash mid graphs write")
        return real(df, p, *a, **k)

    monkeypatch.setattr(CS, "cell_store_write_full", crashing)
    with pytest.raises(RuntimeError):
        ann_hnsw.write_celled_hnsw_index_managed(graphs, path, ids=ids)
    assert order == [os.path.join(path, "ids"), path]  # sidecar first
    assert CS.cell_store_manifest(path) is None  # init gate re-fires
    monkeypatch.setattr(CS, "cell_store_write_full", real)
    # the re-initialization supersedes the stale sidecar and the refresh
    # path sees a consistent store
    ann_hnsw.write_celled_hnsw_index_managed(graphs, path, ids=ids)
    assert CS.cell_store_manifest(path) is not None
    assert CS.cell_store_manifest(os.path.join(path, "ids")) is not None


def test_graph_sidecar_makes_cell_moves_replay_safe(spark, corpus, tmp_path):
    """ADVICE r7: the (doc_id, cell) membership sidecar supplies the OLD
    cell of a cell-moving upsert from durable store state — no
    caller-supplied prev_delta — and a checkpoint-style replay of the same
    batch (first attempt finished the refresh, crash before the
    checkpoint committed) converges with no stale entry."""
    from vector_search_question_answer_api_spark.operators import ann_hnsw
    from vector_search_question_answer_api_spark.operators.ivf import (
        assign_cell,
    )

    cents = centroid_grid(DIM, N_CELLS)
    path = str(tmp_path / "graphs")
    ann_hnsw.write_celled_hnsw_index_managed(
        ann_hnsw.build_celled_hnsw(
            corpus, centroids=cents, dim=DIM, n_cells=N_CELLS,
            backend="numpy",
        ),
        path,
        ids=corpus.select(
            "doc_id",
            assign_cell(F.col("norm_embedding"), cents).alias("cell"),
        ),
    )
    v1, delta, cell_old, cell_new = _moved_upsert(spark, corpus, cents)

    def refresh():
        # no prev_delta: this is exactly the crash-replay shape — the
        # index view is already post-upsert, the only old-cell evidence
        # is what the store itself holds
        return ann_hnsw.refresh_celled_hnsw_index(
            spark, path, v1, delta, centroids=cents, dim=DIM,
            n_cells=N_CELLS, backend="numpy",
        )

    dirty = refresh()
    assert cell_old in dirty and cell_new in dirty

    q = v1.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )
    n = v1.count()

    def rows(g):
        return _canon_graph_topk(
            ann_hnsw.celled_hnsw_topk_cogrouped(
                g, q, centroids=cents, k=5, ef=int(n), dim=DIM,
                n_cells=N_CELLS, nprobe=N_CELLS,
            )
        )

    full = rows(
        ann_hnsw.build_celled_hnsw(
            v1, centroids=cents, dim=DIM, n_cells=N_CELLS, backend="numpy"
        )
    )
    assert rows(ann_hnsw.read_celled_hnsw_index(spark, path)) == full

    # sidecar now maps the doc to its NEW cell only; the replay's dirty
    # set shrinks but serving stays ≡ the full rebuild
    dirty2 = refresh()
    assert cell_new in dirty2
    assert rows(ann_hnsw.read_celled_hnsw_index(spark, path)) == full
    # and the sidecar itself converged to the post-upsert membership
    side = {
        int(r["doc_id"]): int(r["cell"])
        for r in open_cell_table(spark, os.path.join(path, "ids")).collect()
    }
    assert side == _cells_of(v1, cents)


def test_managed_store_scan_keeps_partition_filters(spark, corpus, tmp_path):
    """Each live generation's scan must carry BOTH the manifest-cell
    filter and any downstream probed-cell isin as PARTITION filters —
    pruning composes, superseded partitions are never listed."""
    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    path = str(tmp_path / "store")
    write_ivfpq_index_managed(corpus, path, cbs, centroids=cents,
                              dim=DIM, n_cells=N_CELLS)
    v1, delta, *_ = _moved_upsert(spark, corpus, cents)
    refresh_ivfpq_index(spark, path, v1, delta, cbs, centroids=cents,
                        dim=DIM, n_cells=N_CELLS)
    df = open_cell_table(spark, path).filter(F.col("cell").isin([1, 2]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 2  # one per live generation
    for s in scans:
        assert "PartitionFilters: [" in s and "DataFilters: []" in s, s


def test_streaming_upsert_refreshes_only_dirty_cells(spark, tmp_path):
    """The full VERDICT r6 #4 loop: an upsert MICRO-BATCH through
    Structured Streaming appends to the index log AND refreshes both
    managed ANN artifacts — only dirty cell partitions rewritten, search
    through the refreshed stores ≡ a full rebuild of the final state."""
    from vector_search_question_answer_api_spark.operators import ann_hnsw
    from vector_search_question_answer_api_spark.operators.index_build import (
        build_index,
    )
    from vector_search_question_answer_api_spark.operators.ivf import assign_cell
    from vector_search_question_answer_api_spark.operators.pq import (
        write_ivfpq_index,
    )
    from vector_search_question_answer_api_spark.sources.tables import load_table
    from vector_search_question_answer_api_spark.streaming.ann_maintain import (
        maintain_search_artifacts,
    )
    from vector_search_question_answer_api_spark.streaming.index_stream import (
        index_stream,
        read_index_latest,
    )

    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    root = str(tmp_path)
    log_path, codes, graphs = f"{root}/idx", f"{root}/codes", f"{root}/graphs"

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id",
        F.timestamp_millis(F.col("doc_id") * 1000).alias("ts"),
        "text",
    )
    idx0 = build_index(docs).cache()
    # init: log seeded with the v0 index rows; both stores built from v0
    idx0.withColumn("ts", F.timestamp_millis(F.col("doc_id"))).withColumn(
        "_batch", F.lit(0)
    ).write.parquet(f"{log_path}/log")
    write_ivfpq_index_managed(idx0, codes, cbs, centroids=cents, dim=DIM,
                              n_cells=N_CELLS)
    ann_hnsw.write_celled_hnsw_index_managed(
        ann_hnsw.build_celled_hnsw(idx0, centroids=cents, dim=DIM,
                                   n_cells=N_CELLS, backend="numpy"),
        graphs,
    )
    codes_before, graphs_before = _part_files(codes), _part_files(graphs)

    # the upsert batch: 3 docs re-submitted with CHANGED text (new
    # embeddings, possibly new cells) at a later ts
    updates = docs.filter("doc_id < 3").select(
        "doc_id",
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts"),
        F.concat(F.lit("totally different replacement text "), F.col("text")).alias("text"),
    )
    updates.coalesce(1).write.parquet(f"{root}/src/u0")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/src/*")
    )
    q = maintain_search_artifacts(
        index_stream(stream), log_path, checkpoint=f"{root}/ckpt",
        codebooks=cbs, codes_path=codes, graphs_path=graphs,
        centroids=cents, dim=DIM, n_cells=N_CELLS, trigger_once=True,
        backend="numpy",
    )
    assert q.awaitTermination(180), "maintenance stream did not finish"

    # expected dirty set: cells of the new vectors ∪ cells of the prior
    # versions of those docs
    new_idx = build_index(updates)
    expect_dirty = {
        int(r["cell"])
        for r in new_idx.unionByName(idx0.filter("doc_id < 3"))
        .select(assign_cell(F.col("norm_embedding"), cents).alias("cell"))
        .distinct()
        .collect()
    }
    for name, path, before in (("codes", codes, codes_before),
                               ("graphs", graphs, graphs_before)):
        after = _part_files(path)
        rewritten = {int(c) for c in after if after[c] != before.get(c)}
        assert rewritten == (expect_dirty & rewritten | rewritten)  # sanity
        assert rewritten <= expect_dirty, (name, rewritten, expect_dirty)
        for c in after:
            if int(c) not in expect_dirty:
                assert after[c] == before[c], f"{name}: clean cell {c} touched"

    # final resolved state == v0 with docs 0-2 replaced
    final = read_index_latest(spark, log_path)
    want_final = idx0.filter("doc_id >= 3").unionByName(new_idx)
    assert (
        final.exceptAll(want_final).count() == 0
        and want_final.exceptAll(final).count() == 0
    )

    # serving equality vs full rebuilds of the final state
    fin = final.select("doc_id", F.col("norm_embedding").cast("array<double>").alias("norm_embedding")).cache()
    fresh_codes = f"{root}/fresh_codes"
    write_ivfpq_index_managed(fin, fresh_codes, cbs, centroids=cents,
                              dim=DIM, n_cells=N_CELLS)
    got = _topk_rows(spark, codes, fin, cbs, cents)
    assert got == _topk_rows(spark, fresh_codes, fin, cbs, cents) and got

    qdf = fin.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )
    n = fin.count()

    def rows(g):
        return _canon_graph_topk(
            ann_hnsw.celled_hnsw_topk_cogrouped(
                g, qdf, centroids=cents, k=5, ef=int(n), dim=DIM,
                n_cells=N_CELLS, nprobe=N_CELLS,
            )
        )

    refreshed = rows(ann_hnsw.read_celled_hnsw_index(spark, graphs))
    full = rows(ann_hnsw.build_celled_hnsw(fin, centroids=cents, dim=DIM,
                                           n_cells=N_CELLS, backend="numpy"))
    assert refreshed == full and refreshed
    idx0.unpersist()
    fin.unpersist()


def test_refresh_sequence_with_compact_converges_to_full_build(
    spark, corpus, tmp_path
):
    """Robustness over a LIFETIME of maintenance: five successive upsert
    batches (inserts, updates, cell-moving updates), a compact in the
    middle — the store's resolved content after every step equals a
    direct encode of the running state, and the final store serves
    identically to a one-shot build."""
    from vector_search_question_answer_api_spark.operators.pq import (
        _encode_cells,
    )
    from vector_search_question_answer_api_spark.sources.cell_store import (
        cell_store_compact,
    )

    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    path = str(tmp_path / "store")

    state = {r["doc_id"]: list(r["norm_embedding"]) for r in corpus.collect()}
    vecs = sorted(state.items())
    write_ivfpq_index_managed(corpus, path, cbs, centroids=cents, dim=DIM,
                              n_cells=N_CELLS)

    rng = np.random.RandomState(5)
    for step in range(5):
        batch = {}
        # 2 updates of existing docs with vectors borrowed from other docs
        # (high chance of a cell move), 1 brand-new doc
        for _ in range(2):
            target = int(rng.choice(list(state)))
            donor = vecs[int(rng.randint(len(vecs)))][1]
            batch[target] = donor
        new_id = 1000 + step
        batch[new_id] = vecs[int(rng.randint(len(vecs)))][1]
        state.update(batch)
        delta = spark.createDataFrame(
            [(d, v) for d, v in batch.items()],
            "doc_id long, norm_embedding array<double>",
        )
        index = spark.createDataFrame(
            [(d, v) for d, v in sorted(state.items())],
            "doc_id long, norm_embedding array<double>",
        )
        refresh_ivfpq_index(spark, path, index, delta, cbs, centroids=cents,
                            dim=DIM, n_cells=N_CELLS)
        if step == 2:
            cell_store_compact(spark, path)
        got = {
            (r["doc_id"], r["cell"], tuple(r["codes"]))
            for r in open_cell_table(spark, path).collect()
        }
        want = {
            (r["doc_id"], r["cell"], tuple(r["codes"]))
            for r in _encode_cells(index, cbs, cents, DIM, N_CELLS).collect()
        }
        assert got == want and len(got) == len(state), f"drift at step {step}"

    final = spark.createDataFrame(
        [(d, v) for d, v in sorted(state.items())],
        "doc_id long, norm_embedding array<double>",
    ).cache()
    fresh = str(tmp_path / "fresh")
    write_ivfpq_index_managed(final, fresh, cbs, centroids=cents, dim=DIM,
                              n_cells=N_CELLS)
    got = _topk_rows(spark, path, final, cbs, cents)
    assert got == _topk_rows(spark, fresh, final, cbs, cents) and got
    final.unpersist()


def test_live_generations_and_auto_compact_wiring(spark, corpus, tmp_path):
    """live-generation accounting: +1 per refresh, folded to 1 by
    compact; the streaming maintainer auto-compacts past its threshold
    (codes store only, 2 micro-batches, compact_every_gens=1)."""
    from vector_search_question_answer_api_spark.operators.index_build import (
        build_index,
    )
    from vector_search_question_answer_api_spark.sources.cell_store import (
        cell_store_compact,
        cell_store_live_generations,
    )
    from vector_search_question_answer_api_spark.sources.tables import load_table
    from vector_search_question_answer_api_spark.streaming.ann_maintain import (
        maintain_search_artifacts,
    )
    from vector_search_question_answer_api_spark.streaming.index_stream import (
        index_stream,
    )

    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    path = str(tmp_path / "store")
    write_ivfpq_index_managed(corpus, path, cbs, centroids=cents, dim=DIM,
                              n_cells=N_CELLS)
    assert cell_store_live_generations(path) == 1
    delta = corpus.filter("doc_id < 3")
    refresh_ivfpq_index(spark, path, corpus, delta, cbs, centroids=cents,
                        dim=DIM, n_cells=N_CELLS)
    assert cell_store_live_generations(path) == 2
    cell_store_compact(spark, path)
    assert cell_store_live_generations(path) == 1

    # streaming wiring: threshold 1 → every batch that pushes the store
    # to 2 live generations triggers a fold back to 1
    root = str(tmp_path)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id",
        F.timestamp_millis(F.col("doc_id") * 1000).alias("ts"),
        "text",
    )
    idx0 = build_index(docs)
    codes = f"{root}/codes"
    idx0.withColumn("ts", F.timestamp_millis(F.col("doc_id"))).withColumn(
        "_batch", F.lit(0)
    ).write.parquet(f"{root}/idx/log")
    write_ivfpq_index_managed(idx0, codes, cbs, centroids=cents, dim=DIM,
                              n_cells=N_CELLS)
    for i in range(2):
        docs.filter(f"doc_id = {i}").select(
            "doc_id",
            (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts"),
            F.concat(F.lit(f"update {i} "), F.col("text")).alias("text"),
        ).coalesce(1).write.parquet(f"{root}/src/u{i}")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/src/*")
    )
    q = maintain_search_artifacts(
        index_stream(stream), f"{root}/idx", checkpoint=f"{root}/ckpt",
        codebooks=cbs, codes_path=codes, centroids=cents, dim=DIM,
        n_cells=N_CELLS, trigger_once=True, compact_every_gens=1,
    )
    assert q.awaitTermination(180), "maintenance stream did not finish"
    assert cell_store_live_generations(codes) == 1


@pytest.fixture(scope="module")
def cl_corpus(spark):
    """(df, cents): 240 points in N_CELLS tight clusters (sigma=0.05
    around unit centers) with the cluster centers AS the centroid layout
    — the clustered geometry lossless probe pruning targets (radii ~0.4
    against inter-centroid chords ~1.4), where a radius-growing upsert
    is easy to construct."""
    rng = np.random.RandomState(23)
    cents = rng.standard_normal((N_CELLS, DIM))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    pts = cents[np.arange(240) % N_CELLS] + 0.05 * rng.standard_normal(
        (240, DIM)
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(240)],
        "doc_id long, norm_embedding array<double>",
    ).cache()
    layout = tuple(tuple(float(x) for x in c) for c in cents)
    yield df, layout
    df.unpersist()


def _far_member_upsert(spark, corpus, cents):
    """(index_v1, delta, cell, old_r): doc 5's vector replaced by one that
    STAYS in its cell but lands FARTHER from the centroid than every
    current member — the upsert that breaks a stale radii sidecar."""
    from vector_search_question_answer_api_spark.operators import ann_hnsw
    from vector_search_question_answer_api_spark.operators.ivf import (
        assign_cell,
    )

    radii = ann_hnsw.cell_radii(corpus, centroids=cents, dim=DIM)
    cells = _cells_of(corpus, cents)
    x = 5
    c = np.asarray(cents[cells[x]], dtype=np.float64)
    c_hat = c / np.linalg.norm(c)
    rng = np.random.RandomState(7)
    for _ in range(50):
        u = rng.standard_normal(DIM)
        u -= (u @ c_hat) * c_hat
        u /= np.linalg.norm(u)
        for t in (2.0, 1.5, 1.0, 0.7):
            v = c_hat + t * u
            v /= np.linalg.norm(v)
            vv = [float(z) for z in v]
            got_cell = spark.createDataFrame(
                [(vv,)], "v array<double>"
            ).select(assign_cell(F.col("v"), cents).alias("c")).first()["c"]
            new_r = float(np.linalg.norm(v - c))
            if int(got_cell) == cells[x] and new_r > radii[cells[x]] + 0.05:
                delta = spark.createDataFrame(
                    [(x, vv)], "doc_id long, norm_embedding array<double>"
                )
                v1 = corpus.filter(F.col("doc_id") != x).unionByName(delta)
                return v1, delta, cells[x], radii[cells[x]]
    raise AssertionError("could not construct a radius-growing upsert")


def test_refresh_maintains_radii_sidecar(spark, cl_corpus, tmp_path):
    """r11: a managed graph store carrying a pruning-radii sidecar keeps
    it EXACT through per-cell refreshes.  Stale radii are not a freshness
    bug but a CORRECTNESS bug: an upsert landing farther from its
    centroid than the stored radius makes the pruned tier's lower bound
    overstate, silently skipping cells that hold true top-k members.
    Pins: (a) post-refresh sidecar == cell_radii over the post-upsert
    corpus exactly (growth via the far upsert AND shrink via the moved
    doc — tight, not just valid); (b) pruned == unpruned served from the
    refreshed store with the maintained radii; (c) the stale radii really
    were too small (the maintenance mattered)."""
    from vector_search_question_answer_api_spark.operators import ann_hnsw

    corpus, cents = cl_corpus
    path = str(tmp_path / "graphs")
    graphs = ann_hnsw.build_celled_hnsw(
        corpus, centroids=cents, dim=DIM, n_cells=N_CELLS, backend="numpy"
    )
    from vector_search_question_answer_api_spark.operators.ivf import (
        assign_cell,
    )

    ids = corpus.select(
        "doc_id", assign_cell(F.col("norm_embedding"), cents).alias("cell")
    )
    ann_hnsw.write_celled_hnsw_index_managed(graphs, path, ids=ids)
    ann_hnsw.write_cell_radii(
        path, ann_hnsw.cell_radii(corpus, centroids=cents, dim=DIM)
    )

    v1, delta, cell, old_r = _far_member_upsert(spark, corpus, cents)
    ann_hnsw.refresh_celled_hnsw_index(
        spark, path, v1, delta, centroids=cents, dim=DIM,
        n_cells=N_CELLS, backend="numpy",
    )
    fresh = ann_hnsw.cell_radii(v1, centroids=cents, dim=DIM)
    stored = ann_hnsw.read_cell_radii(path)
    assert all(abs(a - b) < 1e-12 for a, b in zip(stored, fresh))
    assert fresh[cell] > old_r  # (c) the stale sidecar undercovered

    q = v1.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )
    g = ann_hnsw.read_celled_hnsw_index(spark, path)

    def rows(df):
        return {
            (int(r["query_id"]), int(r["rank"])): (
                int(r["doc_id"]), round(float(r["distance"]), 9)
            )
            for r in df.collect()
        }

    unpruned = rows(ann_hnsw.celled_hnsw_topk_cogrouped(
        g, q, centroids=cents, k=3, ef=50, dim=DIM, n_cells=N_CELLS,
        nprobe=4,
    ))
    pruned = rows(ann_hnsw.celled_hnsw_topk_pruned(
        g, q, stored, centroids=cents, k=3, ef=50, dim=DIM,
        n_cells=N_CELLS, nprobe=4,
    ))
    assert pruned == unpruned and pruned


def test_refresh_radii_widen_publish_tighten_crash_window(
    spark, cl_corpus, tmp_path
):
    """r11: a refresh that dies BEFORE the graph publish leaves the radii
    sidecar at max(old, new) per cell — a valid cover for whichever
    membership is live — and the checkpoint replay re-tightens to exact.
    Without the sidecar, refresh behavior is unchanged (skip path)."""
    import pytest as _pytest

    from vector_search_question_answer_api_spark.operators import ann_hnsw
    from vector_search_question_answer_api_spark.operators.ivf import (
        assign_cell,
    )

    corpus, cents = cl_corpus
    path = str(tmp_path / "graphs")
    graphs = ann_hnsw.build_celled_hnsw(
        corpus, centroids=cents, dim=DIM, n_cells=N_CELLS, backend="numpy"
    )
    ids = corpus.select(
        "doc_id", assign_cell(F.col("norm_embedding"), cents).alias("cell")
    )
    ann_hnsw.write_celled_hnsw_index_managed(graphs, path, ids=ids)
    old = ann_hnsw.cell_radii(corpus, centroids=cents, dim=DIM)
    ann_hnsw.write_cell_radii(path, old)

    v1, delta, cell, _old_r = _far_member_upsert(spark, corpus, cents)

    def boom():
        raise RuntimeError("crash before publish")

    with _pytest.raises(RuntimeError, match="crash before publish"):
        ann_hnsw.refresh_celled_hnsw_index(
            spark, path, v1, delta, centroids=cents, dim=DIM,
            n_cells=N_CELLS, backend="numpy", _pre_publish_hook=boom,
        )
    fresh = ann_hnsw.cell_radii(v1, centroids=cents, dim=DIM)
    widened = ann_hnsw.read_cell_radii(path)
    assert all(
        abs(w - max(o, n)) < 1e-12 for w, o, n in zip(widened, old, fresh)
    )
    # the old store is still live (publish never happened) and the
    # widened radii still cover it: pruned == unpruned on the OLD graphs
    q = corpus.filter(F.col("doc_id") < 12).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm_embedding").alias("qvec"),
    )
    g = ann_hnsw.read_celled_hnsw_index(spark, path)

    def rows(df):
        return {
            (int(r["query_id"]), int(r["rank"])): int(r["doc_id"])
            for r in df.collect()
        }

    assert rows(ann_hnsw.celled_hnsw_topk_pruned(
        g, q, widened, centroids=cents, k=3, ef=50, dim=DIM,
        n_cells=N_CELLS, nprobe=4,
    )) == rows(ann_hnsw.celled_hnsw_topk_cogrouped(
        g, q, centroids=cents, k=3, ef=50, dim=DIM, n_cells=N_CELLS,
        nprobe=4,
    ))
    # the replay (same batch, no crash) converges the sidecar to exact
    ann_hnsw.refresh_celled_hnsw_index(
        spark, path, v1, delta, centroids=cents, dim=DIM,
        n_cells=N_CELLS, backend="numpy",
    )
    stored = ann_hnsw.read_cell_radii(path)
    assert all(abs(a - b) < 1e-12 for a, b in zip(stored, fresh))


def test_codes_refresh_incremental_dup_fallback_and_replay(
    spark, corpus, tmp_path
):
    """r13: the codes refresh derives dirty cells from DURABLE store rows
    + a batch-sized encode (no resolved scan, no full-cell re-encode).
    Pins: (a) an INTRA-BATCH duplicate delta (two versions of one doc —
    un-orderable without ts) falls back to the resolved re-encode and
    serves the latest-wins state; (b) a replayed batch (same delta twice,
    the checkpoint-replay shape) converges to the same serving relation."""
    from vector_search_question_answer_api_spark.operators import ann_hnsw  # noqa: F401

    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)
    path = str(tmp_path / "codes")
    write_ivfpq_index_managed(
        corpus, path, cbs, centroids=cents, dim=DIM, n_cells=N_CELLS
    )

    # two versions of doc 0 in ONE delta: the old vector and doc 7's
    # vector — without ts the incremental path cannot pick the winner
    v_old = corpus.filter(F.col("doc_id") == 0)
    v_new = corpus.filter(F.col("doc_id") == 7).select(
        F.lit(0).cast("long").alias("doc_id"), "norm_embedding"
    )
    delta = v_old.unionByName(v_new)
    v1 = corpus.filter(F.col("doc_id") != 0).unionByName(v_new)
    refresh_ivfpq_index(
        spark, path, v1, delta, cbs, centroids=cents, dim=DIM,
        n_cells=N_CELLS,
    )
    got = _topk_rows(spark, path, v1, cbs, cents)
    flat = str(tmp_path / "codes_flat")
    write_ivfpq_index_managed(
        v1, flat, cbs, centroids=cents, dim=DIM, n_cells=N_CELLS
    )
    want = _topk_rows(spark, flat, v1, cbs, cents)
    assert got == want and got

    # replay: the SAME (non-dup) follow-up batch applied twice converges
    upd = corpus.filter(F.col("doc_id") == 11).select(
        F.lit(3).cast("long").alias("doc_id"), "norm_embedding"
    )
    v2 = v1.filter(F.col("doc_id") != 3).unionByName(upd)
    for _ in range(2):
        refresh_ivfpq_index(
            spark, path, v2, upd, cbs, centroids=cents, dim=DIM,
            n_cells=N_CELLS,
        )
    got2 = _topk_rows(spark, path, v2, cbs, cents)
    flat2 = str(tmp_path / "codes_flat2")
    write_ivfpq_index_managed(
        v2, flat2, cbs, centroids=cents, dim=DIM, n_cells=N_CELLS
    )
    assert got2 == _topk_rows(spark, flat2, v2, cbs, cents) and got2


def test_codes_same_batch_upsert_and_delete_falls_back(
    spark, corpus, tmp_path, monkeypatch
):
    """r15 (VERDICT r14 What's wrong #1, codes side): ONE batch carrying
    an add AND a null-vector tombstone for the same doc must trip the
    intra-batch duplicate census and fall back to the resolved re-encode
    — the resolved view's tombstone-first rule says DELETED, which the
    incremental derivation (surviving-minus-batch ∪ encode-the-add)
    cannot reproduce.  Pins: (a) the doc is physically absent from the
    codes store and serving ≡ a fresh managed build over the resolved
    corpus; (b) MUTATION — the pre-r15 adds-only census (via the
    _census_gids seam) leaves the doc's code in the store, and the pin
    catches it."""
    from vector_search_question_answer_api_spark.operators import pq as PQ

    cbs = codebook_grid(DIM, 8, 16)
    cents = centroid_grid(DIM, N_CELLS)

    def _mixed_delta():
        add = corpus.filter(F.col("doc_id") == 7).select(
            F.lit(0).cast("long").alias("doc_id"), "norm_embedding"
        )
        tomb = spark.createDataFrame([(0,)], "doc_id long").select(
            "doc_id",
            F.lit(None).cast("array<double>").alias("norm_embedding"),
        )
        return add.unionByName(tomb)

    def _run(path):
        write_ivfpq_index_managed(
            corpus, path, cbs, centroids=cents, dim=DIM, n_cells=N_CELLS
        )
        v1 = corpus.filter(F.col("doc_id") != 0)
        refresh_ivfpq_index(
            spark, path, v1, _mixed_delta(), cbs, centroids=cents, dim=DIM,
            n_cells=N_CELLS,
        )
        stored_ids = {
            int(r["doc_id"])
            for r in open_cell_table(spark, path).select("doc_id").collect()
        }
        return v1, stored_ids

    path = str(tmp_path / "codes_fixed")
    v1, stored_ids = _run(path)
    assert 0 not in stored_ids
    flat = str(tmp_path / "codes_fixed_flat")
    write_ivfpq_index_managed(
        v1, flat, cbs, centroids=cents, dim=DIM, n_cells=N_CELLS
    )
    got = _topk_rows(spark, path, v1, cbs, cents)
    assert got == _topk_rows(spark, flat, v1, cbs, cents) and got

    # mutation: adds-only census — the add's code survives in the store
    # for a doc the resolved index says is deleted, and the pin sees it
    monkeypatch.setattr(
        PQ,
        "_census_gids",
        lambda delta, id_col: delta.filter(
            F.col("norm_embedding").isNotNull()
        ).select(F.col(id_col).alias("doc_id")),
    )
    _, stored_mut = _run(str(tmp_path / "codes_mutated"))
    assert 0 in stored_mut, (
        "adds-only census mutation not detected — the codes mixed-batch "
        "pin has no teeth"
    )


# ---------------------------------------------------------------------------
# r14 — bounded time-travel (VERDICT r13 missing #1): history_keep retains
# the K most recent superseded per-cell mappings; open_cell_table(
# up_to_batch=B) serves any retained epoch exactly and raises below the
# retained horizon; truncation is the physical-purge escape hatch.


def _hist_rows(spark, vals):
    """(doc_id, cell, v) rows — cell = doc_id % 4, v from the mapping."""
    return spark.createDataFrame(
        [(d, d % 4, v) for d, v in vals.items()],
        "doc_id long, cell int, v long",
    )


def _read_at(spark, path, b=None):
    return {
        (int(r["doc_id"])): (int(r["cell"]), int(r["v"]))
        for r in open_cell_table(spark, path, up_to_batch=b).collect()
    }


def test_history_serves_retained_epochs_trims_and_protects_dirs(
    spark, tmp_path
):
    from vector_search_question_answer_api_spark.sources.cell_store import (
        cell_store_write_full,
    )

    path = str(tmp_path / "store")
    # epoch 0: docs 0-7 at v=0
    states = {0: {d: 0 for d in range(8)}}
    cell_store_write_full(
        _hist_rows(spark, states[0]), path, batch_id=0, history_keep=2
    )
    # epochs 1..3: bump one cell's docs per epoch (dirty set = 1 cell)
    for b in (1, 2, 3):
        states[b] = dict(states[b - 1])
        for d in range(8):
            if d % 4 == b % 4:
                states[b][d] = b
        dirty = [b % 4]
        cell_store_refresh(
            spark,
            path,
            _hist_rows(
                spark, {d: v for d, v in states[b].items() if d % 4 == b % 4}
            ),
            dirty,
            batch_id=b,
        )
    man = cell_store_manifest(path)
    assert man["history_keep"] == 2
    assert [s["batch"] for s in man["history"]] == [1, 2]  # 0 trimmed out
    # every retained epoch serves EXACTLY its recorded state (and the
    # current bound serves the newest)
    for b in (1, 2, 3):
        want = {d: (d % 4, v) for d, v in states[b].items()}
        assert _read_at(spark, path, b) == want, f"epoch {b}"
    assert _read_at(spark, path) == {
        d: (d % 4, v) for d, v in states[3].items()
    }
    # below the retained horizon: loud raise, with the horizon named
    with pytest.raises(ValueError, match="retained horizon"):
        _read_at(spark, path, 0)


def test_bound_above_absorbed_frontier_raises(spark, tmp_path):
    """r15 (VERDICT r14 What's wrong #2): a bound ABOVE the store's
    absorbed frontier must RAISE, not serve — a lagging store (a direct
    caller outside resolve_epoch's committed bound, or a store
    bootstrapped mid-stream) would otherwise hand its stale state to a
    future-epoch reader as if it were epoch-B.  Pins: at/below the
    frontier serves; above it raises naming the frontier; a no-op
    frontier stamp (the batch absorbed, nothing changed) makes the same
    bound serve."""
    from vector_search_question_answer_api_spark.sources.cell_store import (
        cell_store_stamp_frontier,
        cell_store_write_full,
    )

    path = str(tmp_path / "lagging")
    cell_store_write_full(
        _hist_rows(spark, {d: 0 for d in range(8)}), path, batch_id=3
    )
    assert _read_at(spark, path, 3)  # at the frontier: serves
    with pytest.raises(ValueError, match="above the store's absorbed"):
        _read_at(spark, path, 4)
    cell_store_stamp_frontier(path, 4)  # batch 4 absorbed, no changes
    assert _read_at(spark, path, 4) == _read_at(spark, path, 3)
    with pytest.raises(ValueError, match="above the store's absorbed"):
        _read_at(spark, path, 5)


def test_history_truncate_retires_snapshots_and_purges_bytes(
    spark, tmp_path
):
    from vector_search_question_answer_api_spark.sources.cell_store import (
        cell_store_truncate_history,
        cell_store_write_full,
    )

    path = str(tmp_path / "store")
    cell_store_write_full(
        _hist_rows(spark, {d: 0 for d in range(8)}), path, batch_id=0,
        history_keep=2,
    )
    cell_store_refresh(
        spark, path, _hist_rows(spark, {1: 9, 5: 9}), [1], batch_id=1
    )
    assert _read_at(spark, path, 0)[1] == (1, 0)  # history serves epoch 0
    old_snap_dirs = [
        os.path.join(path, g, "cell=1")
        for g in {
            s["cells"]["1"] for s in cell_store_manifest(path)["history"]
        }
    ]
    assert all(os.path.isdir(d) for d in old_snap_dirs)
    cell_store_truncate_history(path)
    man = cell_store_manifest(path)
    assert "history" not in man and man["history_keep"] == 2
    with pytest.raises(ValueError, match="retained horizon"):
        _read_at(spark, path, 0)
    assert _read_at(spark, path, 1)[1] == (1, 9)  # current still serves
    # the next write grace-deletes the snapshot-only partition dirs
    cell_store_refresh(
        spark, path, _hist_rows(spark, {2: 9, 6: 9}), [2], batch_id=2
    )
    assert not any(os.path.isdir(d) for d in old_snap_dirs)
    # and retention RESUMES (history_keep survived the truncation)
    assert [s["batch"] for s in cell_store_manifest(path)["history"]] == [1]


def test_history_survives_compact_and_drops_on_unstamped_refresh(
    spark, tmp_path
):
    from vector_search_question_answer_api_spark.sources.cell_store import (
        cell_store_compact,
        cell_store_write_full,
    )

    path = str(tmp_path / "store")
    cell_store_write_full(
        _hist_rows(spark, {d: 0 for d in range(8)}), path, batch_id=0,
        history_keep=2,
    )
    cell_store_refresh(
        spark, path, _hist_rows(spark, {1: 7, 5: 7}), [1], batch_id=1
    )
    before = _read_at(spark, path, 0)
    # compact rewrites the CURRENT mapping only; retained snapshots keep
    # serving their epochs bit-identically
    cell_store_compact(spark, path)
    assert _read_at(spark, path, 0) == before
    assert _read_at(spark, path, 1)[1] == (1, 7)
    # a stampless refresh drops stamps AND history — the store changed
    # at an unknown epoch, so every epoch claim is void
    cell_store_refresh(spark, path, _hist_rows(spark, {2: 8, 6: 8}), [2])
    man = cell_store_manifest(path)
    assert "batch" not in man and "history" not in man
    with pytest.raises(ValueError, match="not\\s+epoch-stamped"):
        open_cell_table(spark, path, up_to_batch=1)
