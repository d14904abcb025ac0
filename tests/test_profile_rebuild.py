"""Profile staleness bound (VERDICT r11 #5): the docs store, the resolved
document view, and the CMS/histogram/HLL rebuild cadence — post-rebuild
the merged profile equals the one-shot sketch over the RESOLVED corpus
(deleted and superseded content no longer counted), and between rebuilds
drift is bounded by the batches since."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators import sketches as SK
from vector_search_question_answer_api_spark.sources.tables import load_table
from vector_search_question_answer_api_spark.streaming import (
    ingest_stream as IG,
    stats_stream as STS,
)

SF = "/root/testdata/sf0.001"
DEPTH, WIDTH, NBINS = 3, 256, 32


@pytest.fixture(scope="module")
def churned(spark, tmp_path_factory):
    """Composed ingest with docs_store + profile_rebuild_every=2 over four
    batches: initial docs, more docs, an upsert wave (changed text), and a
    deletion — the churn the sketches cannot subtract."""
    tmp = tmp_path_factory.mktemp("prof_rebuild")
    docs = (
        load_table(spark, SF, "documents")
        .filter("doc_id < 30")
        .select(
            "doc_id",
            F.timestamp_millis(F.col("doc_id") * 1000).alias("ts"),
            "text",
            "n_chars",
            F.lit(False).alias("_delete"),
        )
    )
    b0 = docs.filter("doc_id < 15")
    b1 = docs.filter("doc_id >= 15")
    b2 = (
        docs.filter("doc_id < 5")
        .withColumn("text", F.concat(F.lit("rewritten entirely "), "text"))
        .withColumn("n_chars", F.length("text"))
        .withColumn("ts", F.timestamp_millis(F.lit(10_000_000)))
    )
    b3 = (
        docs.filter("doc_id = 9")
        .withColumn("_delete", F.lit(True))
        .withColumn("ts", F.timestamp_millis(F.lit(20_000_000)))
    )
    for i, b in enumerate((b0, b1, b2, b3)):
        b.coalesce(1).write.parquet(f"{tmp}/src/b{i}")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/src/*")
    )
    q = IG.maintain_corpus(
        stream,
        str(tmp / "corpus"),
        checkpoint=str(tmp / "ckpt"),
        dim=64,
        trigger_once=True,
        cms_depth=DEPTH,
        cms_width=WIDTH,
        n_bins=NBINS,
        docs_store=True,
        profile_rebuild_every=2,
    )
    assert q.awaitTermination(300), "ingest stream did not finish"
    # the final resolved corpus: 29 docs (30 - deleted 9), 0-4 rewritten
    final = (
        b2.unionByName(docs.filter("doc_id >= 5 AND doc_id != 9"))
        .select("doc_id", "ts", "text", "n_chars")
    )
    return str(tmp / "corpus"), final


def test_docs_store_resolves_latest_live_version(spark, churned):
    root, final = churned
    got = {
        (int(r["doc_id"]), r["text"])
        for r in IG.read_corpus_docs(spark, root).collect()
    }
    want = {(int(r["doc_id"]), r["text"]) for r in final.collect()}
    assert got == want and len(got) == 29
    # before_batch bounds the evidence: as of batch 2, no rewrite yet and
    # doc 9 still alive
    asof = {
        (int(r["doc_id"]), r["text"])
        for r in IG.read_corpus_docs(spark, root, before_batch=2).collect()
    }
    assert len(asof) == 30
    assert all(not t.startswith("rewritten") for _, t in asof)


def _cms_rel(df):
    return {
        (int(r["sketch_row"]), int(r["bucket"]), int(r["cnt"]))
        for r in df.collect()
    }


def _hist_rel(df):
    return {(int(r["bin"]), int(r["cnt"])) for r in df.collect()}


def test_in_stream_rebuild_bounds_staleness(spark, churned):
    """The cadence fired at batch 2: the merged profile equals one-shot
    (resolved corpus as of batch 2) + the per-batch sketches SINCE — drift
    is the post-rebuild churn only, not the store's lifetime."""
    root, _ = churned
    prof = os.path.join(root, "profile")
    m = STS._prof_manifest(prof)
    assert m is not None and m["covered_up_to"] == 2
    base = IG.read_corpus_docs(spark, root, before_batch=2)
    want_hist_total = base.count()  # 30 docs as of batch 2
    # batches 2 (5 rewrites) and 3 (1 deletion marker = 1 doc row with no
    # text... the deletion batch carries no upsert rows)
    got_total = (
        STS.read_profile_hist(spark, prof).agg(F.sum("cnt")).first()[0]
    )
    # hist counts each sketched row once: 30 (rebuilt base) + 5 (batch 2)
    assert int(got_total) == want_hist_total + 5
    # the merged CMS equals base one-shot + live batch sketches, summed
    toks = SK.token_stream(base)
    base_cms = SK.cms_sketch(toks, depth=DEPTH, width=WIDTH)
    live = (
        spark.read.parquet(os.path.join(prof, "cms"))
        .filter(F.col("batch") >= 2)
        .drop("batch")
    )
    want = _cms_rel(
        base_cms.unionByName(live)
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = _cms_rel(STS.read_profile_cms(spark, prof))
    assert got == want


def test_final_rebuild_equals_one_shot_over_resolved_corpus(
    spark, churned, tmp_path
):
    """The done-criterion: after a rebuild covering every batch, the
    merged profile is BIT-IDENTICAL to the one-shot sketch over the
    resolved corpus — deleted doc 9 and the pre-rewrite versions of docs
    0-4 are no longer counted anywhere."""
    root, final = churned
    prof = os.path.join(root, "profile")
    resolved = IG.read_corpus_docs(spark, root)
    STS.rebuild_profile(
        spark, prof, resolved, covered_up_to=100,
        depth=DEPTH, width=WIDTH, n_bins=NBINS,
    )
    toks = SK.token_stream(resolved)
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == _cms_rel(
        SK.cms_sketch(toks, depth=DEPTH, width=WIDTH)
    )
    assert _hist_rel(STS.read_profile_hist(spark, prof)) == _hist_rel(
        SK.histogram_sketch(resolved, "n_chars", 0.0, 4096.0, NBINS)
    )
    got_hll = SK.hll_estimate(STS.read_profile_hll(spark, prof))
    want_hll = SK.hll_estimate(SK.hll_sketch(toks, "token"))
    assert abs(got_hll - want_hll) < 1e-9
    # deleted content really gone: total histogram mass = live docs
    total = STS.read_profile_hist(spark, prof).agg(F.sum("cnt")).first()[0]
    assert int(total) == 29
    # vecmean is untouched by rebuilds: the maintained center still equals
    # the resolved-corpus mean exactly
    from vector_search_question_answer_api_spark.operators.ann import (
        corpus_center,
    )

    center = STS.read_profile_center(spark, prof)
    want_center = corpus_center(IG.read_corpus_index(spark, root))
    assert len(center) == len(want_center) == 64
    assert max(abs(a - b) for a, b in zip(center, want_center)) < 1e-9

    # REPLAY idempotence: a second rebuild with the same coverage writes a
    # new generation with identical reads; the first's retired paths are
    # swept by the next cycle
    before = _cms_rel(STS.read_profile_cms(spark, prof))
    STS.rebuild_profile(
        spark, prof, resolved, covered_up_to=100,
        depth=DEPTH, width=WIDTH, n_bins=NBINS,
    )
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == before
    # crash window: a rebuild that died before its manifest publish left
    # an orphan generation — reads unaffected, next rebuild sweeps it
    orphan = os.path.join(prof, ".prof-gen-000917")
    os.makedirs(orphan, exist_ok=True)
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == before
    STS.rebuild_profile(
        spark, prof, resolved, covered_up_to=100,
        depth=DEPTH, width=WIDTH, n_bins=NBINS,
    )
    assert not os.path.exists(orphan)
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == before


def test_rebuild_requires_docs_store(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    with pytest.raises(ValueError, match="requires[\\s\\S]*docs_store"):
        IG.maintain_corpus(
            spark.readStream.schema(
                "doc_id long, ts timestamp, text string, n_chars long"
            ).parquet(str(src)),
            str(tmp_path / "c"),
            checkpoint=str(tmp_path / "k"),
            profile_rebuild_every=2,
        )


def test_recommended_profile_rebuild_every_delegates_and_caps():
    """r13 (VERDICT r12 What's missing #3): the profile cadence rule is
    the same sqrt(2C/(r*m)) model as the signature/postings stores —
    pinned by delegation equality, plus the degenerate caps.  The
    corpus-sized-C economics live in the measured curve
    (measurements/r13_profile_rebuild_curve.json): C grows with corpus,
    so N* must be re-derived as ingest accumulates."""
    from vector_search_question_answer_api_spark.operators.ann import (
        recommended_lsh_compaction_every,
    )
    from vector_search_question_answer_api_spark.streaming.stats_stream import (
        recommended_profile_rebuild_every,
    )

    for args in ((1, 2.0, 0.01), (0.1, 5.0, 0.002), (10, 0.5, 0.05)):
        assert recommended_profile_rebuild_every(
            *args
        ) == recommended_lsh_compaction_every(*args)
    # corpus growth pushes the cadence out ~sqrt(C): C x4 -> N* x2
    n1 = recommended_profile_rebuild_every(1, 2.0, 0.01)
    n4 = recommended_profile_rebuild_every(1, 8.0, 0.01)
    assert abs(n4 - 2 * n1) <= 1
    # nothing reads the premium -> rebuild rarely (staleness knob only)
    assert recommended_profile_rebuild_every(0, 2.0, 0.01) == 256
    # free rebuild -> every batch
    assert recommended_profile_rebuild_every(1, 0.0, 0.01) == 1


# ---------------------------------------------------------------------------
# r14 — partition-sharded rebuild (VERDICT r13 missing #2): the rebuild
# cost scales with CHURNED shards, pinned bit-identical to the one-shot
# profile; read-side batch cutoff keyed off the shard stores' own epoch
# stamps so partial-crash states double-count nothing.

N_SHARDS = 8


@pytest.fixture(scope="module")
def churned_sharded(spark, tmp_path_factory):
    """The ``churned`` batch script with ``profile_shards=8``: the
    in-stream rebuild at batch 2 lands as a FULL sharded build (no prior
    manifest -> no churn evidence); the incremental path is hand-driven
    in the tests for deterministic control."""
    tmp = tmp_path_factory.mktemp("prof_sharded")
    docs = (
        load_table(spark, SF, "documents")
        .filter("doc_id < 30")
        .select(
            "doc_id",
            F.timestamp_millis(F.col("doc_id") * 1000).alias("ts"),
            "text",
            "n_chars",
            F.lit(False).alias("_delete"),
        )
    )
    b0 = docs.filter("doc_id < 15")
    b1 = docs.filter("doc_id >= 15")
    b2 = (
        docs.filter("doc_id < 5")
        .withColumn("text", F.concat(F.lit("rewritten entirely "), "text"))
        .withColumn("n_chars", F.length("text"))
        .withColumn("ts", F.timestamp_millis(F.lit(10_000_000)))
    )
    b3 = (
        docs.filter("doc_id = 9")
        .withColumn("_delete", F.lit(True))
        .withColumn("ts", F.timestamp_millis(F.lit(20_000_000)))
    )
    for i, b in enumerate((b0, b1, b2, b3)):
        b.coalesce(1).write.parquet(f"{tmp}/src/b{i}")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/src/*")
    )
    q = IG.maintain_corpus(
        stream,
        str(tmp / "corpus"),
        checkpoint=str(tmp / "ckpt"),
        dim=64,
        trigger_once=True,
        cms_depth=DEPTH,
        cms_width=WIDTH,
        n_bins=NBINS,
        docs_store=True,
        profile_rebuild_every=2,
        profile_shards=N_SHARDS,
    )
    assert q.awaitTermination(300), "ingest stream did not finish"
    return str(tmp / "corpus")


def test_sharded_stream_rebuild_matches_unsharded_semantics(
    spark, churned_sharded
):
    """The in-stream sharded rebuild reproduces the unsharded read
    semantics exactly: merged profile == one-shot over the resolved
    corpus as of the rebuild + the per-batch sketches since."""
    root = churned_sharded
    prof = os.path.join(root, "profile")
    m = STS._prof_manifest(prof)
    assert m is not None and m["covered_up_to"] == 2
    assert m["sharded"] == N_SHARDS and m["gen"] is None
    base = IG.read_corpus_docs(spark, root, before_batch=2)
    toks = SK.token_stream(base)
    base_cms = SK.cms_sketch(toks, depth=DEPTH, width=WIDTH)
    live = (
        spark.read.parquet(os.path.join(prof, "cms"))
        .filter(F.col("batch") >= 2)
        .drop("batch")
    )
    want = _cms_rel(
        base_cms.unionByName(live)
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == want
    total = STS.read_profile_hist(spark, prof).agg(F.sum("cnt")).first()[0]
    assert int(total) == 30 + 5  # 30 docs at the rebuild + batch-2 rewrites


def test_sharded_incremental_rebuild_touches_only_churned_shards(
    spark, churned_sharded
):
    """The done-criterion: an incremental rebuild re-sketches ONLY the
    churned shards (cell-store generations prove it) and the merged
    profile is BIT-IDENTICAL to the one-shot over the resolved corpus;
    HLL estimate equal; a no-churn rebuild just advances the cutoff; the
    read cutoff survives a stale profile manifest (the partial-crash
    double-count guard)."""
    import json

    from vector_search_question_answer_api_spark.sources.cell_store import (
        cell_store_manifest,
    )

    root = churned_sharded
    prof = os.path.join(root, "profile")
    cms_store = os.path.join(prof, STS._SHARDS_DIR, "cms")
    before_gens = dict(cell_store_manifest(cms_store)["cells"])
    resolved = IG.read_corpus_docs(spark, root)
    prev = STS.profile_covered_up_to(prof)
    assert prev == 2
    churned = (
        IG._docs_frame(spark, os.path.join(root, "docs"))
        .filter((F.col("batch") >= prev) & (F.col("batch") < 4))
        .select("doc_id")
        .distinct()
    )
    churned_shards = {
        int(r["shard"])
        for r in churned.select(
            STS.profile_shard_expr(N_SHARDS).alias("shard")
        )
        .distinct()
        .collect()
    }
    assert 0 < len(churned_shards) < N_SHARDS  # 6 churned ids, 8 shards
    STS.rebuild_profile(
        spark, prof, resolved, covered_up_to=100,
        depth=DEPTH, width=WIDTH, n_bins=NBINS,
        n_shards=N_SHARDS, churned_ids=churned,
    )
    after = cell_store_manifest(cms_store)
    # untouched shards keep their original generation dirs — the work
    # scaled with churn, not the corpus
    for cell, gen in after["cells"].items():
        if int(cell) in churned_shards:
            assert gen != before_gens.get(cell), f"shard {cell} not rebuilt"
        else:
            assert gen == before_gens[cell], f"clean shard {cell} rewritten"
    assert int(after["batch"]) == 100
    # bit-identical to the one-shot over the resolved corpus
    toks = SK.token_stream(resolved)
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == _cms_rel(
        SK.cms_sketch(toks, depth=DEPTH, width=WIDTH)
    )
    assert _hist_rel(STS.read_profile_hist(spark, prof)) == _hist_rel(
        SK.histogram_sketch(resolved, "n_chars", 0.0, 4096.0, NBINS)
    )
    assert SK.hll_estimate(STS.read_profile_hll(spark, prof)) == (
        SK.hll_estimate(SK.hll_sketch(toks, "token"))
    )
    total = STS.read_profile_hist(spark, prof).agg(F.sum("cnt")).first()[0]
    assert int(total) == 29  # deleted doc 9 gone from the profile

    # the double-count guard: regress the PROFILE manifest's covered
    # bound (the state a crash between store refresh and manifest publish
    # leaves) — reads stay exact because the cutoff is the STORE stamp
    mpath = os.path.join(prof, STS._PROF_MANIFEST)
    m = json.load(open(mpath))
    stale = dict(m, covered_up_to=2)
    with open(mpath, "w", encoding="utf-8") as f:
        json.dump(stale, f)
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == _cms_rel(
        SK.cms_sketch(toks, depth=DEPTH, width=WIDTH)
    )
    with open(mpath, "w", encoding="utf-8") as f:
        json.dump(m, f)

    # no-churn rebuild: frontier advances, content untouched
    empty = churned.limit(0)
    before_rel = _cms_rel(STS.read_profile_cms(spark, prof))
    STS.rebuild_profile(
        spark, prof, resolved, covered_up_to=200,
        depth=DEPTH, width=WIDTH, n_bins=NBINS,
        n_shards=N_SHARDS, churned_ids=empty,
    )
    sman = cell_store_manifest(cms_store)
    assert int(sman["frontier"]) == 200 and int(sman["batch"]) == 100
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == before_rel

    # churn evidence withheld (the purge-horizon fallback shape): every
    # shard rebuilds — the honest full pass, same bit-identical result
    STS.rebuild_profile(
        spark, prof, resolved, covered_up_to=300,
        depth=DEPTH, width=WIDTH, n_bins=NBINS,
        n_shards=N_SHARDS, churned_ids=None,
    )
    sman2 = cell_store_manifest(cms_store)
    assert int(sman2["batch"]) == 300
    assert set(sman2["cells"].values()) != set(sman["cells"].values())
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == before_rel


def test_unsharded_rebuild_retires_stale_shard_bases(
    spark, churned_sharded
):
    """r15 (ADVICE r14): switching a sharded profile back to UNSHARDED
    must retire the ``.prof-shards`` subtree — before this, the stale
    shard cell stores sat on disk indefinitely (a disk leak only: reads
    key off the manifest's ``sharded`` flag, so results were never
    wrong).  Pins: the unsharded rebuild lists the subtree in RETIRED
    (one grace cycle, the store protocol), reads are exact immediately,
    and the NEXT rebuild's housekeeping physically drops it."""
    root = churned_sharded
    prof = os.path.join(root, "profile")
    shards_root = os.path.join(prof, STS._SHARDS_DIR)
    assert os.path.isdir(shards_root), "fixture should start sharded"
    resolved = IG.read_corpus_docs(spark, root)
    STS.rebuild_profile(
        spark, prof, resolved, covered_up_to=400,
        depth=DEPTH, width=WIDTH, n_bins=NBINS,  # n_shards=0: unsharded
    )
    m = STS._prof_manifest(prof)
    assert m is not None and not m.get("sharded")
    # grace cycle: still on disk, but on the RETIRED list
    assert os.path.isdir(shards_root)
    from vector_search_question_answer_api_spark.sources.generation_store import (
        GenerationStore,
    )

    store = GenerationStore(
        prof, STS._PROF_MANIFEST, STS._PROF_RETIRED, ".prof-gen-"
    )
    assert os.path.realpath(shards_root) in store.retired()
    # reads exact right away (unsharded base over the resolved corpus)
    toks = SK.token_stream(resolved)
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == _cms_rel(
        SK.cms_sketch(toks, depth=DEPTH, width=WIDTH)
    )
    # the next rebuild's housekeeping sweeps the retired subtree
    STS.rebuild_profile(
        spark, prof, resolved, covered_up_to=500,
        depth=DEPTH, width=WIDTH, n_bins=NBINS,
    )
    assert not os.path.exists(shards_root)
    assert _cms_rel(STS.read_profile_cms(spark, prof)) == _cms_rel(
        SK.cms_sketch(toks, depth=DEPTH, width=WIDTH)
    )
