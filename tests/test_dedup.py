"""Dedup family tests (SURVEY.md §7 step 8; BASELINE.json north star)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.functions import hashing as H
from vector_search_question_answer_api_spark.operators.dedup import (
    canonical_docs,
    dedup_exact_survivors,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from vector_search_question_answer_api_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").cache()
    yield d
    # Unpersist at module teardown: the shared session's CacheManager
    # matches by LOGICAL PLAN, so a leaked cache of the raw documents
    # scan silently substitutes an InMemoryRelation into every later
    # load_table("documents") query — killing filter pushdown and column
    # pruning in the plan-audit tests (found as an order-dependent flake).
    d.unpersist()


def test_exact_survivors_count(spark, docs):
    survivors = dedup_exact_survivors(docs)
    n_fp = canonical_docs(docs).select("fp").distinct().count()
    assert survivors.count() == n_fp
    # survivor is the min doc_id of its group
    joined = survivors.alias("s").join(
        canonical_docs(docs).alias("c"), "fp"
    ).groupBy("s.doc_id", "fp").agg(F.min("c.doc_id").alias("min_id"))
    bad = joined.filter(F.col("doc_id") != F.col("min_id"))
    assert bad.count() == 0


def test_minhash_pairs_subset_of_exact_jaccard(docs):
    """LSH candidates verified at t are a subset of the exact >= t relation
    (LSH can miss, never invent)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert lsh <= exact
    # and on planted near-dups (j ~ 0.99) recall should be total
    assert len(lsh) > 0
    assert len(lsh) >= int(0.9 * len(exact))


def test_ngram_jaccard_bounds(docs):
    rows = ngram_jaccard_pairs(docs, threshold=0.8).collect()
    for r in rows:
        assert 0.8 <= r["jaccard"] <= 1.0
        assert r["doc_a"] < r["doc_b"]


def test_simhash_banding_is_lossless(spark, docs):
    """Pigeonhole: segment banding at hamming<=3 over 4 segments finds
    exactly the brute-force hamming<=3 relation."""
    sample = docs.filter(F.col("doc_id") < 150)
    via_op = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(sample, max_hamming=3).collect()
    }
    fps = simhash_fingerprints(sample)
    a = fps.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = fps.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", H.hamming_distance_bits(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= 3)
    )
    via_brute = {
        (r["doc_a"], r["doc_b"], r["hamming"]) for r in brute.collect()
    }
    assert via_op == via_brute


def test_simhash_arrow_equals_relational(docs):
    """The Arrow map-side fingerprint and the relational vote pipeline
    must be bit-identical (same md5 -> vote -> sign semantics)."""
    sample = docs.filter(F.col("doc_id") < 150)
    arrow = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(sample, strategy="arrow").collect()
    }
    rel = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(sample, strategy="relational").collect()
    }
    assert arrow == rel


def test_simhash_deterministic(docs):
    sample = docs.filter(F.col("doc_id") < 50)
    a = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(sample).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(sample).collect()}
    assert a == b
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in a.values())


def test_embedding_near_dups(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(e, min_sim=0.45).collect()
    assert all(r["sim"] >= 0.45 and r["vec_a"] < r["vec_b"] for r in pairs)


def test_dup_clusters_transitive_closure(spark):
    """Chain a-b-c-d-e needs multi-round propagation; triangle and isolated
    pair close in one; cluster_id = min member; sizes correct."""
    from vector_search_question_answer_api_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        # chain 10-11-12-13-14, triangle 20-21-22, pair 30-31
        [(10, 11), (11, 12), (12, 13), (13, 14),
         (20, 21), (21, 22), (20, 22),
         (30, 31)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dup_clusters(pairs).collect()
    }
    assert got == {
        10: (10, 5), 11: (10, 5), 12: (10, 5), 13: (10, 5), 14: (10, 5),
        20: (20, 3), 21: (20, 3), 22: (20, 3),
        30: (30, 2), 31: (30, 2),
    }


def test_dup_clusters_on_corpus_pairs(spark, docs):
    """Every clustered doc appears in some pair; cluster_id is a member of
    the cluster and is its minimum; components are edge-consistent (both
    endpoints of every pair share a cluster)."""
    from vector_search_question_answer_api_spark.operators.dedup import (
        dup_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.8).persist()
    clusters = dup_clusters(pairs).persist()
    lbl = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    for r in pairs.collect():
        assert lbl[r["doc_a"]] == lbl[r["doc_b"]]
    for doc, cid in lbl.items():
        assert cid <= doc and cid in lbl
    pairs.unpersist()
    clusters.unpersist()


def test_embedding_near_dup_lsh_route_matches_broadcast(spark):
    """The auto-routed LSH tier must emit the same relation as the exact
    broadcast tier on the sf0.01 corpus (VERDICT r1 next-round #3)."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")

    def rel(strategy):
        return {
            (r["vec_a"], r["vec_b"], round(r["sim"], 9))
            for r in embedding_near_dup_pairs(emb, strategy=strategy).collect()
        }

    assert rel("lsh") == rel("broadcast")


def test_embedding_near_dup_auto_routes_above_cap(spark, sf_dir):
    """Above the broadcast cap the operator must pick the LSH plan — no
    driver-side collect of the vector table in the physical plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    routed = embedding_near_dup_pairs(emb, max_broadcast_rows=10)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower()
    assert routed.count() >= 0  # executes without collecting vectors


def test_dup_clusters_strategies_agree(spark, docs):
    """Driver union-find and distributed label propagation must emit the
    identical clustering over the corpus pair graph."""
    from vector_search_question_answer_api_spark.operators.dedup import dup_clusters

    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.8).persist()
    try:
        def rel(strategy):
            return {
                (r["doc_id"], r["cluster_id"], r["cluster_size"])
                for r in dup_clusters(pairs, strategy=strategy).collect()
            }

        assert rel("driver") == rel("distributed")
    finally:
        pairs.unpersist()


def test_winnow_overlap_catches_copied_passage(spark):
    """A long copied passage inside otherwise-different docs must produce a
    high overlap pair even though global shingle jaccard is low."""
    from vector_search_question_answer_api_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    passage = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz in the dusty courtyard of the old station"
    )
    filler_a = "completely unrelated opening about maritime navigation charts"
    filler_b = "finance report discussing quarterly revenue and cost centers"
    docs = spark.createDataFrame(
        [
            (0, f"{filler_a} {passage}"),
            (1, f"{filler_b} {passage} plus an extra closing line"),
            (2, "nothing shared with the others in any fragment at all here"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["overlap"]
        for r in winnow_overlap_pairs(docs, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.3
    assert not any(2 in p for p in pairs)
    # but 3-gram jaccard stays below the usual 0.8 dedup threshold
    jac = ngram_jaccard_pairs(docs, k=3, threshold=0.8).collect()
    assert jac == []


def test_ngram_jaccard_prefix_strategy_equivalent(spark):
    """PPJoin prefix filtering must emit the IDENTICAL exact relation as
    the full inverted index, on sf0.001 documents and on a crafted corpus
    with hot shingles (where pruning actually bites)."""
    from vector_search_question_answer_api_spark.operators.dedup import (
        ngram_jaccard_pairs,
        unpersist_all,
    )
    from vector_search_question_answer_api_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.8).collect()
    }
    pref = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(
            docs, k=3, threshold=0.8, strategy="prefix"
        ).collect()
    }
    unpersist_all()
    assert full == pref and len(full) > 0

    crafted = spark.createDataFrame(
        [
            (0, "common filler words everywhere alpha beta gamma delta"),
            (1, "common filler words everywhere alpha beta gamma delta"),
            (2, "common filler words everywhere alpha beta gamma epsilon"),
            (3, "common filler words everywhere zeta eta theta iota"),
            (4, "totally different content with no overlap at all here"),
        ],
        ["doc_id", "text"],
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
    for t in (0.5, 0.8, 0.95):
        f2 = {
            (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
            for r in ngram_jaccard_pairs(crafted, k=3, threshold=t).collect()
        }
        p2 = {
            (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
            for r in ngram_jaccard_pairs(
                crafted, k=3, threshold=t, strategy="prefix"
            ).collect()
        }
        unpersist_all()
        assert f2 == p2, f"threshold {t}: {f2} != {p2}"
    assert (0, 1) in f2  # identical docs pair present at every threshold


def test_embedding_near_dup_clustered_tier(spark):
    """SemDeDup-shaped cell-scoped tier: on tight-cluster geometry with
    trained centroids, the within-cell comparison recovers the EXACT
    relation (every near-dup pair shares a probed cell), and by
    construction can never emit a false pair."""
    import numpy as np

    from vector_search_question_answer_api_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_clustered,
    )
    from vector_search_question_answer_api_spark.operators.ivf import train_centroids

    rng = np.random.RandomState(11)
    cents = rng.standard_normal((10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    pts = cents[np.arange(400) % 10] + 0.03 * rng.standard_normal((400, 64))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(400)],
        "vec_id long, embedding array<double>",
    ).cache()

    def rel(df):
        return {
            (r["vec_a"], r["vec_b"], round(r["sim"], 9)) for r in df.collect()
        }

    exact = rel(embedding_near_dup_pairs(emb, min_sim=0.9, strategy="broadcast"))
    assert exact, "fixture must produce near-dup pairs"
    normed = emb.select(
        "vec_id",
        F.col("embedding").alias("norm_embedding"),
    )
    trained = train_centroids(normed, dim=64, n_cells=16, n_iters=4)
    got = rel(
        embedding_near_dup_pairs_clustered(
            emb, min_sim=0.9, n_cells=16, centroids=trained, multi_probe=2
        )
    )
    assert got == exact


def test_embedding_near_dup_clustered_subset_on_uniform(spark, sf_dir):
    """With the data-independent grid quantizer on the near-uniform driver
    corpus, the cell-scoped tier must emit a SUBSET of the exact relation
    with bit-matching sims (false pairs are impossible; recall is the
    geometry-dependent axis)."""
    from vector_search_question_answer_api_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_clustered,
    )

    emb = load_table(spark, sf_dir, "embeddings")

    def rel(df):
        return {
            (r["vec_a"], r["vec_b"], round(r["sim"], 9)) for r in df.collect()
        }

    exact = rel(embedding_near_dup_pairs(emb, min_sim=0.45, strategy="broadcast"))
    got = rel(
        embedding_near_dup_pairs_clustered(
            emb, min_sim=0.45, n_cells=8, multi_probe=4
        )
    )
    assert got <= exact
    assert len(got) >= 0.5 * len(exact), (len(got), len(exact))


def test_embedding_near_dup_clustered_cell_cap(spark):
    """A cell bigger than max_cell_rows must fail loudly with the sizing
    hint, not OOM the executor."""
    from vector_search_question_answer_api_spark.operators.dedup import (
        embedding_near_dup_pairs_clustered,
    )

    emb = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(50)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="max_cell_rows"):
        embedding_near_dup_pairs_clustered(
            emb, min_sim=0.99, n_cells=4, max_cell_rows=10
        ).collect()


def test_embedding_near_dup_lsh_signature_params_pass_through(spark):
    """r5: (n_planes, n_tables) reach the signature kernel.  At the sf0.01
    near-dup band (min_sim=0.45, the gate's threshold — angle ~63 deg) the
    8x8 DEFAULT signature recalls only ~20% of pairs (p_band = 0.648^8),
    while 1 plane x 64 tables recalls ~100% (miss 0.35^64).  Equality with
    the exact relation at 1x64 therefore PROVES the parameters take
    effect; any configuration must stay a subset (never a false pair)."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"], round(r["sim"], 9))
        for r in embedding_near_dup_pairs(
            emb, min_sim=0.45, strategy="broadcast"
        ).collect()
    }
    assert len(exact) == 14  # the gate's band — non-trivial by design
    wide = {
        (r["vec_a"], r["vec_b"], round(r["sim"], 9))
        for r in embedding_near_dup_pairs(
            emb, min_sim=0.45, strategy="lsh", n_planes=1, n_tables=64
        ).collect()
    }
    assert wide == exact
    narrow = {
        (r["vec_a"], r["vec_b"], round(r["sim"], 9))
        for r in embedding_near_dup_pairs(
            emb, min_sim=0.45, strategy="lsh", n_planes=16, n_tables=8
        ).collect()
    }
    assert narrow <= exact
    assert len(narrow) < len(exact)  # 16-plane bands cannot span 63 deg


def test_recommended_lsh_params_hold_recall_on_realistic_fixture(spark):
    """Empirical pin of ``ann.recommended_lsh_params`` (the joint
    planes/tables sizing rule): at the prescription for (n=2000,
    min_sim=0.99) the LSH near-dup tier must recover >=0.9 of the exact
    broadcast pairs on the frozen realistic-geometry 384-dim fixture —
    whose 10% near-dup tail at cos>0.99 is exactly the population the
    rule's 0.95-recall target is about.  Deterministic end to end: frozen
    fixture + md5-seeded hyperplanes."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from vector_search_question_answer_api_spark.operators.ann import (
        recommended_lsh_params,
    )

    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures",
        "realistic_embeddings_384.parquet",
    )
    t = pq.read_table(fixture)
    pts = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )

    def rel(df):
        return {(r["vec_a"], r["vec_b"]) for r in df.collect()}

    exact = rel(embedding_near_dup_pairs(emb, min_sim=0.99, strategy="broadcast"))
    assert len(exact) >= 100  # the fixture's planted near-dup tail

    planes, tables = recommended_lsh_params(2000, min_sim=0.99)
    approx = rel(
        embedding_near_dup_pairs(
            emb, min_sim=0.99, strategy="lsh", n_planes=planes, n_tables=tables
        )
    )
    # the LSH tier re-ranks candidates exactly, so it can only MISS pairs
    assert approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, (planes, tables, recall)


def test_auto_route_warning_is_honest_about_table_cap(spark, sf_dir):
    """ADVICE r9: when recommended_lsh_params hits its table cap the ~0.95
    recall contract is NOT met — the auto-route warning must say so and
    steer to the clustered tier, not quote an unmet promise.  Below the
    cap it quotes the prescription as before."""
    import warnings

    emb = load_table(spark, sf_dir, "embeddings")
    # min_sim=0.5 drives the fixed point to the 64-table cap (the
    # advice used 0.8 at corpus scale; the small test corpus needs a lower threshold)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        embedding_near_dup_pairs(emb, min_sim=0.5, max_broadcast_rows=10).count()
    msgs = [str(x.message) for x in w if "auto-routing" in str(x.message)]
    assert msgs and "NOT met" in msgs[0] and "clustered" in msgs[0].lower()
    assert "for ~0.95 recall" not in msgs[0]

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        embedding_near_dup_pairs(
            emb, min_sim=0.95, max_broadcast_rows=10
        ).count()
    msgs = [str(x.message) for x in w if "auto-routing" in str(x.message)]
    assert msgs and "for ~0.95 recall" in msgs[0] and "NOT met" not in msgs[0]


def test_embedding_near_dup_artifact_param(spark, tmp_path):
    """One persisted signature manifest parameterizes the batch near-dup
    tier exactly like the streaming/replay/serving consumers: pairs equal
    the hand-threaded centered lsh call."""
    import numpy as np

    from vector_search_question_answer_api_spark.functions import vector as V
    from vector_search_question_answer_api_spark.operators import ann
    from vector_search_question_answer_api_spark.operators.dedup import (
        unpersist_all,
    )

    rng = np.random.default_rng(9)
    cents = rng.normal(size=(4, 16))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    base = cents[np.arange(100) % 4] + 0.15 * rng.normal(size=(100, 16))
    dups = base[:15] + 0.01 * rng.normal(size=(15, 16))
    pts = np.vstack([base, dups])
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    normed = emb.select(
        "vec_id", V.l2_normalize(F.col("embedding")).alias("nv")
    )
    center = ann.corpus_center(normed, "nv")
    path = str(tmp_path / "art")
    ann.write_lsh_artifact(path, dim=16, n_planes=6, n_tables=4, center=center)

    def rel(**kw):
        out = {
            (r["vec_a"], r["vec_b"], round(r["sim"], 9))
            for r in embedding_near_dup_pairs(emb, min_sim=0.95, **kw).collect()
        }
        unpersist_all()
        return out

    manual = rel(strategy="lsh", n_planes=6, n_tables=4, center=center)
    via_art = rel(artifact=path)
    assert manual and via_art == manual


def test_embedding_near_dup_artifact_conflicts_and_dim(spark, tmp_path):
    """ADVICE r10: artifact= is the single source of signature truth —
    combining it with explicit knobs raises (a stray n_planes silently
    hashing batch buckets differently from the stream/serving consumers
    is the divergence the manifest exists to prevent), and the manifest's
    dim is authoritative (vectors of another width raise via the kernel
    width check even when the manifest is uncentered)."""
    from vector_search_question_answer_api_spark.operators import ann

    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(16)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "art")
    # uncentered manifest: center=None would previously skip ALL width checks
    ann.write_lsh_artifact(path, dim=16, n_planes=6, n_tables=4, center=None)
    with pytest.raises(ValueError, match="EITHER artifact"):
        embedding_near_dup_pairs(emb, artifact=path, n_planes=8)
    with pytest.raises(ValueError, match="EITHER artifact"):
        embedding_near_dup_pairs(emb, artifact=path, center=(0.0,) * 16)
    # width mismatch: 8-wide vectors against a dim=16 manifest
    narrow = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="components for dim"):
        embedding_near_dup_pairs(narrow, artifact=path).collect()
