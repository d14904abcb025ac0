"""Deduplication operators — the LLM-training-pipeline extension family
(BASELINE.json north star; generalizes the reference's content-hash /
similarity machinery to corpus scale).

Five tiers, all engine-portable (md5-based hashing, see functions/hashing.py)
so the DuckDB oracle can replicate every bit:

- exact         — canonical-text fingerprint groupBy (hash agg, one shuffle)
- ngram-jaccard — exact set-similarity via shingle inverted index (join on
                  shingle, count co-occurrences) — never a cross join: only
                  pairs sharing >= 1 shingle are materialized
- minhash-LSH   — Broder '97: signature of seeded-md5 minima, banded; only
                  band-collisions become candidates, verified by true jaccard
- simhash       — Charikar '02: 64-bit sign fingerprint; near-pairs found by
                  segment banding (pigeonhole: hamming<=3 over 4 segments
                  forces >=1 identical 16-bit segment), verified by hamming
- embedding     — cosine near-dup pairs on the vector table (brute force here;
                  the ANN/LSH tier in operators/ann.py is the 100 TB path)

Scale notes: every operator shuffles on a derived key (fingerprint, shingle,
band key, segment) — linear data movement, no quadratic blowup.  Hot keys
(stopword shingles) are the skew risk for the inverted index; the
``max_doc_freq`` guard drops shingles occurring in more than a fraction of
docs (standard df-cut), which both de-skews and de-noises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.functions import hashing as H
from vector_search_question_answer_api_spark.functions import text as TXT
from vector_search_question_answer_api_spark.functions import vector as V


def canonical_docs(documents: DataFrame) -> DataFrame:
    """(doc_id, proc_text, fp): canonicalized text + md5 fingerprint."""
    return documents.select(
        "doc_id",
        TXT.preprocess_text(F.col("text")).alias("proc_text"),
    ).withColumn("fp", F.md5(F.col("proc_text")))


def dedup_exact_survivors(documents: DataFrame) -> DataFrame:
    """Exact dedup: keep the minimum doc_id per canonical-text fingerprint
    (deterministic survivor rule).  One hash-agg shuffle on fp."""
    c = canonical_docs(documents)
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fp")
    )


def shingle_sets(documents: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingles): DISTINCT k-word shingle set of canonical text.
    Docs with fewer than k tokens have empty sets and drop out."""
    c = canonical_docs(documents)
    return c.select(
        "doc_id",
        F.array_distinct(TXT.word_shingles(F.col("proc_text"), k)).alias("shingles"),
    ).filter(F.size("shingles") > 0)


def ngram_jaccard_pairs(
    documents: DataFrame,
    k: int = 3,
    threshold: float = 0.8,
    max_doc_freq: float | None = None,
) -> DataFrame:
    """Exact jaccard similarity pairs via a shingle inverted index.

    explode(shingles) -> self-join on shingle -> count co-occurring shingles
    per pair -> jaccard = inter / (|A| + |B| - inter).  Only pairs sharing a
    shingle are ever created; with a df-cut this is near-linear in corpus
    size for natural text.
    """
    sets = shingle_sets(documents, k).withColumn("set_size", F.size("shingles"))
    inv = sets.select(
        "doc_id", "set_size", F.explode("shingles").alias("shingle")
    )
    if max_doc_freq is not None:
        df_counts = inv.groupBy("shingle").agg(F.count("*").alias("df"))
        n_docs = sets.count()
        keep = df_counts.filter(F.col("df") <= max_doc_freq * n_docs)
        inv = inv.join(F.broadcast(keep.select("shingle")), "shingle")
    a = inv.select(
        F.col("doc_id").alias("doc_a"),
        F.col("set_size").alias("size_a"),
        "shingle",
    )
    b = inv.select(
        F.col("doc_id").alias("doc_b"),
        F.col("set_size").alias("size_b"),
        "shingle",
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count("*").alias("inter"))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
        )
    )
    return pairs.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


def minhash_signatures(
    documents: DataFrame, n_hashes: int = 16, k: int = 3
) -> DataFrame:
    """(doc_id, shingles, sig): MinHash signature per doc."""
    sets = shingle_sets(documents, k)
    return sets.withColumn(
        "sig", H.minhash_signature(F.col("shingles"), n_hashes)
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 4,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band-collision candidates verified with
    TRUE jaccard on the shingle sets, so the output is exact-above-threshold
    restricted to LSH candidates (standard LSH semantics; candidate recall
    governed by (bands, rows) — 4 bands x 4 rows catches j>=0.8 w.p. ~0.98).
    """
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(documents, n_hashes, k)
    banded = sigs.select(
        "doc_id",
        "shingles",
        F.explode(H.band_keys(F.col("sig"), n_bands, rows_per_band)).alias("band"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"), "band"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"), "band"
    )
    cand = (
        a.join(b, "band")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    verified = cand.withColumn(
        "jaccard", inter.cast("double") / union.cast("double")
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


def simhash_fingerprints(documents: DataFrame, n_bits: int = 64) -> DataFrame:
    """(doc_id, simhash): 64-bit sign fingerprint as a '0'/'1' string."""
    c = canonical_docs(documents)
    return c.select(
        "doc_id",
        H.simhash_bits(TXT.tokens(F.col("proc_text")), n_bits).alias("simhash"),
    )


def simhash_near_pairs(
    documents: DataFrame, max_hamming: int = 3, n_bits: int = 64, n_segments: int = 4
) -> DataFrame:
    """SimHash near-dup pairs with segment banding.

    Pigeonhole: two fingerprints within hamming distance ``max_hamming`` over
    ``n_segments`` segments (max_hamming < n_segments) must agree on at least
    one whole segment — so candidates are found by an equi-join on
    (segment_index, segment_bits) and verified by full hamming distance.
    Linear shuffle, no cross join.
    """
    seg_len = n_bits // n_segments
    fps = simhash_fingerprints(documents, n_bits)
    segmented = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{s}:"),
                        F.substring(F.col("simhash"), s * seg_len + 1, seg_len),
                    )
                    for s in range(n_segments)
                ]
            )
        ).alias("segment"),
    )
    a = segmented.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "segment"
    )
    b = segmented.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "segment"
    )
    cand = (
        a.join(b, "segment")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = H.hamming_distance_bits(F.col("sh_a"), F.col("sh_b"), n_bits)
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    min_sim: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-dup pairs on the vector table (brute-force tier — the
    exact oracle; use operators/ann.py buckets at scale)."""
    n = embeddings.select(
        F.col(id_col).alias("id"), V.l2_normalize(F.col(vec_col)).alias("nv")
    )
    a = n.select(F.col("id").alias("vec_a"), F.col("nv").alias("nv_a"))
    b = n.select(F.col("id").alias("vec_b"), F.col("nv").alias("nv_b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim", V.dot(F.col("nv_a"), F.col("nv_b")))
        .filter(F.col("sim") >= min_sim)
        .select("vec_a", "vec_b", "sim")
    )
