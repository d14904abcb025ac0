"""Keyword (BM25) search and hybrid keyword+vector rank fusion.

Engine extension: the reference is a pure vector-search QA API
(services/index_service.py:39-52 builds only an embedding index), but any
production retrieval stack pairs the dense index with a sparse/keyword
tier and fuses the two rankings — this module adds that tier Spark-first.

BM25 here is the standard Robertson/Sparck-Jones form with the Lucene
idf smoothing: ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``, and the
per-term contribution ``idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b *
dl / avgdl))``.  Query terms are DISTINCT (multiplicity in the query
does not re-weight, matching Lucene's default).

Scale shape (100 TB):
- The postings list (term, doc_id, tf) IS the inverted index — built by
  one explode + hash aggregation, shuffled on term.  At scale it would be
  written out bucketed by term; here it stays a lazy relation.
- Corpus stats (N, avgdl) are a one-row aggregate cross-joined in —
  never a driver collect.
- Per-query term sets are tiny; they broadcast to the postings join, so
  the only big shuffle is the final (query_id, doc_id) partial-agg —
  map-side combined by Catalyst.
- Top-k uses the rounded-measure + id tiebreak ranking convention so
  float-sum noise cannot flip ranks (inventory.py module docstring).

Rank fusion is reciprocal-rank fusion (RRF; Cormack, Clarke &
Buettcher, SIGIR 2009): ``score = sum_i 1 / (c + rank_i)`` with the
conventional c=60.  Ranks are integers, so the fused score is a sum of
exactly-representable reciprocals — bit-identical across engines, which
is why the hybrid gate can round at 9 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.caching import persist_tracked
from vector_search_question_answer_api_spark.functions import text as TXT


def _doc_tokens(documents: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks, dl): preprocessed whitespace tokens + document length."""
    return documents.select(
        F.col(id_col).alias("doc_id"),
        TXT.tokens(TXT.preprocess_text(F.col(text_col))).alias("toks"),
    ).withColumn("dl", F.size("toks"))


def build_postings(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The inverted-index relations for a corpus.

    Returns ``(postings, doclens, stats)``:

    - postings: (term, doc_id, tf) — explode + count, shuffled on term;
      at scale this is the relation you'd persist bucketed by term.
    - doclens: (doc_id, dl) — token count per doc.
    - stats: ONE row (n_docs, avgdl) — kept as a DataFrame so the caller
      can cross-join it without any driver materialization.

    The token relation fans into all three outputs and postings fans into
    both the df-aggregate and the scoring join, so both are persisted via
    the tracked registry (``caching.unpersist_all()`` releases them) —
    Catalyst does not dedupe common subtrees, and re-running the regex
    tokenizer per branch dominated the un-persisted plan's cost.  At
    100 TB the same relations would instead be written out bucketed by
    term (the on-disk inverted index, like operators/ivf.py does for its
    inverted file).
    """
    toks = persist_tracked(_doc_tokens(documents, id_col, text_col))
    doclens = toks.select("doc_id", "dl")
    postings = persist_tracked(
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    return postings, doclens, stats


def bm25_topk(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    round_digits: int = 6,
    max_doc_freq: float | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rank): BM25 top-k per query.

    ``queries`` is a (query_id, query_text) relation — assumed small
    relative to the corpus (it is broadcast twice: onto the term-idf
    lookup and onto the postings join).  Scoring never moves the corpus:
    postings stay put, candidates shuffle as (query_id, doc_id, contrib)
    triples only.

    ``max_doc_freq`` (fraction of the corpus, e.g. 0.5) drops query
    terms whose postings list exceeds that share of documents BEFORE the
    scoring join — the skew/volume lever at scale.  Stop-word-like terms
    dominate candidate volume while contributing near-zero idf, so the
    cut changes scores only by those negligible contributions; omit it
    (default) for the exact relation the oracle replays.
    """
    postings, doclens, stats = build_postings(documents, id_col, text_col)

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                F.array_distinct(
                    TXT.tokens(TXT.preprocess_text(F.col(query_text_col)))
                )
            ).alias("term"),
        )
    )
    return score_postings_bm25(
        postings,
        qterms,
        stats,
        k=k,
        k1=k1,
        b=b,
        round_digits=round_digits,
        max_doc_freq=max_doc_freq,
    )


def score_postings_bm25(
    postings: DataFrame,
    qterms: DataFrame,
    stats: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
    max_doc_freq: float | None = None,
) -> DataFrame:
    """The BM25 scoring tail shared by :func:`bm25_topk` (postings built
    fresh from a corpus relation) and
    ``lexical_store.bm25_topk_stored`` (postings resolved from the
    maintained on-disk store): (query_id, doc_id, score, rank) from a
    ``(term, doc_id, tf, dl)`` postings relation, a ``(query_id, term)``
    query-term relation, and a one-row ``(n_docs, avgdl)`` stats
    relation.  One code path means the stored tier is relation-equal to
    the one-shot BY CONSTRUCTION — identical idf smoothing, identical
    contribution expression, identical rounded-measure + id tiebreak.

    ``df`` per term is counted from ``postings`` — correct for any
    postings relation that contains EVERY live posting of each term it
    mentions (the full corpus relation trivially; the store's query-term
    slice because slicing restricts terms, never docs)."""
    # df per term = number of postings rows for it (one per doc).
    term_df = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # idf onto the (tiny) query-term side: broadcast qterms into the
    # term-keyed df relation, keep only terms any query mentions.
    q_idf = term_df.join(F.broadcast(qterms), "term").crossJoin(
        F.broadcast(stats)
    )
    if max_doc_freq is not None:
        q_idf = q_idf.filter(
            F.col("df") <= F.lit(max_doc_freq) * F.col("n_docs")
        )
    q_idf = q_idf.select(
        "query_id",
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        "avgdl",
    )

    # dl rides inside postings (carried through the tf aggregation), so
    # scoring is postings x broadcast(q_idf) — no doclens join.
    contrib = (
        postings.join(F.broadcast(q_idf), "term")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("idf")
                * F.col("tf").cast("double")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("contrib"),
        )
    )

    scored = contrib.groupBy("query_id", "doc_id").agg(
        (F.round(F.sum("contrib"), round_digits) + F.lit(0.0)).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 5,
    c: int = 60,
    round_digits: int = 9,
) -> DataFrame:
    """(query_id, doc_id, rrf_score, rank): reciprocal-rank fusion of any
    number of (query_id, doc_id, rank) relations.

    A doc absent from one ranking simply contributes nothing for it (the
    union-aggregate shape — no outer-join ladder, so fusing R rankings is
    one union + one hash aggregation regardless of R).

    ``round_digits``: every engine fusing the same ranks sums the same
    reciprocal operand set, so rounding at 9 digits is engine-stable
    (the reciprocals themselves are not exactly representable — 1/61
    isn't — but identical operands round identically)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    tagged = None
    for r in rankings:
        part = r.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(float(c)) + F.col("rank"))).alias("part"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy("query_id", "doc_id").agg(
        (F.round(F.sum("part"), round_digits) + F.lit(0.0)).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf_score", "rank")
    )


def blended_rerank(
    candidates: DataFrame,
    documents: DataFrame,
    queries: DataFrame,
    k: int = 5,
    alpha: float = 0.5,
    dense_col: str = "dense_sim",
    text_col: str = "text",
    query_text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, blend_score, rank): score-level blend of the
    dense similarity already attached to each candidate with a lexical
    token-set Jaccard between query and document —
    ``alpha * dense + (1 - alpha) * jaccard`` — re-ranked top-k.

    This is the deterministic tier of the cross-encoder re-rank stage a
    retrieval stack runs after candidate generation (the learned model
    would slot in behind the same seam pattern as the embedder, U1):
    rank fusion (``rrf_fuse``) combines RANKS and ignores score
    calibration; the blend combines the SCORES, which preserves margin
    information when the two signals are on comparable [0,1] scales.

    Scale shape: candidates are per-query top-pool rows (tiny); the doc
    token sets attach by one equi-join on doc_id (semi-join sized — only
    candidate docs are tokenized after Catalyst pushes the join), the
    query token sets broadcast, the Jaccard is a pure HOF expression, and
    the re-rank is the usual rounded-measure window.  Nothing touches
    non-candidate corpus rows.

    A candidate whose doc_id is absent from ``documents`` is KEPT and
    scored with jaccard = 0 (left join; ADVICE r4 — the inner-join form
    silently dropped it), so a dense-index/doc-store sync lag degrades a
    candidate's lexical evidence to zero instead of deleting the row.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    dtoks = documents.select(
        F.col("doc_id"),
        F.array_distinct(
            TXT.tokens(TXT.preprocess_text(F.col(text_col)))
        ).alias("_dt"),
    )
    qtoks = queries.select(
        F.col("query_id"),
        F.array_distinct(
            TXT.tokens(TXT.preprocess_text(F.col(query_text_col)))
        ).alias("_qt"),
    )
    inter = F.size(F.array_intersect(F.col("_qt"), F.col("_dt")))
    uni = F.size(F.col("_qt")) + F.size(F.col("_dt")) - inter
    jac = F.when(F.col("_dt").isNull(), 0.0).otherwise(
        F.when(uni > 0, inter.cast("double") / uni).otherwise(0.0)
    )
    scored = (
        candidates.join(dtoks, "doc_id", "left")
        .join(F.broadcast(qtoks), "query_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.round(
                    F.lit(alpha) * F.col(dense_col)
                    + F.lit(1.0 - alpha) * jac,
                    9,
                )
                + F.lit(0.0)
            ).alias("blend_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("blend_score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "blend_score", "rank")
    )
