"""Exact duplicated-SPAN extraction — substring-level dedup.

The whole-document tiers (``operators/dedup``) decide which DOCUMENTS to
drop; training corpora also need the finer operation of Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): find every token span that occurs verbatim more than
once ANYWHERE in the corpus and cut the repeats out of the text, keeping
the documents.  The paper's single-node tool builds a suffix array; the
Spark-first re-expression is token k-gram rolling hashes + one hash-agg:

1. **Occurrences** (map-only): tokenize the preprocessed text (the same
   chain as every other text operator — ``functions/text.py``, reference
   ``services/index_service.py:14-47`` parity) and emit one row per k-gram
   position ``(doc_id, pos, h1, h2)``.  Two independent ``xxhash64`` seeds
   stand in for the gram string: shuffle rows stay ~24 bytes instead of a
   k-token string, and the paired 128-bit key makes a false duplicate
   astronomically unlikely (~T²/2^129 for T grams; at 10^12 grams,
   ~1e-13 expected collisions corpus-wide).
2. **Duplicated grams** (one shuffle): ``groupBy(h1, h2)`` → occurrence
   count + the canonical first occurrence ``min(struct(doc_id, pos))``.
   This is a hash-agg with map-side partials — never an all-pairs join.
3. **Marks** (one shuffle): semi-join occurrences to duplicated grams;
   with ``keep_first=True`` the canonical occurrence of each gram is NOT
   marked, so exactly one copy of every duplicated passage survives (the
   paper's dedup semantic, decided gram-by-gram at the deterministic
   ``(doc_id, pos)`` minimum — no driver coordination).
4. **Maximal spans** (one shuffle, by doc): marked positions cover token
   intervals ``[pos, pos+k-1]``; merge overlapping-or-adjacent intervals
   per document with the standard island trick (running sum of
   ``gap > k`` flags over a ``(doc_id, pos)`` window) → ``(doc_id,
   span_start, span_end, n_tokens)``.
5. **Strip** (map-only after one spans-per-doc agg): rebuild the text
   keeping tokens outside every span — index-aware ``filter`` +
   ``array_join``, pure Catalyst HOFs, no UDF.

Every stage is bounded: the only per-key state is a count and a 2-field
min, span merging is per-document, and nothing is ever collected.  A span
shorter than k tokens cannot be detected (the paper's same granularity
bound); choose k for the shortest passage worth cutting (they use 50
BPE tokens; short-document corpora want smaller).

Scale notes: the occurrence table is ~n_tokens rows — the same order as
the shingle inverted indexes in ``operators/dedup`` — and boilerplate
grams (licence headers, navigation chrome) concentrate occurrence counts
exactly like hot shingles; ``max_gram_freq`` df-caps them (marks are
still produced for capped grams' SPANS via their non-capped neighbours;
the cap only bounds the per-gram first-occurrence agg fanout, documented
on :func:`duplicate_span_marks`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.functions import text as TXT

DEFAULT_K = 50
# Fixed seeds so occurrences computed by different jobs (batch vs
# incremental) agree bit-for-bit, like every other hash family in this
# repo (dedup minhash, sketches CMS).
SEED_A = 0xA5A5
SEED_B = 0x5A5A


def _gram_strings(toks: Column, k: int) -> Column:
    """Array of k-gram strings (k tokens joined by single spaces) of a
    MATERIALIZED token-array column; empty when the document has fewer
    than k tokens.  Gram i (0-based array index) covers token positions
    ``[i, i+k-1]``."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_gram_occurrences(
    documents: DataFrame, k: int = DEFAULT_K, text_col: str = "text"
) -> DataFrame:
    """``(doc_id, pos, h1, h2)`` — one row per token k-gram occurrence.
    Map-only (tokenize + per-row transform + posexplode); the downstream
    hash-agg is what bounds the shuffle.

    Two planner traps, both measured on this exact operator (SCALE.md
    "Planner lessons"):

    - each stage's result is materialized as a REAL column before the
      next references it (tokens before the gram transform, gram strings
      before the hashes) — referencing the raw tokenize expression inside
      the slice lambda re-evaluates the whole regex chain per gram
      position;
    - the explode is the OUTER variant + a cheap null filter, because a
      plain explode makes ``InferFiltersFromGenerate`` synthesize
      ``size(grams) > 0`` and push the ENTIRE tokenize+gram expression
      tree below the parallelizing exchange into the (single-task,
      one-file) scan stage — serializing the whole map phase (11.6 s →
      1.5 s at sf0.1)."""
    toks = TXT.tokens(TXT.preprocess_text(F.col(text_col)))
    base = documents.select("doc_id", toks.alias("toks"))
    grams = base.select(
        "doc_id", _gram_strings(F.col("toks"), k).alias("grams")
    )
    exploded = grams.select(
        "doc_id", F.posexplode_outer("grams").alias("pos", "gram")
    )
    return exploded.filter(F.col("pos").isNotNull()).select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.xxhash64("gram", F.lit(SEED_A)).alias("h1"),
        F.xxhash64("gram", F.lit(SEED_B)).alias("h2"),
    )


def duplicate_span_marks(
    documents: DataFrame,
    k: int = DEFAULT_K,
    text_col: str = "text",
    keep_first: bool = True,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """``(doc_id, pos)`` — every k-gram position whose gram occurs more
    than once in the corpus (minus, with ``keep_first``, the deterministic
    canonical first occurrence ``min(doc_id, pos)`` of each gram — so one
    copy of every duplicated passage survives the strip).

    One hash-agg over gram keys + one equi-join back to occurrences; ids
    and 16-byte keys only in the shuffles.  ``max_gram_freq`` drops grams
    occurring more often than the cap from MARKING entirely (boilerplate
    df-cut — the same lever as the shingle tiers' ``max_doc_freq``); spans
    they would have joined are then found only via rarer neighbouring
    grams, which is the standard precision/recall trade documented in the
    module docstring."""
    occ = token_gram_occurrences(documents, k, text_col)
    agg = occ.groupBy("h1", "h2").agg(
        F.count("*").alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("first_occ"),
    )
    dup = agg.filter(F.col("n_occ") >= 2)
    if max_gram_freq is not None:
        dup = dup.filter(F.col("n_occ") <= int(max_gram_freq))
    marked = occ.join(dup, ["h1", "h2"])
    if keep_first:
        marked = marked.filter(
            ~(
                (F.col("doc_id") == F.col("first_occ.doc_id"))
                & (F.col("pos") == F.col("first_occ.pos"))
            )
        )
    return marked.select("doc_id", "pos")


def merge_positions_to_spans(marks: DataFrame, k: int) -> DataFrame:
    """``(doc_id, span_start, span_end, n_tokens)`` — maximal merged token
    intervals from marked gram positions (each mark covers ``[pos,
    pos+k-1]``; marks whose intervals overlap or touch merge).  The island
    trick: one ``(doc_id, pos)`` window pass computing a running sum of
    new-island flags (``pos - lag(pos) > k``), then a per-island agg —
    exactly one shuffle keyed by document."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = marks.withColumn(
        "new_island",
        F.when(
            F.col("pos") - F.lag("pos").over(w) > F.lit(k), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
        )
    )


def duplicate_spans(
    documents: DataFrame,
    k: int = DEFAULT_K,
    text_col: str = "text",
    keep_first: bool = True,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """``(doc_id, span_start, span_end, n_tokens)`` — maximal corpus-
    duplicated token spans per document (see module docstring for the
    guarantee: every verbatim repeat of >= k tokens is covered; with
    ``keep_first`` the canonical first copy is left unmarked)."""
    marks = duplicate_span_marks(
        documents, k, text_col, keep_first=keep_first, max_gram_freq=max_gram_freq
    )
    return merge_positions_to_spans(marks, k)


def strip_duplicate_spans(
    documents: DataFrame,
    k: int = DEFAULT_K,
    text_col: str = "text",
    keep_first: bool = True,
    spans: DataFrame | None = None,
) -> DataFrame:
    """``(doc_id, clean_text, n_tokens_kept, n_tokens_removed)`` — the
    corpus with duplicated spans cut out of the PREPROCESSED text, one
    output row per input document (docs with no duplicated span pass
    through verbatim).

    Spans are grouped to one array per document (bounded: spans per doc
    <= n_tokens/k), left-joined, and the rebuild is pure Catalyst —
    index-aware ``filter`` over the token array + ``array_join``; no UDF,
    nothing collected."""
    if spans is None:
        spans = duplicate_spans(documents, k, text_col, keep_first=keep_first)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    toks = TXT.tokens(TXT.preprocess_text(F.col(text_col)))
    base = documents.select("doc_id", toks.alias("toks")).join(
        per_doc, "doc_id", "left"
    )
    spans_arr = F.coalesce(
        F.col("spans"), F.array().cast("array<struct<span_start:int,span_end:int>>")
    )
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(
            spans_arr,
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    return base.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).alias("n_tokens_kept"),
        (F.size("toks") - F.size(kept)).alias("n_tokens_removed"),
    )


def duplication_profile(
    documents: DataFrame, k: int = DEFAULT_K, text_col: str = "text"
) -> DataFrame:
    """One-row corpus duplication summary: total tokens, tokens inside
    duplicated spans (keep_first marking — i.e. tokens a strip would
    remove), and the duplicated fraction.  The scan-level contamination
    number a 100 TB ingest run reports next to the sketch profile."""
    toks = TXT.tokens(TXT.preprocess_text(F.col(text_col)))
    totals = documents.agg(F.sum(F.size(toks)).alias("n_tokens"))
    spans = duplicate_spans(documents, k, text_col, keep_first=True)
    dup_tokens = spans.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_dup_tokens")
    )
    return totals.crossJoin(dup_tokens).select(
        "n_tokens",
        "n_dup_tokens",
        (
            F.col("n_dup_tokens").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
        ).alias("dup_fraction"),
    )
